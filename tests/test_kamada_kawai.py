"""Kamada-Kawai / stress-majorization layout
(``kernels/layout.py::kamada_kawai``): stress decreases, the layout
is deterministic, and embedded distances recover graph structure on
fixtures with known geometry."""

import networkx as nx
import numpy as np

from igraph_ray.kernels.layout import kamada_kawai
from tests.util import ds_to_table, graph_from_nx


def _positions(ds):
    t = ds_to_table(ds).sort_by("vid")
    return np.stack(
        [
            t.column("x").to_numpy(zero_copy_only=False),
            t.column("y").to_numpy(zero_copy_only=False),
        ],
        axis=1,
    )


def test_stress_decreases_and_deterministic(tmp_graph_dir):
    G = nx.cycle_graph(24)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    out, trace = kamada_kawai(g, np.arange(24), iterations=30)
    assert trace[-1] < 0.2 * trace[0]
    # majorization: overwhelmingly monotone (tiny pivot-drift upticks
    # allowed in the sparse-stress model)
    upticks = sum(1 for a, b in zip(trace, trace[1:]) if b > a * 1.001)
    assert upticks <= 2, trace
    out2, trace2 = kamada_kawai(
        graph_from_nx(G, f"{tmp_graph_dir}/b", num_parts=5),
        np.arange(24),
        iterations=30,
    )
    assert np.array_equal(_positions(out), _positions(out2))
    # trace is a diagnostic float sum (block-layout addition order)
    assert np.allclose(trace, trace2)


def test_path_graph_recovers_linear_order(tmp_graph_dir):
    n = 20
    G = nx.path_graph(n)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    out, _ = kamada_kawai(g, np.arange(n), iterations=60)
    P = _positions(out)
    # embedded distance between endpoints ~ path length; adjacent
    # vertices much closer than the endpoints
    end = np.linalg.norm(P[0] - P[n - 1])
    adj = np.array(
        [np.linalg.norm(P[i] - P[i + 1]) for i in range(n - 1)]
    )
    assert end > 5 * adj.mean()
    # monotone-ish: correlation between |i-j| and embedded distance
    idx = np.arange(n)
    gd = np.abs(idx[:, None] - idx[None, :]).ravel()
    ed = np.linalg.norm(P[:, None, :] - P[None, :, :], axis=2).ravel()
    r = np.corrcoef(gd, ed)[0, 1]
    assert r > 0.9, r


def test_two_cliques_separate(tmp_graph_dir):
    G = nx.disjoint_union(nx.complete_graph(8), nx.complete_graph(8))
    G.add_edge(0, 8)  # bridge
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    out, _ = kamada_kawai(g, np.arange(16), iterations=60)
    P = _positions(out)
    a, b = P[:8], P[8:]
    intra_a = np.linalg.norm(a[:, None] - a[None, :], axis=2).mean()
    inter = np.linalg.norm(a[:, None] - b[None, :], axis=2).mean()
    assert inter > 1.3 * intra_a


def test_disconnected_keeps_init_positions(tmp_graph_dir):
    G = nx.Graph()
    G.add_edges_from([(0, 1), (1, 2)])
    G.add_node(9)  # isolated — unreachable from every pivot
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    out, _ = kamada_kawai(g, np.array([0, 1, 2, 9]), iterations=10)
    t = ds_to_table(out).sort_by("vid")
    assert t.num_rows == 4
    from igraph_ray.kernels.layout import _init_positions

    want = _init_positions(np.array([9], np.int64))[0]
    got = (
        t.column("x").to_numpy(zero_copy_only=False)[3],
        t.column("y").to_numpy(zero_copy_only=False)[3],
    )
    assert np.allclose(got, want)
