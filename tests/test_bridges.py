"""Bridges / 2-edge-connected components vs networkx oracles."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.kernels.bridges import bridges, two_edge_components
from tests.util import ds_to_table, nx_edge_arrays


def _edges_ds(pairs) -> ray.data.Dataset:
    src = np.array([u for u, v in pairs], np.int64)
    dst = np.array([v for u, v in pairs], np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
                "weight": pa.array(np.ones(len(src))),
            }
        )
    )


def _bridge_set(ds) -> set[tuple[int, int]]:
    t = ds_to_table(ds)
    return set(
        zip(t.column("src").to_pylist(), t.column("dst").to_pylist())
    )


def test_bridges_textbook(tmp_graph_dir):
    # two triangles joined by a bridge, plus a pendant path
    pairs = [
        (0, 1), (1, 2), (2, 0),      # triangle A
        (2, 3),                      # bridge
        (3, 4), (4, 5), (5, 3),      # triangle B
        (5, 6), (6, 7),              # pendant path: two bridges
    ]
    G = nx.Graph(pairs)
    got = _bridge_set(bridges(_edges_ds(pairs), work_dir=tmp_graph_dir))
    want = {(min(u, v), max(u, v)) for u, v in nx.bridges(G)}
    assert got == want == {(2, 3), (5, 6), (6, 7)}


def test_bridges_parallel_edge_not_bridge(tmp_graph_dir):
    # a doubled edge lies on a 2-cycle -> never a bridge
    pairs = [(0, 1), (0, 1), (1, 2)]
    got = _bridge_set(bridges(_edges_ds(pairs), work_dir=tmp_graph_dir))
    assert got == {(1, 2)}


def test_bridges_distributed_peel_path(tmp_graph_dir):
    # force the multi-round distributed peel (single_task_max=0) on a
    # small graph with a pendant chain (3 peel rounds)
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5)]
    G = nx.Graph(pairs)
    got = _bridge_set(
        bridges(_edges_ds(pairs), work_dir=tmp_graph_dir, single_task_max=0)
    )
    want = {(min(u, v), max(u, v)) for u, v in nx.bridges(G)}
    assert got == want == {(2, 3), (3, 4), (4, 5)}


@pytest.mark.parametrize("seed,p", [(4, 0.025)])
def test_bridges_random(tmp_graph_dir, seed, p):
    G = nx.gnp_random_graph(60, p, seed=seed)
    src, dst = nx_edge_arrays(G)
    got = _bridge_set(
        bridges(_edges_ds(list(zip(src, dst))), work_dir=tmp_graph_dir)
    )
    want = {(min(u, v), max(u, v)) for u, v in nx.bridges(G)}
    assert got == want


def test_two_edge_components(tmp_graph_dir):
    G = nx.gnp_random_graph(50, 0.04, seed=13)
    G.add_node(49)  # likely isolated at this density
    src, dst = nx_edge_arrays(G)
    vds = ray.data.from_arrow(
        pa.table({"vid": pa.array(sorted(G.nodes()), pa.int64())})
    )
    out = two_edge_components(
        _edges_ds(list(zip(src, dst))), tmp_graph_dir, vertices=vds
    )
    t = ds_to_table(out)
    got = dict(zip(t.column("vid").to_pylist(), t.column("comp").to_pylist()))
    # oracle: connected components of G minus its bridges, min-vid label
    H = G.copy()
    H.remove_edges_from(nx.bridges(G))
    want = {}
    for comp in nx.connected_components(H):
        m = min(comp)
        for v in comp:
            want[v] = m
    assert got == want
