"""Current-flow closeness (CG Laplacian solves) vs the dense
pseudo-inverse identity CFC(s) = (n−1)/(n·L⁺_ss + tr L⁺).

nx.current_flow_closeness_centrality computes the same quantity
(networkx 3.6.1 algorithms/centrality/current_flow_closeness.py) but
needs scipy, which is absent — the dense replay below is the identical
linear algebra via numpy.linalg.pinv."""

from __future__ import annotations

import tempfile

import networkx as nx
import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.api import build_graph
from igraph_ray.kernels.resistance import (
    current_flow_closeness,
    solve_laplacian_columns,
)


def _dense_cfc(G, weight=None) -> dict[int, float]:
    nodes = sorted(G.nodes())
    pos = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    L = np.zeros((n, n))
    for u, v, d in G.edges(data=True):
        w = d.get("weight", 1.0)
        L[pos[u], pos[v]] -= w
        L[pos[v], pos[u]] -= w
        L[pos[u], pos[u]] += w
        L[pos[v], pos[v]] += w
    M = np.linalg.pinv(L)
    tr = np.trace(M)
    return {v: (n - 1.0) / (n * M[pos[v], pos[v]] + tr) for v in nodes}


def _graph(G, num_parts=3, weighted=False):
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    w = (
        [d.get("weight", 1.0) for _, _, d in G.edges(data=True)]
        if weighted
        else [1.0] * len(src)
    )
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "weight": pa.array(w, pa.float64()),
            }
        )
    )
    verts = ray.data.from_arrow(
        pa.table({"vid": pa.array(sorted(G.nodes()), pa.int64())})
    )
    return build_graph(
        edges,
        tempfile.mkdtemp(prefix="igr_cfc_"),
        num_parts=num_parts,
        vertices=verts,
        symmetrize=True,
    )


def test_laplacian_solve_columns():
    G = nx.gnm_random_graph(25, 60, seed=6)
    assert nx.is_connected(G)
    graph = _graph(G)
    n = G.number_of_nodes()
    pivots = np.array([0, 3, 7], np.int64)
    state, piv = solve_laplacian_columns(graph, n, pivots, tol=1e-12)
    tbl = pa.concat_tables(
        state.select_columns(["vid", "x0", "x1", "x2"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    nodes = sorted(G.nodes())
    pos = {v: i for i, v in enumerate(nodes)}
    L = nx.laplacian_matrix(G).toarray() if False else None
    A = np.zeros((n, n))
    for u, v in G.edges():
        A[pos[u], pos[v]] -= 1
        A[pos[v], pos[u]] -= 1
        A[pos[u], pos[u]] += 1
        A[pos[v], pos[v]] += 1
    M = np.linalg.pinv(A)
    for i, s in enumerate(pivots.tolist()):
        x = tbl.column(f"x{i}").to_numpy(zero_copy_only=False)
        want = M[:, pos[s]]
        assert np.max(np.abs(x - want)) < 1e-8


def test_current_flow_closeness_vs_dense():
    for G, weighted in (
        (nx.gnm_random_graph(20, 50, seed=9), False),
        (nx.cycle_graph(7), False),
        (nx.star_graph(5), False),
    ):
        assert nx.is_connected(G)
        graph = _graph(G, weighted=weighted)
        got = current_flow_closeness(
            graph, G.number_of_nodes(), lanes=6, tol=1e-12
        )
        want = _dense_cfc(G)
        for v in want:
            assert abs(got[v] - want[v]) < 1e-7, (v, got[v], want[v])


def test_current_flow_closeness_weighted():
    rng = np.random.default_rng(2)
    G = nx.gnm_random_graph(15, 40, seed=4)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.integers(1, 5))
    assert nx.is_connected(G)
    graph = _graph(G, weighted=True)
    got = current_flow_closeness(graph, 15, lanes=5, tol=1e-12)
    want = _dense_cfc(G)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-7


def test_effective_resistance_edges():
    from igraph_ray.kernels.resistance import effective_resistance_edges

    G = nx.gnm_random_graph(15, 35, seed=11)
    assert nx.is_connected(G)
    graph = _graph(G)
    src = [min(u, v) for u, v in G.edges()]
    dst = [max(u, v) for u, v in G.edges()]
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )
    )
    out = effective_resistance_edges(graph, 15, pairs, lanes=5, tol=1e-12)
    nodes = sorted(G.nodes())
    pos = {v: i for i, v in enumerate(nodes)}
    L = np.zeros((15, 15))
    for u, v in G.edges():
        L[pos[u], pos[v]] -= 1
        L[pos[v], pos[u]] -= 1
        L[pos[u], pos[u]] += 1
        L[pos[v], pos[v]] += 1
    M = np.linalg.pinv(L)
    m = G.number_of_edges()
    got = {
        (r["src"], r["dst"]): (r["r_eff"], r["commute_time"])
        for r in out.to_pylist()
    }
    tree_prob_sum = 0.0
    for u, v in G.edges():
        a, b = min(u, v), max(u, v)
        want = M[pos[a], pos[a]] + M[pos[b], pos[b]] - 2 * M[pos[a], pos[b]]
        r, ct = got[(a, b)]
        assert abs(r - want) < 1e-7
        assert abs(ct - 2 * m * want) < 1e-5
        tree_prob_sum += r
    # Foster's theorem: Σ_edges r_eff = n − 1
    assert abs(tree_prob_sum - 14.0) < 1e-6
