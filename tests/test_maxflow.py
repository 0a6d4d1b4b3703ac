"""Max-flow / min-cut / connectivity vs the exact networkx oracles
(nx.maximum_flow, nx.minimum_cut, nx.edge_connectivity,
nx.node_connectivity)."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.kernels.maxflow import (
    edge_connectivity,
    max_flow,
    st_edge_connectivity,
    st_vertex_connectivity,
)


def _ds(src, dst, cap=None):
    cols = {
        "src": pa.array(np.asarray(src, dtype=np.int64)),
        "dst": pa.array(np.asarray(dst, dtype=np.int64)),
    }
    if cap is not None:
        cols["capacity"] = pa.array(np.asarray(cap, dtype=np.int64))
    return ray.data.from_arrow(pa.table(cols))


def _rand_digraph(n, m, seed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # dedup parallel arcs (nx DiGraph collapses them; keep last cap)
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    src, dst = src[idx], dst[idx]
    cap = rng.integers(1, 20, len(src))
    return src, dst, cap


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_max_flow_directed_vs_nx(seed):
    n = 40
    src, dst, cap = _rand_digraph(n, 300, seed)
    G = nx.DiGraph()
    G.add_nodes_from(range(n))
    for u, v, c in zip(src, dst, cap):
        G.add_edge(int(u), int(v), capacity=int(c))
    s, t = 0, n - 1
    want, _ = nx.maximum_flow(G, s, t)
    got = max_flow(_ds(src, dst, cap), n, s, t, "capacity", directed=True)
    assert got["value"] == want
    # cut capacity == flow value (max-flow min-cut), cut separates s|t
    cut_cap, (S, T) = nx.minimum_cut(G, s, t)
    assert int(got["cut_edges"].column("capacity").to_pandas().sum()) == want
    assert got["source_side"][s] and not got["source_side"][t]
    # removing the cut edges disconnects t from s
    H = G.copy()
    for u, v in zip(
        got["cut_edges"].column("src").to_pylist(),
        got["cut_edges"].column("dst").to_pylist(),
    ):
        H.remove_edge(u, v)
    assert not nx.has_path(H, s, t)


@pytest.mark.parametrize("seed,p", [(3, 0.15), (11, 0.3)])
def test_max_flow_undirected_vs_nx(seed, p):
    G = nx.gnp_random_graph(30, p, seed=seed)
    rng = np.random.default_rng(seed)
    src = np.array([u for u, v in G.edges()], dtype=np.int64)
    dst = np.array([v for u, v in G.edges()], dtype=np.int64)
    cap = rng.integers(1, 10, len(src))
    for (u, v), c in zip(G.edges(), cap):
        G[u][v]["capacity"] = int(c)
    s, t = 0, 29
    if not nx.has_path(G, s, t):
        pytest.skip("disconnected draw")
    want, _ = nx.maximum_flow(G, s, t)
    got = max_flow(_ds(src, dst, cap), 30, s, t, "capacity", directed=False)
    assert got["value"] == want


@pytest.mark.parametrize("seed", [2, 9])
def test_edge_connectivity_vs_nx(seed):
    G = nx.gnp_random_graph(25, 0.25, seed=seed)
    src = np.array([u for u, v in G.edges()], dtype=np.int64)
    dst = np.array([v for u, v in G.edges()], dtype=np.int64)
    ds = _ds(src, dst)
    s, t = 0, 24
    assert st_edge_connectivity(ds, 25, s, t) == nx.edge_connectivity(
        G, s, t
    )
    assert edge_connectivity(ds, 25) == nx.edge_connectivity(G)


@pytest.mark.parametrize("seed", [4, 13])
def test_vertex_connectivity_vs_nx(seed):
    G = nx.gnp_random_graph(22, 0.2, seed=seed)
    src = np.array([u for u, v in G.edges()], dtype=np.int64)
    dst = np.array([v for u, v in G.edges()], dtype=np.int64)
    ds = _ds(src, dst)
    pairs = [(0, 21), (1, 20), (3, 15)]
    for s, t in pairs:
        if G.has_edge(s, t):
            continue
        assert st_vertex_connectivity(ds, 22, s, t) == nx.node_connectivity(
            G, s, t
        ), (s, t)


def test_max_flow_classic_fixture():
    # CLRS figure: known max flow 23
    src = [0, 0, 1, 1, 2, 2, 3, 3, 4, 4]
    dst = [1, 2, 2, 3, 1, 4, 2, 5, 3, 5]
    cap = [16, 13, 10, 12, 4, 14, 9, 20, 7, 4]
    got = max_flow(_ds(src, dst, cap), 6, 0, 5, "capacity", directed=True)
    assert got["value"] == 23


def test_gather_bound_raises():
    src = [0, 1]
    dst = [1, 2]
    with pytest.raises(NotImplementedError):
        max_flow(_ds(src, dst), 3, 0, 2, gather_max_arcs=1)
