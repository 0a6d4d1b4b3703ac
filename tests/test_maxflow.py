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


def _rand_ugraph(n, m, seed):
    rng = np.random.default_rng(seed)
    G = nx.gnm_random_graph(n, m, seed=seed)
    caps = rng.integers(1, 30, G.number_of_edges())
    for (u, v), c in zip(G.edges(), caps):
        G[u][v]["capacity"] = int(c)
        G[u][v]["weight"] = int(c)
    src = np.array([u for u, v in G.edges()], dtype=np.int64)
    dst = np.array([v for u, v in G.edges()], dtype=np.int64)
    return G, src, dst, caps.astype(np.int64)


@pytest.mark.parametrize("seed", [0, 2, 9])
def test_stoer_wagner_matches_nx(ray_session, seed):
    from igraph_ray.kernels.maxflow import min_cut

    G, src, dst, caps = _rand_ugraph(18, 45, seed)
    if not nx.is_connected(G):
        G = G.subgraph(max(nx.connected_components(G), key=len))
        keep = [i for i, (u, v) in enumerate(zip(src, dst))
                if u in G and v in G]
        src, dst, caps = src[keep], dst[keep], caps[keep]
    value, side = min_cut(_ds(src, dst, caps), capacity_col="capacity")
    ref_val, (s1, s2) = nx.stoer_wagner(G, weight="weight")
    assert value == ref_val
    side_set = set(side.to_pylist())
    # our side must be a valid min cut of the same value
    cut_w = sum(
        int(G[u][v]["weight"])
        for u, v in G.edges()
        if (u in side_set) != (v in side_set)
    )
    assert cut_w == ref_val
    assert 0 < len(side_set) < G.number_of_nodes()


def test_stoer_wagner_unit_weights_bridge(ray_session):
    from igraph_ray.kernels.maxflow import min_cut

    # two K4s joined by one edge: global min cut = 1 (the bridge)
    G = nx.disjoint_union(nx.complete_graph(4), nx.complete_graph(4))
    G.add_edge(0, 4)
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    value, side = min_cut(_ds(src, dst))
    assert value == 1.0
    assert set(side.to_pylist()) in ({0, 1, 2, 3}, {4, 5, 6, 7})


def _tree_allpairs_mincut(tree_rows, nodes):
    """All-pairs min-cut implied by a Gomory-Hu tree: min edge flow
    on the unique path."""
    T = nx.Graph()
    T.add_nodes_from(nodes)
    for u, v, f in tree_rows:
        T.add_edge(u, v, flow=f)
    out = {}
    for s in nodes:
        for t in nodes:
            if s < t:
                path = nx.shortest_path(T, s, t)
                out[(s, t)] = min(
                    T[a][b]["flow"]
                    for a, b in zip(path, path[1:])
                )
    return out


@pytest.mark.parametrize("seed", [1, 4])
def test_gomory_hu_allpairs_match_nx(ray_session, seed):
    from igraph_ray.kernels.maxflow import gomory_hu_tree

    G, src, dst, caps = _rand_ugraph(12, 30, seed)
    G = G.subgraph(max(nx.connected_components(G), key=len)).copy()
    keep = [i for i, (u, v) in enumerate(zip(src, dst))
            if u in G and v in G]
    src, dst, caps = src[keep], dst[keep], caps[keep]
    tree = gomory_hu_tree(_ds(src, dst, caps), capacity_col="capacity")
    rows = list(
        zip(
            tree.column("u").to_pylist(),
            tree.column("v").to_pylist(),
            tree.column("flow").to_pylist(),
        )
    )
    nodes = sorted(G.nodes())
    ours = _tree_allpairs_mincut(rows, nodes)
    ref_tree = nx.gomory_hu_tree(G, capacity="capacity")
    ref_rows = [
        (u, v, d["weight"]) for u, v, d in ref_tree.edges(data=True)
    ]
    ref = _tree_allpairs_mincut(ref_rows, nodes)
    assert ours == ref


def test_gomory_hu_path_graph_exact(ray_session):
    from igraph_ray.kernels.maxflow import gomory_hu_tree

    # path with distinct capacities: tree == the path itself
    src = [0, 1, 2, 3]
    dst = [1, 2, 3, 4]
    cap = [5, 3, 8, 2]
    tree = gomory_hu_tree(_ds(src, dst, cap), capacity_col="capacity")
    rows = {
        (min(u, v), max(u, v)): f
        for u, v, f in zip(
            tree.column("u").to_pylist(),
            tree.column("v").to_pylist(),
            tree.column("flow").to_pylist(),
        )
    }
    assert rows == {(0, 1): 5, (1, 2): 3, (2, 3): 8, (3, 4): 2}


@pytest.mark.parametrize(
    "maker",
    [
        lambda: nx.complete_graph(6),
        lambda: nx.path_graph(7),
        lambda: nx.cycle_graph(8),
        lambda: nx.petersen_graph(),
        lambda: nx.barbell_graph(5, 2),
        lambda: nx.disjoint_union(nx.complete_graph(4), nx.complete_graph(3)),
        lambda: nx.empty_graph(5),
        lambda: nx.complete_bipartite_graph(3, 7),
        lambda: nx.gnm_random_graph(40, 160, seed=1),
        lambda: nx.gnm_random_graph(60, 120, seed=2),
        lambda: nx.gnm_random_graph(30, 300, seed=3),
    ],
)
def test_global_vertex_connectivity_vs_nx(ray_session, maker):
    from igraph_ray.kernels.maxflow import vertex_connectivity

    G = nx.convert_node_labels_to_integers(maker())
    src = np.array([u for u, v in G.edges()], dtype=np.int64)
    dst = np.array([v for u, v in G.edges()], dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    )
    assert vertex_connectivity(ds, G.number_of_nodes()) == (
        nx.node_connectivity(G)
    )


def test_global_vertex_connectivity_small_wave(ray_session):
    """wave smaller than the candidate count exercises the running-
    best cutoff path."""
    from igraph_ray.kernels.maxflow import vertex_connectivity

    G = nx.gnm_random_graph(25, 80, seed=7)
    src = np.array([u for u, v in G.edges()], dtype=np.int64)
    dst = np.array([v for u, v in G.edges()], dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    )
    assert vertex_connectivity(ds, 25, wave=3) == nx.node_connectivity(G)
