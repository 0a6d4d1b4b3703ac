"""Steiner tree (Mehlhorn 2-approx) tests: exactness on trees, the
2·(1−1/ℓ) bound vs brute-force OPT on small graphs, structural
validity + determinism on random graphs (nx.approximation.steiner_tree
is the behavioural reference; exact edge sets differ by tie-breaks, so
the oracle asserts the guarantee, not the witness)."""

import itertools

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.api import build_graph, edges_dataset
from igraph_ray.kernels.steiner import steiner_tree
from tests.util import ds_to_table


def _setup(G, tmpdir, num_parts=3):
    src = np.array([u for u, v in G.edges()], np.int64)
    dst = np.array([v for u, v in G.edges()], np.int64)
    w = np.array(
        [G[u][v].get("weight", 1.0) for u, v in G.edges()], np.float64
    )
    vertices = ray.data.from_arrow(
        pa.table({"vid": pa.array(sorted(int(v) for v in G.nodes()))})
    )
    edges = edges_dataset(src, dst, w)
    graph = build_graph(
        edges, str(tmpdir / "g"), num_parts=num_parts,
        symmetrize=True, vertices=vertices,
    )
    return graph, edges


def _tree_info(tbl: pa.Table):
    T = nx.Graph()
    for s, d, w in zip(
        tbl.column("src").to_pylist(),
        tbl.column("dst").to_pylist(),
        tbl.column("weight").to_pylist(),
    ):
        T.add_edge(s, d, weight=w)
    return T, sum(w for _, _, w in T.edges(data="weight"))


def _brute_force_opt(G, terminals):
    others = [v for v in G.nodes() if v not in set(terminals)]
    best = None
    for r in range(len(others) + 1):
        for extra in itertools.combinations(others, r):
            S = set(terminals) | set(extra)
            H = G.subgraph(S)
            if not nx.is_connected(H):
                continue
            w = sum(
                d["weight"]
                for _, _, d in nx.minimum_spanning_tree(H).edges(data=True)
            )
            best = w if best is None else min(best, w)
    return best


def test_exact_on_tree(tmp_path):
    rng = np.random.default_rng(5)
    G = nx.random_labeled_tree(25, seed=3)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.integers(1, 9))
    terms = [0, 7, 19, 24]
    graph, edges = _setup(G, tmp_path)
    T, w = _tree_info(ds_to_table(steiner_tree(graph, edges, terms)))
    # on a tree the minimal Steiner tree is the unique union of
    # pairwise terminal paths — any spanning subtree with terminal
    # leaves equals it
    want = set()
    for a, b in itertools.combinations(terms, 2):
        p = nx.shortest_path(G, a, b, weight="weight")
        want |= {(min(x, y), max(x, y)) for x, y in zip(p, p[1:])}
    got = {(min(u, v), max(u, v)) for u, v in T.edges()}
    assert got == want


@pytest.mark.parametrize("seed,nt", [(11, 3), (12, 4), (13, 5)])
def test_two_approx_bound_small(tmp_path, seed, nt):
    rng = np.random.default_rng(seed)
    G = nx.gnm_random_graph(9, 18, seed=seed)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.integers(1, 12))
    if not nx.is_connected(G):
        G = G.subgraph(max(nx.connected_components(G), key=len)).copy()
    nodes = sorted(G.nodes())
    terms = nodes[:nt]
    opt = _brute_force_opt(G, terms)
    graph, edges = _setup(G, tmp_path)
    T, w = _tree_info(ds_to_table(steiner_tree(graph, edges, terms)))
    assert nx.is_connected(T)
    assert all(t in T for t in terms)
    assert nx.is_tree(T)
    assert opt - 1e-9 <= w <= 2 * opt + 1e-9


def test_validity_and_determinism_random(tmp_path):
    rng = np.random.default_rng(42)
    G = nx.gnm_random_graph(120, 300, seed=42)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.integers(1, 20))
    comp = max(nx.connected_components(G), key=len)
    terms = sorted(comp)[:8]
    graph, edges = _setup(G, tmp_path, num_parts=4)
    t1 = ds_to_table(steiner_tree(graph, edges, terms))
    t2 = ds_to_table(steiner_tree(graph, edges, terms))
    e1 = set(
        zip(t1.column("src").to_pylist(), t1.column("dst").to_pylist())
    )
    e2 = set(
        zip(t2.column("src").to_pylist(), t2.column("dst").to_pylist())
    )
    assert e1 == e2 and len(e1) == t1.num_rows  # deterministic, no dups
    T, w = _tree_info(t1)
    assert nx.is_tree(T) and nx.is_connected(T)
    assert all(t in T for t in terms)
    # every leaf is a terminal (pruning fixed point)
    for v in T.nodes():
        if T.degree(v) == 1:
            assert v in terms
    # never worse than 2x the nx mehlhorn approximation's own weight
    # bound context: both are ≤ 2·OPT, so got ≤ 2 · nx_weight
    nxT = nx.algorithms.approximation.steiner_tree(
        G, terms, weight="weight", method="mehlhorn"
    )
    nxw = sum(d["weight"] for _, _, d in nxT.edges(data=True))
    assert w <= 2 * nxw + 1e-9


def test_unreachable_terminals_forest(tmp_path):
    # two components, terminals in both → Steiner forest (one tree each)
    G = nx.Graph()
    G.add_weighted_edges_from(
        [(0, 1, 2.0), (1, 2, 3.0), (10, 11, 1.0), (11, 12, 4.0)]
    )
    graph, edges = _setup(G, tmp_path, num_parts=2)
    tbl = ds_to_table(steiner_tree(graph, edges, [0, 2, 10, 12]))
    T, w = _tree_info(tbl)
    assert {(min(u, v), max(u, v)) for u, v in T.edges()} == {
        (0, 1), (1, 2), (10, 11), (11, 12),
    }


def test_hop_metric_unweighted(tmp_path):
    # weighted=False ignores edge weights: the heavy short path wins
    G = nx.Graph()
    G.add_weighted_edges_from(
        [(0, 1, 100.0), (1, 2, 100.0), (0, 3, 1.0), (3, 4, 1.0),
         (4, 5, 1.0), (5, 2, 1.0)]
    )
    graph, edges = _setup(G, tmp_path, num_parts=2)
    tbl = ds_to_table(
        steiner_tree(graph, edges, [0, 2], weighted=False)
    )
    got = set(
        zip(tbl.column("src").to_pylist(), tbl.column("dst").to_pylist())
    )
    assert got == {(0, 1), (1, 2)}


def test_single_terminal_empty(tmp_path):
    G = nx.path_graph(4)
    for u, v in G.edges():
        G[u][v]["weight"] = 1.0
    graph, edges = _setup(G, tmp_path, num_parts=2)
    assert ds_to_table(steiner_tree(graph, edges, [2])).num_rows == 0
