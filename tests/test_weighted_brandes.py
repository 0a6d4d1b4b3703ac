"""Weighted betweenness / closeness / harmonic oracle tests vs
networkx (igraph ``Graph.betweenness(weights=...)`` /
``Graph.closeness(weights=...)`` parity)."""

import networkx as nx
import numpy as np
import pytest

from igraph_ray.api import build_graph, edges_dataset
from igraph_ray.kernels.betweenness import betweenness_centrality
from igraph_ray.kernels.multibfs import (
    closeness_centrality,
    harmonic_centrality,
)
from tests.util import ds_to_table


def weighted_graph_from_nx(G, graph_dir, num_parts=3):
    import pyarrow as pa
    import ray.data

    src = np.array([u for u, v in G.edges()], dtype=np.int64)
    dst = np.array([v for u, v in G.edges()], dtype=np.int64)
    w = np.array(
        [G[u][v]["weight"] for u, v in G.edges()], dtype=np.float64
    )
    vertices = ray.data.from_arrow(
        pa.table(
            {"vid": pa.array(sorted(int(v) for v in G.nodes()), pa.int64())}
        )
    )
    return build_graph(
        edges_dataset(src, dst, weight=w),
        graph_dir,
        num_parts=num_parts,
        symmetrize=True,
        vertices=vertices,
    )


def _col_dict(ds, col):
    tbl = ds_to_table(ds)
    return dict(
        zip(tbl.column("vid").to_pylist(), tbl.column(col).to_pylist())
    )


def _gnm_weighted(n, m, seed, ints=False):
    G = nx.gnm_random_graph(n, m, seed=seed)
    rng = np.random.default_rng(seed)
    for u, v in G.edges():
        G[u][v]["weight"] = (
            float(rng.integers(1, 5)) if ints else float(rng.uniform(0.1, 5.0))
        )
    return G


def test_weighted_betweenness_path_graph(tmp_graph_dir):
    # path 0-1-2-3 with distinct weights: interior vertices carry all
    # pairs through them regardless of weights
    G = nx.Graph()
    G.add_edge(0, 1, weight=2.0)
    G.add_edge(1, 2, weight=0.5)
    G.add_edge(2, 3, weight=3.0)
    g = weighted_graph_from_nx(G, tmp_graph_dir, num_parts=2)
    bc = _col_dict(
        betweenness_centrality(g, normalized=False, weighted=True),
        "betweenness",
    )
    ref = nx.betweenness_centrality(G, normalized=False, weight="weight")
    for v in G.nodes():
        assert abs(bc[v] - ref[v]) < 1e-9, v


def test_weighted_betweenness_tie_paths(tmp_graph_dir):
    # diamond with equal-length alternatives: σ counting must split
    # dependencies across tied shortest paths
    G = nx.Graph()
    for a, b, w in [
        (0, 1, 1.0),
        (0, 2, 1.0),
        (1, 3, 1.0),
        (2, 3, 1.0),
        (3, 4, 2.0),
        (0, 4, 5.0),
    ]:
        G.add_edge(a, b, weight=w)
    g = weighted_graph_from_nx(G, tmp_graph_dir, num_parts=2)
    bc = _col_dict(
        betweenness_centrality(g, normalized=False, weighted=True),
        "betweenness",
    )
    ref = nx.betweenness_centrality(G, normalized=False, weight="weight")
    for v in G.nodes():
        assert abs(bc[v] - ref[v]) < 1e-9, v


def test_weighted_betweenness_gnm_int_weights(tmp_graph_dir):
    # integer weights force many exactly-tied shortest paths
    G = _gnm_weighted(24, 60, seed=7, ints=True)
    g = weighted_graph_from_nx(G, tmp_graph_dir, num_parts=3)
    bc = _col_dict(
        betweenness_centrality(g, normalized=True, weighted=True),
        "betweenness",
    )
    ref = nx.betweenness_centrality(G, normalized=True, weight="weight")
    for v in G.nodes():
        assert abs(bc[v] - ref[v]) < 1e-9, v


def test_weighted_betweenness_gnm_float_weights(tmp_graph_dir):
    G = _gnm_weighted(20, 45, seed=11)
    g = weighted_graph_from_nx(G, tmp_graph_dir, num_parts=3)
    bc = _col_dict(
        betweenness_centrality(g, normalized=False, weighted=True),
        "betweenness",
    )
    ref = nx.betweenness_centrality(G, normalized=False, weight="weight")
    for v in G.nodes():
        assert abs(bc[v] - ref[v]) < 1e-9, v


def test_weighted_betweenness_disconnected(tmp_graph_dir):
    G = nx.Graph()
    G.add_edge(0, 1, weight=1.0)
    G.add_edge(1, 2, weight=2.0)
    G.add_edge(5, 6, weight=0.5)
    g = weighted_graph_from_nx(G, tmp_graph_dir, num_parts=2)
    bc = _col_dict(
        betweenness_centrality(g, normalized=False, weighted=True),
        "betweenness",
    )
    ref = nx.betweenness_centrality(G, normalized=False, weight="weight")
    for v in G.nodes():
        assert abs(bc[v] - ref[v]) < 1e-9, v


def test_weighted_betweenness_rejects_nonpositive(tmp_graph_dir):
    G = nx.Graph()
    G.add_edge(0, 1, weight=1.0)
    G.add_edge(1, 2, weight=0.0)
    g = weighted_graph_from_nx(G, tmp_graph_dir, num_parts=2)
    with pytest.raises(ValueError, match="positive"):
        betweenness_centrality(g, weighted=True)


def test_weighted_betweenness_sampled_full_k_equals_exact(tmp_graph_dir):
    G = _gnm_weighted(14, 30, seed=3, ints=True)
    g = weighted_graph_from_nx(G, tmp_graph_dir, num_parts=2)
    exact = _col_dict(
        betweenness_centrality(g, normalized=True, weighted=True),
        "betweenness",
    )
    sampled = _col_dict(
        betweenness_centrality(
            g, k=G.number_of_nodes(), normalized=True, weighted=True
        ),
        "betweenness",
    )
    for v in G.nodes():
        assert abs(exact[v] - sampled[v]) < 1e-9


def test_weighted_closeness_gnm(tmp_graph_dir):
    G = _gnm_weighted(25, 60, seed=13)
    g = weighted_graph_from_nx(G, tmp_graph_dir, num_parts=3)
    n = G.number_of_nodes()
    cc = _col_dict(
        closeness_centrality(g, n, weighted=True), "closeness"
    )
    ref = nx.closeness_centrality(G, distance="weight")
    for v in G.nodes():
        assert abs(cc[v] - ref[v]) < 1e-9, v


def test_weighted_harmonic_gnm(tmp_graph_dir):
    G = _gnm_weighted(25, 60, seed=17)
    g = weighted_graph_from_nx(G, tmp_graph_dir, num_parts=3)
    n = G.number_of_nodes()
    hc = _col_dict(harmonic_centrality(g, n, weighted=True), "harmonic")
    ref = nx.harmonic_centrality(G, distance="weight")
    for v in G.nodes():
        assert abs(hc[v] - ref[v]) < 1e-9, v
