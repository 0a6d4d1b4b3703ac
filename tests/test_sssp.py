"""Shortest-path oracle tests: BFS hops and weighted distances vs
networkx (igraph ``distances`` parity; SURVEY.md upstream note :37)."""

import math

import networkx as nx
import numpy as np

from igraph_ray.api import build_graph, edges_dataset
from igraph_ray.kernels import shortest_paths
from tests.util import graph_from_nx, state_dict


def test_bfs_hops_gnm(tmp_graph_dir):
    G = nx.gnm_random_graph(150, 300, seed=3)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=4)
    run = shortest_paths(g, [0], weighted=False)
    dist = state_dict(run.state, "dist")
    ref = nx.single_source_shortest_path_length(G, 0)
    for v in G.nodes():
        if v in ref:
            assert dist[v] == ref[v], v
        else:
            assert math.isinf(dist[v]), v


def test_weighted_dijkstra_gnm(tmp_graph_dir):
    rng = np.random.default_rng(11)
    G = nx.gnm_random_graph(120, 360, seed=5)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.uniform(0.1, 5.0))
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    w = [G[u][v]["weight"] for u, v in G.edges()]
    g = build_graph(
        edges_dataset(src, dst, weight=w),
        tmp_graph_dir,
        num_parts=3,
        symmetrize=True,
    )
    run = shortest_paths(g, [0], weighted=True)
    dist = state_dict(run.state, "dist")
    ref = nx.single_source_dijkstra_path_length(G, 0)
    for v, d in ref.items():
        assert abs(dist[v] - d) < 1e-9, v
    for v in G.nodes():
        if v not in ref:
            assert math.isinf(dist[v])


def test_multi_source_min(tmp_graph_dir):
    G = nx.gnm_random_graph(100, 160, seed=7)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    sources = [0, 50, 99]
    run = shortest_paths(g, sources, weighted=False)
    dist = state_dict(run.state, "dist")
    refs = [nx.single_source_shortest_path_length(G, s) for s in sources]
    for v in G.nodes():
        best = min(
            (r[v] for r in refs if v in r), default=math.inf
        )
        assert dist[v] == best, v


def test_directed_hops(tmp_graph_dir):
    # arcs one way only: 0→1→2, 2 cannot reach 0
    g = build_graph(
        edges_dataset([0, 1], [1, 2]),
        tmp_graph_dir,
        num_parts=2,
        symmetrize=False,
    )
    run = shortest_paths(g, [2], weighted=False)
    dist = state_dict(run.state, "dist")
    assert dist[2] == 0.0
    assert math.isinf(dist[0]) and math.isinf(dist[1])
    run2 = shortest_paths(g, [0], weighted=False)
    d2 = state_dict(run2.state, "dist")
    assert d2 == {0: 0.0, 1: 1.0, 2: 2.0}


def test_empty_sources_raises(tmp_graph_dir):
    import pytest

    g = build_graph(
        edges_dataset([0], [1]), tmp_graph_dir, num_parts=2, symmetrize=True
    )
    with pytest.raises(ValueError):
        shortest_paths(g, [])
