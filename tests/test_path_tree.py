"""Shortest-path tree + path retrieval vs networkx invariants."""

import math

import networkx as nx
import numpy as np
import pytest

from igraph_ray.kernels.sssp import shortest_path_tree, trace_path
from tests.util import graph_from_nx


def _state_maps(run):
    dist, parent = {}, {}
    for b in run.state.iter_batches(batch_format="pyarrow", batch_size=None):
        for v, d, p in zip(
            b.column("vid").to_pylist(),
            b.column("dist").to_pylist(),
            b.column("parent").to_pylist(),
        ):
            dist[v], parent[v] = d, p
    return dist, parent


def test_tree_distances_and_parent_invariant(tmp_graph_dir):
    G = nx.gnm_random_graph(60, 150, seed=13)
    for u, v in G.edges():
        G[u][v]["weight"] = ((u * 7 + v * 3) % 5) + 1
    graph = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    # graph_from_nx builds unweighted (weight 1) edges: test hops here
    run = shortest_path_tree(graph, source=0, weighted=False)
    dist, parent = _state_maps(run)
    want = nx.single_source_shortest_path_length(G, 0)
    for v in G.nodes():
        if v in want:
            assert dist[v] == want[v], v
        else:
            assert math.isinf(dist[v])
    # parent invariant: dist[p] + 1 == dist[v], (p, v) is an edge
    for v, p in parent.items():
        if p >= 0:
            assert G.has_edge(p, v)
            assert dist[p] + 1 == dist[v]
    assert parent[0] == -1


def test_trace_path_valid(tmp_graph_dir):
    G = nx.gnm_random_graph(40, 90, seed=5)
    assert nx.has_path(G, 0, 17)
    graph = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    run = shortest_path_tree(graph, source=0, weighted=False)
    path = trace_path(run.state, 0, 17)
    assert path[0] == 0 and path[-1] == 17
    for a, b in zip(path, path[1:]):
        assert G.has_edge(a, b)
    assert len(path) - 1 == nx.shortest_path_length(G, 0, 17)


def test_trace_path_unreachable(tmp_graph_dir):
    G = nx.Graph()
    G.add_edges_from([(0, 1), (2, 3)])
    graph = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    run = shortest_path_tree(graph, source=0, weighted=False)
    assert trace_path(run.state, 0, 3) == []
    assert trace_path(run.state, 0, 1) == [0, 1]


def test_tree_determinism(tmp_graph_dir):
    G = nx.gnm_random_graph(30, 80, seed=3)
    g1 = graph_from_nx(G, f"{tmp_graph_dir}/a", num_parts=3)
    g2 = graph_from_nx(G, f"{tmp_graph_dir}/b", num_parts=5)
    _, p1 = _state_maps(shortest_path_tree(g1, 0, weighted=False))
    _, p2 = _state_maps(shortest_path_tree(g2, 0, weighted=False))
    assert p1 == p2  # smallest-parent tie-break kills layout effects


def test_trace_path_persisted_store(tmp_graph_dir, tmp_path, monkeypatch):
    """Past the broadcast bound trace_path persists the tree once as
    vid-bucketed parquet and walks file reads — same path either way."""
    import igraph_ray.stages.vertex_ids as vx

    G = nx.gnm_random_graph(40, 90, seed=5)
    graph = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    run = shortest_path_tree(graph, source=0, weighted=False)
    want = trace_path(run.state, 0, 17)  # broadcast path
    monkeypatch.setattr(vx, "BROADCAST_MAX_VERTICES", 1)
    tree_dir = str(tmp_path / "ptree")
    got = trace_path(run.state, 0, 17, tree_dir=tree_dir)
    assert got == want
    # store is kept and reused (no second persist): meta + buckets exist
    import os

    assert os.path.exists(os.path.join(tree_dir, "meta.json"))
    again = trace_path(run.state, 0, 17, tree_dir=tree_dir)
    assert again == want
    # unreachable and trivial targets through the store too
    assert trace_path(run.state, 0, 0, tree_dir=tree_dir) == [0]


def test_trace_path_stale_store_repersists(
    tmp_graph_dir, tmp_path, monkeypatch
):
    """Reusing a tree_dir with a DIFFERENT SSSP tree (new source)
    must not silently trace the stale persisted tree — the identity
    stamp in meta.json forces a re-persist."""
    import igraph_ray.stages.vertex_ids as vx

    G = nx.gnm_random_graph(40, 90, seed=5)
    graph = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    run0 = shortest_path_tree(graph, source=0, weighted=False)
    run7 = shortest_path_tree(graph, source=7, weighted=False)
    want7 = trace_path(run7.state, 7, 17)  # broadcast path truth
    monkeypatch.setattr(vx, "BROADCAST_MAX_VERTICES", 1)
    tree_dir = str(tmp_path / "ptree")
    trace_path(run0.state, 0, 17, tree_dir=tree_dir)  # persist tree 0
    got = trace_path(run7.state, 7, 17, tree_dir=tree_dir)
    assert got == want7
    assert got[0] == 7


def test_parent_tree_store_roundtrip(tmp_graph_dir, tmp_path):
    from igraph_ray.state.parent_tree import ParentTree, persist_parent_tree

    G = nx.gnm_random_graph(50, 120, seed=9)
    graph = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    run = shortest_path_tree(graph, source=0, weighted=False)
    # tiny buckets force multi-bucket walks + LRU eviction
    tree = persist_parent_tree(
        run.state, str(tmp_path / "t"), rows_per_bucket=8
    )
    tree.cache_buckets = 2
    dist, parent = _state_maps(run)
    for v, p in parent.items():
        assert tree.parent_of(v) == p
    assert tree.parent_of(10_000) is None
    path = tree.trace(0, 17)
    assert path[0] == 0 and path[-1] == 17
    for a, b in zip(path, path[1:]):
        assert G.has_edge(a, b)
