"""Wilson uniform spanning tree: tree properties, determinism,
distribution sanity."""

from collections import Counter

import networkx as nx
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.kernels.spanning import random_spanning_tree


def _ds(G):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, v in G.edges()], pa.int64()),
                "dst": pa.array([v for u, v in G.edges()], pa.int64()),
            }
        )
    )


def _tree_edges(G, seed=0):
    t = random_spanning_tree(_ds(G), seed=seed)
    return list(zip(t.column("src").to_pylist(), t.column("dst").to_pylist()))


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_is_spanning_tree(ray_session, seed):
    G = nx.gnm_random_graph(40, 120, seed=seed)
    G = G.subgraph(max(nx.connected_components(G), key=len)).copy()
    edges = _tree_edges(G, seed=seed)
    assert len(edges) == G.number_of_nodes() - 1
    T = nx.Graph(edges)
    assert set(T.nodes()) == set(G.nodes())
    assert nx.is_tree(T)
    for u, v in edges:
        assert G.has_edge(u, v)


def test_deterministic(ray_session):
    G = nx.gnm_random_graph(25, 70, seed=4)
    G = G.subgraph(max(nx.connected_components(G), key=len)).copy()
    assert _tree_edges(G, seed=9) == _tree_edges(G, seed=9)


def test_distribution_covers_all_trees_of_c4(ray_session):
    """K3 has 3 spanning trees; across seeds all should appear
    (uniformity smoke, not a chi-square test)."""
    G = nx.complete_graph(3)
    seen = Counter()
    for seed in range(30):
        seen[tuple(sorted(_tree_edges(G, seed=seed)))] += 1
    assert len(seen) == 3


def test_disconnected_raises(ray_session):
    G = nx.disjoint_union(nx.path_graph(3), nx.path_graph(3))
    with pytest.raises(Exception, match="disconnected"):
        _tree_edges(G)
