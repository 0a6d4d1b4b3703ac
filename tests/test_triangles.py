"""K4 tests: exact per-vertex counts vs networkx.triangles, self-loop
and multi-edge handling, transitivity (cluster.py:22-95,500-541)."""

import networkx as nx
import pytest

from igraph_ray.api import edges_dataset
from igraph_ray.kernels import (
    total_triangles,
    transitivity,
    triangle_counts,
)
from tests.util import ds_to_table, nx_edge_arrays


def _counts(ds) -> dict[int, int]:
    t = ds_to_table(ds)
    return dict(
        zip(t.column("vid").to_pylist(), t.column("triangles").to_pylist())
    )


def test_k5_complete():
    G = nx.complete_graph(5)
    src, dst = nx_edge_arrays(G)
    tc = triangle_counts(edges_dataset(src, dst))
    counts = _counts(tc)
    assert counts == {v: 6 for v in range(5)}
    assert total_triangles(tc) == 10


def test_gnm_exact():
    G = nx.gnm_random_graph(120, 700, seed=13)
    src, dst = nx_edge_arrays(G)
    tc = triangle_counts(edges_dataset(src, dst))
    assert _counts(tc) == nx.triangles(G)


def test_self_loops_and_multi_edges_ignored():
    # triangle 0-1-2 plus a self-loop and duplicated/reversed edges
    src = [0, 1, 2, 0, 0, 1, 2]
    dst = [1, 2, 0, 0, 1, 0, 1]
    tc = triangle_counts(edges_dataset(src, dst))
    assert _counts(tc) == {0: 1, 1: 1, 2: 1}
    assert total_triangles(tc) == 1


def test_triangle_free():
    G = nx.cycle_graph(6)
    src, dst = nx_edge_arrays(G)
    tc = triangle_counts(edges_dataset(src, dst))
    assert _counts(tc) == {v: 0 for v in range(6)}


def test_transitivity():
    G = nx.gnm_random_graph(80, 400, seed=21)
    src, dst = nx_edge_arrays(G)
    assert transitivity(edges_dataset(src, dst)) == pytest.approx(
        nx.transitivity(G), abs=1e-12
    )


def test_triangle_list_matches_enumeration():
    from igraph_ray.kernels.triangles import triangle_list

    G = nx.gnm_random_graph(60, 250, seed=31)
    src, dst = nx_edge_arrays(G)
    out = ds_to_table(triangle_list(edges_dataset(src, dst)))
    got = set(
        zip(
            out.column("a").to_pylist(),
            out.column("b").to_pylist(),
            out.column("c").to_pylist(),
        )
    )
    ref = set()
    for u in G:
        for v in G[u]:
            for w in G[v]:
                if w in G[u]:
                    ref.add(tuple(sorted((u, v, w))))
    assert got == ref


def test_local_clustering_matches_networkx():
    from igraph_ray.kernels.triangles import local_clustering

    G = nx.gnm_random_graph(70, 300, seed=37)
    src, dst = nx_edge_arrays(G)
    out = ds_to_table(local_clustering(edges_dataset(src, dst)))
    got = dict(
        zip(out.column("vid").to_pylist(), out.column("clustering").to_pylist())
    )
    ref = nx.clustering(G)
    assert all(abs(got[v] - ref[v]) < 1e-12 for v in got)


def test_join_fallback_path_exact():
    """The beyond-broadcast close path (hash joins) must agree with the
    broadcast path."""
    G = nx.gnm_random_graph(60, 250, seed=3)
    src, dst = nx_edge_arrays(G)
    tc = ds_to_table(
        triangle_counts(edges_dataset(src, dst), broadcast_max_vertices=0)
    )
    got = dict(
        zip(tc.column("vid").to_pylist(), tc.column("triangles").to_pylist())
    )
    assert got == nx.triangles(G)


def test_chunked_close_exact(monkeypatch):
    # force the close task's wedge expansion into many tiny chunks —
    # counts must be bit-identical to the unchunked result
    import igraph_ray.kernels.triangles as T

    G = nx.gnm_random_graph(80, 600, seed=11)
    src, dst = nx_edge_arrays(G)
    want = nx.triangles(G)
    monkeypatch.setattr(T, "_WEDGE_CHUNK", 7)
    got = _counts(triangle_counts(edges_dataset(src, dst)))
    assert all(got.get(v, 0) == c for v, c in want.items())
