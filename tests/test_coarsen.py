"""Auto-coarsening of the bounded-gather community methods
(``kernels/coarsen.py``): past the gather bound, fastgreedy / GN /
walktrap contract to the distributed-Louvain quotient, run exactly on
it, and project back with ``approximated=True``.  Asserted here under
artificially tiny bounds on planted-partition fixtures: no clique is
ever split, every vertex keeps a label, the flag semantics hold, and
under-bound behavior is byte-identical to round 3."""

import networkx as nx
import pytest

from igraph_ray.api import edges_dataset
from igraph_ray.kernels.community_extra import fastgreedy, girvan_newman
from igraph_ray.kernels.walktrap import walktrap
from tests.util import ds_to_table


def _ring_edges(n_cliques=8, clique=6):
    G = nx.ring_of_cliques(n_cliques, clique)
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    return G, src, dst


def _labels(assign_tbl):
    return dict(
        zip(
            assign_tbl.column("vid").to_pylist(),
            assign_tbl.column("community").to_pylist(),
        )
    )


def _assert_cliques_unsplit(labels, n_cliques, clique):
    # planted recovery: each clique's vertices share one label
    for c in range(n_cliques):
        members = range(c * clique, (c + 1) * clique)
        assert len({labels[v] for v in members}) == 1
    assert len(labels) == n_cliques * clique


def test_fastgreedy_auto_coarsens_past_bound(ray_session):
    G, src, dst = _ring_edges()
    res = fastgreedy(edges_dataset(src, dst), gather_max_arcs=50)
    assign, qs = res
    assert res.approximated is True
    _assert_cliques_unsplit(_labels(ds_to_table(assign)), 8, 6)
    assert qs and max(qs) > 0.5


def test_fastgreedy_under_bound_unchanged(ray_session):
    G, src, dst = _ring_edges(4, 4)
    direct = fastgreedy(edges_dataset(src, dst))
    assert direct.approximated is False
    d_assign, d_qs = direct
    # identical to the pre-flag API shape: plain tuple unpack works
    assert ds_to_table(d_assign).num_rows == 16


def test_fastgreedy_raise_when_disabled(ray_session):
    G, src, dst = _ring_edges(4, 4)
    with pytest.raises(NotImplementedError):
        fastgreedy(
            edges_dataset(src, dst),
            gather_max_arcs=5,
            auto_coarsen=False,
        )


def test_girvan_newman_auto_coarsens_past_bound(ray_session):
    G, src, dst = _ring_edges()
    res = girvan_newman(
        edges_dataset(src, dst),
        target_communities=8,
        gather_max_arcs=50,
    )
    assign, q, rem = res
    assert res.approximated is True
    labels = _labels(ds_to_table(assign))
    _assert_cliques_unsplit(labels, 8, 6)
    assert len({labels[v] for v in labels}) >= 2


def test_walktrap_auto_coarsens_past_bound(ray_session):
    G, src, dst = _ring_edges()
    res = walktrap(edges_dataset(src, dst), gather_max_vertices=10)
    assign, qs = res
    assert res.approximated is True
    _assert_cliques_unsplit(_labels(ds_to_table(assign)), 8, 6)


def test_walktrap_under_bound_flag_false(ray_session):
    G, src, dst = _ring_edges(4, 4)
    res = walktrap(edges_dataset(src, dst))
    assert res.approximated is False


def _ring_plus_island(n_cliques=8, clique=6):
    # main ring of cliques + a DISCONNECTED triangle: Louvain collapses
    # the triangle to one community, so its quotient vertex carries
    # only a self-loop and vanishes from the quotient arcs of methods
    # that symmetrize with keep_self_loops=False (GN, walktrap).  The
    # projection must keep those vertices labeled (their own Louvain
    # community), not IndexError or borrow a neighbor's label.
    G, src, dst = _ring_edges(n_cliques, clique)
    island = [100, 101, 102]
    for i in range(3):
        src.append(island[i])
        dst.append(island[(i + 1) % 3])
    return src, dst, island


def test_girvan_newman_coarsen_disconnected_island(ray_session):
    src, dst, island = _ring_plus_island()
    res = girvan_newman(
        edges_dataset(src, dst),
        target_communities=9,
        gather_max_arcs=50,
    )
    assign, q, rem = res
    assert res.approximated is True
    labels = _labels(ds_to_table(assign))
    _assert_cliques_unsplit(
        {v: c for v, c in labels.items() if v < 100}, 8, 6
    )
    # island vertices are present, share one label, and that label is
    # not any ring vertex's label
    assert {labels[v] for v in island} == {min(island)}
    ring_labels = {labels[v] for v in labels if v < 100}
    assert min(island) not in ring_labels


def test_walktrap_coarsen_disconnected_island(ray_session):
    src, dst, island = _ring_plus_island()
    res = walktrap(edges_dataset(src, dst), gather_max_vertices=10)
    assign, qs = res
    assert res.approximated is True
    labels = _labels(ds_to_table(assign))
    assert {labels[v] for v in island} == {min(island)}
    assert len(labels) == 8 * 6 + 3
