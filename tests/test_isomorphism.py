"""VF2 exact isomorphism vs nx.is_isomorphic, including the classic
same-degree-sequence non-isomorphic pairs WL/degree checks miss."""

import networkx as nx
import numpy as np
import pytest

from igraph_ray.api import edges_dataset
from igraph_ray.kernels.isomorphism import isomorphic


def _ds(G):
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    return edges_dataset(src, dst)


def _check_mapping(G1, G2, mapping):
    m = dict(
        zip(
            mapping.column("vid1").to_pylist(),
            mapping.column("vid2").to_pylist(),
        )
    )
    assert len(set(m.values())) == len(m)
    for u, v in G1.edges():
        assert G2.has_edge(m[u], m[v]), (u, v)


@pytest.mark.parametrize("seed", [0, 3, 11])
def test_relabeled_random_graphs_isomorphic(ray_session, seed):
    G1 = nx.gnm_random_graph(30, 70, seed=seed)
    rng = np.random.default_rng(seed)
    perm = dict(zip(G1.nodes(), rng.permutation(30) + 100))
    G2 = nx.relabel_nodes(G1, perm)
    ok, mapping = isomorphic(_ds(G1), _ds(G2))
    assert ok and nx.is_isomorphic(G1, G2)
    _check_mapping(G1, G2, mapping)


def test_perturbed_graph_not_isomorphic(ray_session):
    G1 = nx.gnm_random_graph(25, 60, seed=5)
    G2 = nx.relabel_nodes(G1, {v: v + 50 for v in G1.nodes()})
    # rewire one edge so degree sequence changes
    u, v = next(iter(G2.edges()))
    G2.remove_edge(u, v)
    w = next(x for x in G2.nodes() if not G2.has_edge(u, x) and x != u)
    G2.add_edge(u, w)
    ok, mapping = isomorphic(_ds(G1), _ds(G2))
    assert ok == nx.is_isomorphic(G1, G2)


def test_same_degree_sequence_not_isomorphic(ray_session):
    # C6 vs two triangles: both 2-regular on 6 vertices
    G1 = nx.cycle_graph(6)
    G2 = nx.disjoint_union(nx.cycle_graph(3), nx.cycle_graph(3))
    ok, mapping = isomorphic(_ds(G1), _ds(G2))
    assert not ok and not nx.is_isomorphic(G1, G2)
    assert mapping is None


def test_regular_cospectral_like_pair(ray_session):
    # 3-regular pair: K_{3,3} vs the prism graph (K3 x K2) — same
    # degree sequence, non-isomorphic (prism has triangles)
    G1 = nx.complete_bipartite_graph(3, 3)
    G2 = nx.circular_ladder_graph(3)
    ok, _ = isomorphic(_ds(G1), _ds(G2))
    assert not ok and not nx.is_isomorphic(G1, G2)


def test_petersen_automorphism(ray_session):
    G = nx.petersen_graph()
    H = nx.relabel_nodes(G, {v: 9 - v for v in G.nodes()})
    ok, mapping = isomorphic(_ds(G), _ds(H))
    assert ok
    _check_mapping(G, H, mapping)


def test_different_sizes_fast_reject(ray_session):
    ok, mapping = isomorphic(
        _ds(nx.path_graph(4)), _ds(nx.path_graph(5))
    )
    assert not ok and mapping is None


def test_gather_bound_raises(ray_session):
    with pytest.raises(NotImplementedError):
        isomorphic(
            _ds(nx.path_graph(4)),
            _ds(nx.path_graph(4)),
            gather_max_arcs=1,
        )
