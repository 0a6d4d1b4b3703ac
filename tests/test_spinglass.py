"""Spinglass communities (``kernels/spinglass.py``) — planted
recovery, modularity quality vs Louvain, determinism, γ monotonicity."""

import networkx as nx
import numpy as np
import pytest

from igraph_ray.api import edges_dataset
from igraph_ray.kernels.spinglass import spinglass
from tests.util import ds_to_table


def _labels(ds):
    t = ds_to_table(ds)
    return dict(
        zip(t.column("vid").to_pylist(), t.column("community").to_pylist())
    )


def _edges(G):
    return [u for u, v in G.edges()], [v for u, v in G.edges()]


def test_ring_of_cliques_recovery(ray_session):
    G = nx.ring_of_cliques(6, 5)
    src, dst = _edges(G)
    lab = _labels(spinglass(edges_dataset(src, dst), seed=1))
    # every clique uniform, six distinct communities
    for c in range(6):
        members = range(c * 5, (c + 1) * 5)
        assert len({lab[v] for v in members}) == 1, c
    assert len(set(lab.values())) == 6


def test_modularity_close_to_louvain(ray_session):
    G = nx.gnm_random_graph(60, 180, seed=3)
    src, dst = _edges(G)
    lab = _labels(spinglass(edges_dataset(src, dst), seed=5))
    comms = {}
    for v, c in lab.items():
        comms.setdefault(c, set()).add(v)
    q_sg = nx.community.modularity(G, list(comms.values()))
    q_lv = nx.community.modularity(
        G, nx.community.louvain_communities(G, seed=7)
    )
    assert q_sg >= 0.95 * q_lv, (q_sg, q_lv)


def test_deterministic_across_partitionings(ray_session):
    G = nx.ring_of_cliques(4, 4)
    src, dst = _edges(G)
    l1 = _labels(spinglass(edges_dataset(src, dst), seed=9))
    l2 = _labels(
        spinglass(edges_dataset(src, dst, num_blocks=7), seed=9)
    )
    assert l1 == l2


def test_gamma_controls_resolution(ray_session):
    G = nx.ring_of_cliques(4, 5)
    src, dst = _edges(G)
    lo = _labels(spinglass(edges_dataset(src, dst), gamma=0.1, seed=2))
    hi = _labels(spinglass(edges_dataset(src, dst), gamma=2.0, seed=2))
    assert len(set(hi.values())) >= len(set(lo.values()))


def test_bound_raises_when_disabled(ray_session):
    src, dst = [0, 1, 2], [1, 2, 0]
    with pytest.raises(NotImplementedError):
        spinglass(
            edges_dataset(src, dst),
            gather_max_arcs=2,
            auto_coarsen=False,
        )


def test_auto_coarsens_past_bound(ray_session):
    """Past the gather bound spinglass anneals the Louvain quotient
    and projects back (approximated=True) — planted cliques stay
    uniform, every vertex keeps a label."""
    G = nx.ring_of_cliques(8, 6)
    src, dst = _edges(G)
    ds = spinglass(edges_dataset(src, dst), seed=1, gather_max_arcs=50)
    assert ds.approximated is True
    lab = _labels(ds)
    assert len(lab) == 48
    for c in range(8):
        members = range(c * 6, (c + 1) * 6)
        assert len({lab[v] for v in members}) == 1, c
    direct = spinglass(edges_dataset(src, dst), seed=1)
    assert direct.approximated is False
