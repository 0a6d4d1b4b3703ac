"""Chordality (MCS + parent test) vs the nx.is_chordal oracle."""

import random

import networkx as nx
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.kernels.chordal import is_chordal


def _ds(G: nx.Graph) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, v in G.edges()], pa.int64()),
                "dst": pa.array([v for u, v in G.edges()], pa.int64()),
            }
        )
    )


def _ktree(n: int, k: int, seed: int) -> nx.Graph:
    """k-tree — chordal by construction."""
    rng = random.Random(seed)
    G = nx.complete_graph(k + 1)
    cliques = [tuple(range(k + 1))]
    for v in range(k + 1, n):
        base = rng.choice(cliques)
        sub = rng.sample(base, k)
        for u in sub:
            G.add_edge(v, u)
        cliques.append(tuple(sub) + (v,))
    return G


def _peo_valid(G: nx.Graph, peo: list[int]) -> bool:
    H = G.copy()
    for v in peo:
        nb = list(H.neighbors(v))
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                if not H.has_edge(nb[i], nb[j]):
                    return False
        H.remove_node(v)
    return True


CASES = [
    ("tree", lambda: nx.random_labeled_tree(40, seed=3)),
    ("cycle4", lambda: nx.cycle_graph(4)),
    ("cycle7", lambda: nx.cycle_graph(7)),
    ("ktree3", lambda: _ktree(60, 3, 7)),
    ("ktree2", lambda: _ktree(35, 2, 9)),
    ("gnm", lambda: nx.gnm_random_graph(40, 120, seed=1)),
    ("gnm_sparse", lambda: nx.gnm_random_graph(30, 35, seed=4)),
    ("complete", lambda: nx.complete_graph(8)),
    ("petersen", lambda: nx.petersen_graph()),
]


@pytest.mark.parametrize("name,make", CASES, ids=[c[0] for c in CASES])
def test_matches_networkx(ray_session, name, make):
    G = make()
    r = is_chordal(_ds(G))
    assert r["chordal"] == nx.is_chordal(G)
    if r["chordal"]:
        assert _peo_valid(G, r["order"])
        assert sorted(r["order"]) == sorted(G.nodes())
    else:
        u, p, v = r["witness"]
        # u and p are neighbors of v but not of each other
        assert G.has_edge(u, v) and G.has_edge(p, v)
        assert not G.has_edge(u, p)


@pytest.mark.parametrize("probe", [False, True])
def test_c4_probe_agrees(ray_session, probe):
    for G, want in [
        (nx.cycle_graph(6), False),  # C6: no induced C4, MCS fallthrough
        (nx.cycle_graph(4), False),  # direct probe hit
        (_ktree(25, 2, 5), True),
    ]:
        assert is_chordal(_ds(G), c4_probe=probe)["chordal"] == want


def test_empty_and_single_edge(ray_session):
    empty = ray.data.from_arrow(
        pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    )
    assert is_chordal(empty)["chordal"] is True
    one = nx.Graph([(0, 1)])
    r = is_chordal(_ds(one))
    assert r["chordal"] and sorted(r["order"]) == [0, 1]


def test_gather_bound_raises(ray_session):
    G = nx.gnm_random_graph(20, 40, seed=2)
    with pytest.raises(ValueError):
        is_chordal(_ds(G), gather_max_arcs=10)
