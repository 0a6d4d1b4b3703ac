"""Louvain validation (SURVEY.md §2.3(1)-style): the synchronous
parity-scheduled schedule cannot replay networkx's seeded async moves,
so we assert *quality* — modularity at or near the reference's — plus
exact recovery on unambiguous fixtures."""

import networkx as nx
import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.api import edges_dataset
from igraph_ray.kernels.louvain import louvain
from tests.util import ds_to_table


def _nx_modularity(G, assign_tbl):
    comm = {}
    for v, c in zip(
        assign_tbl.column("vid").to_pylist(),
        assign_tbl.column("community").to_pylist(),
    ):
        comm.setdefault(c, set()).add(v)
    return nx.community.modularity(G, comm.values(), weight="weight")


def test_disjoint_cliques_exact(ray_session):
    G = nx.Graph()
    for base in (0, 10, 20):
        for i in range(5):
            for j in range(i + 1, 5):
                G.add_edge(base + i, base + j, weight=1.0)
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    assign, mods = louvain(edges_dataset(src, dst))
    tbl = ds_to_table(assign)
    comm = dict(
        zip(tbl.column("vid").to_pylist(), tbl.column("community").to_pylist())
    )
    # each clique is one community, distinct across cliques
    for base in (0, 10, 20):
        labels = {comm[base + i] for i in range(5)}
        assert len(labels) == 1, labels
    assert len({comm[0], comm[10], comm[20]}) == 3
    ref = nx.community.modularity(
        G, [set(range(b, b + 5)) for b in (0, 10, 20)]
    )
    assert abs(mods[-1] - ref) < 1e-9


def test_ring_of_cliques_quality(ray_session):
    G = nx.ring_of_cliques(8, 6)
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    assign, mods = louvain(edges_dataset(src, dst))
    ours = _nx_modularity(G, ds_to_table(assign))
    ref_comms = nx.community.louvain_communities(G, seed=1)
    ref = nx.community.modularity(G, ref_comms)
    assert ours >= 0.95 * ref, (ours, ref)
    # internal consistency: reported level modularity == recomputed
    assert abs(mods[-1] - ours) < 1e-9


def test_lfr_like_random_quality(ray_session):
    G = nx.gnm_random_graph(200, 800, seed=13)
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    assign, mods = louvain(edges_dataset(src, dst))
    ours = _nx_modularity(G, ds_to_table(assign))
    ref = nx.community.modularity(
        G, nx.community.louvain_communities(G, seed=3)
    )
    # random graphs have weak structure; stay within 85% of reference
    assert ours >= 0.85 * ref, (ours, ref)
    assert mods == sorted(mods)  # levels never decrease modularity


def test_weighted_pull(ray_session):
    # two triangles bridged by a heavy edge: weights must dominate
    src = [0, 1, 2, 3, 4, 5, 2]
    dst = [1, 2, 0, 4, 5, 3, 3]
    w = [5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 0.5]
    assign, _ = louvain(edges_dataset(src, dst, weight=w))
    tbl = ds_to_table(assign)
    comm = dict(
        zip(tbl.column("vid").to_pylist(), tbl.column("community").to_pylist())
    )
    assert comm[0] == comm[1] == comm[2]
    assert comm[3] == comm[4] == comm[5]
    assert comm[0] != comm[3]


def test_join_mode_matches_broadcast(ray_session):
    """mode='join' (distributed comm map, the >20M-vertex scale path)
    must take exactly the same move decisions as the broadcast path —
    both run the shared _decide rule on the same parity schedule."""
    G = nx.ring_of_cliques(6, 5)
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    a_b, mods_b = louvain(edges_dataset(src, dst), mode="broadcast")
    a_j, mods_j = louvain(edges_dataset(src, dst), mode="join")
    tb = ds_to_table(a_b)
    tj = ds_to_table(a_j)
    db = dict(
        zip(tb.column("vid").to_pylist(), tb.column("community").to_pylist())
    )
    dj = dict(
        zip(tj.column("vid").to_pylist(), tj.column("community").to_pylist())
    )
    assert db == dj
    assert mods_b == mods_j


def test_join_mode_matches_broadcast_gnm(ray_session):
    G = nx.gnm_random_graph(60, 240, seed=17)
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    a_b, mods_b = louvain(
        edges_dataset(src, dst), mode="broadcast", max_rounds_per_level=6
    )
    a_j, mods_j = louvain(
        edges_dataset(src, dst), mode="join", max_rounds_per_level=6
    )
    tb = ds_to_table(a_b)
    tj = ds_to_table(a_j)
    db = dict(
        zip(tb.column("vid").to_pylist(), tb.column("community").to_pylist())
    )
    dj = dict(
        zip(tj.column("vid").to_pylist(), tj.column("community").to_pylist())
    )
    assert db == dj
    assert mods_b == mods_j
