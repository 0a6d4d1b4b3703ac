"""fastgreedy (CNM) vs nx.community.greedy_modularity_communities and
girvan_newman vs nx.community.girvan_newman.  CNM parity is asserted
on distinct-weight graphs (unique argmax at every merge step, so the
greedy sequence is reference-deterministic); GN parity on fixtures
whose max-betweenness edge is unique at each split."""

import networkx as nx
import numpy as np
import pytest

from igraph_ray.api import edges_dataset
from igraph_ray.kernels.community_extra import fastgreedy, girvan_newman
from tests.util import ds_to_table


def _partition_sets(assign_tbl):
    comm = {}
    for v, c in zip(
        assign_tbl.column("vid").to_pylist(),
        assign_tbl.column("community").to_pylist(),
    ):
        comm.setdefault(c, set()).add(v)
    return {frozenset(s) for s in comm.values()}


def _distinct_weight_graph(seed, n=40, m=120):
    rng = np.random.default_rng(seed)
    G = nx.gnm_random_graph(n, m, seed=seed)
    # distinct weights -> unique ΔQ argmax at every CNM step
    weights = rng.permutation(m) + 1.0
    for (u, v), w in zip(G.edges(), weights):
        G[u][v]["weight"] = float(w)
    return G


@pytest.mark.parametrize("seed", [0, 1, 7])
def test_cnm_matches_nx_partition(ray_session, seed):
    G = _distinct_weight_graph(seed)
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    w = [G[u][v]["weight"] for u, v in G.edges()]
    assign, qs = fastgreedy(edges_dataset(src, dst, weight=w))
    ours = _partition_sets(ds_to_table(assign))
    ref = {
        frozenset(c)
        for c in nx.community.greedy_modularity_communities(
            G, weight="weight"
        )
    }
    assert ours == ref
    # reported max-Q equals nx modularity of the partition
    q_nx = nx.community.modularity(
        G, [set(s) for s in ours], weight="weight"
    )
    assert abs(max(qs) - q_nx) < 1e-9


def test_cnm_unweighted_cliques(ray_session):
    G = nx.ring_of_cliques(6, 5)
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    assign, qs = fastgreedy(edges_dataset(src, dst))
    ours = _partition_sets(ds_to_table(assign))
    ref = {
        frozenset(c)
        for c in nx.community.greedy_modularity_communities(G)
    }
    assert ours == ref


def test_cnm_disconnected_components_stay_separate(ray_session):
    # two cliques, no inter-edges: CNM must never merge across
    src = [0, 0, 1, 5, 5, 6]
    dst = [1, 2, 2, 6, 7, 7]
    assign, qs = fastgreedy(edges_dataset(src, dst))
    parts = _partition_sets(ds_to_table(assign))
    assert parts == {frozenset({0, 1, 2}), frozenset({5, 6, 7})}
    assert len(qs) >= 5  # 4 merges + singleton Q


def test_cnm_q_trace_monotone_while_positive(ray_session):
    G = _distinct_weight_graph(3)
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    w = [G[u][v]["weight"] for u, v in G.edges()]
    _assign, qs = fastgreedy(edges_dataset(src, dst, weight=w))
    qs = np.array(qs)
    best = int(np.argmax(qs))
    assert np.all(np.diff(qs[: best + 1]) > 0)


def test_gn_karate_two_communities(ray_session):
    G = nx.karate_club_graph()
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    assign, q, rem = girvan_newman(
        edges_dataset(src, dst), target_communities=2
    )
    ours = _partition_sets(ds_to_table(assign))
    ref_split = next(nx.community.girvan_newman(G))
    assert ours == {frozenset(c) for c in ref_split}
    assert rem.num_rows >= 1


def test_gn_barbell_max_modularity(ray_session):
    # two K6 joined by a path: the bridge edges split first and the
    # max-modularity partition is the two bells (+ path fragments)
    G = nx.barbell_graph(6, 0)
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    assign, q, _rem = girvan_newman(edges_dataset(src, dst))
    ours = _partition_sets(ds_to_table(assign))
    q_nx = nx.community.modularity(G, [set(s) for s in ours])
    assert abs(q - q_nx) < 1e-9
    assert frozenset(range(6)) in ours and frozenset(range(6, 12)) in ours


def test_gn_successive_splits_match_nx(ray_session):
    # deterministic fixture: ring of cliques has unique max-EB edges
    G = nx.ring_of_cliques(4, 4)
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    gen = nx.community.girvan_newman(G)
    for k in (2, 3, 4):
        assign, _q, _rem = girvan_newman(
            edges_dataset(src, dst), target_communities=k
        )
        ours = _partition_sets(ds_to_table(assign))
        ref = {frozenset(c) for c in next(gen)}
        assert ours == ref, k


def test_gn_gather_bound_raises(ray_session):
    src = [0, 1, 2]
    dst = [1, 2, 0]
    with pytest.raises(NotImplementedError):
        girvan_newman(
            edges_dataset(src, dst),
            gather_max_arcs=2,
            auto_coarsen=False,
        )
