"""Cohesive blocking (``kernels/cohesion.py``) vs a brute-force
reference that enumerates ALL minimum-size vertex separators by
subset enumeration and runs the identical Moody-White recursion +
filter — exact block/cohesion parity on random small graphs, plus
hand-checkable fixtures and the strict-cohesion-chain invariant."""

import itertools

import networkx as nx
import numpy as np
import pytest

from igraph_ray.api import edges_dataset
from igraph_ray.kernels.cohesion import (
    _cohesive_blocks_py,
    cohesive_blocks,
)


# ---------------------------------------------------------------------------
# brute-force reference (all separators, same recursion + filter)
# ---------------------------------------------------------------------------
def _brute_kappa_and_seps(G):
    n = G.number_of_nodes()
    vs = sorted(G.nodes())
    if n <= 1:
        return 0, []
    if not nx.is_connected(G):
        return 0, [frozenset()]
    if G.number_of_edges() == n * (n - 1) // 2:
        return n - 1, []
    for k in range(1, n - 1):
        seps = [
            frozenset(S)
            for S in itertools.combinations(vs, k)
            if not nx.is_connected(G.subgraph(set(vs) - set(S)))
        ]
        if seps:
            return k, seps
    return n - 1, []


def _brute_blocks(G):
    root = frozenset(G.nodes())
    found = {}
    queue = [root]
    seen = {root}
    while queue:
        blk = queue.pop()
        sub = G.subgraph(blk)
        k, seps = _brute_kappa_and_seps(sub)
        if blk not in found or found[blk] < k:
            found[blk] = k
        for sep in seps:
            rest = sub.subgraph(blk - sep)
            for comp in nx.connected_components(rest):
                child = frozenset(comp) | sep
                if len(child) < len(blk) and child not in seen:
                    seen.add(child)
                    queue.append(child)
        if not seps and k == 0 and len(blk) > 1:
            for comp in nx.connected_components(sub):
                child = frozenset(comp)
                if len(child) < len(blk) and child not in seen:
                    seen.add(child)
                    queue.append(child)
    items = [(b, k) for b, k in found.items() if len(b) > 1]
    keep = [
        (b, k)
        for b, k in items
        if not any(b < b2 and k2 >= k for b2, k2 in items)
    ]
    return {(b, k) for b, k in keep}


def _fast_blocks(G):
    pairs = {
        (min(u, v), max(u, v)) for u, v in G.edges() if u != v
    }
    vs = np.array(sorted(G.nodes()), np.int64)
    blocks, cohesion, _parent = _cohesive_blocks_py(vs, pairs)
    return {(b, k) for b, k in zip(blocks, cohesion)}


@pytest.mark.parametrize("seed", range(8))
def test_matches_brute_on_random_graphs(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(6, 10))
    m = int(rng.integers(n, min(2 * n + 4, n * (n - 1) // 2)))
    G = nx.gnm_random_graph(n, m, seed=seed)
    assert _fast_blocks(G) == _brute_blocks(G), (n, m, seed)


def test_two_k4s_sharing_a_vertex():
    G = nx.complete_graph(4)
    H = nx.relabel_nodes(nx.complete_graph(4), {0: 3, 1: 4, 2: 5, 3: 6})
    G = nx.compose(G, H)  # share vertex 3
    got = _fast_blocks(G)
    assert (frozenset(range(7)), 1) in got
    assert (frozenset({0, 1, 2, 3}), 3) in got
    assert (frozenset({3, 4, 5, 6}), 3) in got
    assert len(got) == 3


def test_complete_graph_single_block():
    got = _fast_blocks(nx.complete_graph(5))
    assert got == {(frozenset(range(5)), 4)}


def test_path_root_only():
    got = _fast_blocks(nx.path_graph(6))
    assert got == {(frozenset(range(6)), 1)}


def test_cohesion_strictly_increases_down_the_tree():
    G = nx.barbell_graph(5, 2)
    pairs = {(min(u, v), max(u, v)) for u, v in G.edges()}
    vs = np.array(sorted(G.nodes()), np.int64)
    blocks, cohesion, parent = _cohesive_blocks_py(vs, pairs)
    for i, p in enumerate(parent):
        if p >= 0:
            assert blocks[i] < blocks[p]
            assert cohesion[i] > cohesion[p]


def test_distributed_surface(ray_session):
    G = nx.barbell_graph(4, 1)
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    out, cohesion, parent = cohesive_blocks(edges_dataset(src, dst))
    tbl = out.to_arrow_refs()
    import pyarrow as pa
    import ray as _ray

    t = pa.concat_tables([x for x in _ray.get(tbl) if x.num_rows])
    got = {}
    for b, v in zip(
        t.column("block").to_pylist(), t.column("vid").to_pylist()
    ):
        got.setdefault(b, set()).add(v)
    sets = {frozenset(v) for v in got.values()}
    assert frozenset(G.nodes()) in sets
    assert frozenset(range(4)) in sets  # first K4, cohesion 3
    assert cohesion[0] == 1
    assert parent[0] == -1


# ---------------------------------------------------------------------------
# auto-coarsen tiers (round 5)
# ---------------------------------------------------------------------------
def _block_sets(out_ds, cohesion):
    import pyarrow as pa
    import ray as _ray

    t = pa.concat_tables(
        [x for x in _ray.get(out_ds.to_arrow_refs()) if x.num_rows]
    )
    got = {}
    for b, v in zip(
        t.column("block").to_pylist(), t.column("vid").to_pylist()
    ):
        got.setdefault(b, set()).add(v)
    return {(frozenset(vs), cohesion[b]) for b, vs in got.items()}


def test_per_component_routing_exact(ray_session):
    """Total arcs over the bound but every component under it: the
    per-component tier computes each tree EXACTLY and merges under a
    cohesion-0 global root — identical block/cohesion sets to the
    direct path."""
    G = nx.disjoint_union(nx.barbell_graph(4, 1), nx.barbell_graph(4, 1))
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    direct = cohesive_blocks(edges_dataset(src, dst))
    routed = cohesive_blocks(edges_dataset(src, dst), gather_max_arcs=30)
    assert direct.approximated is False
    assert routed.approximated is False
    d_out, d_coh, d_par = direct
    r_out, r_coh, r_par = routed
    assert _block_sets(d_out, d_coh) == _block_sets(r_out, r_coh)
    # both roots: whole graph at cohesion 0, parent -1
    assert d_coh[0] == r_coh[0] == 0
    assert d_par[0] == r_par[0] == -1


def test_quotient_tier_approximated(ray_session):
    """A single over-bound component falls through to the Louvain
    quotient: approximated=True, the root block spans every vertex,
    every clique stays inside one immediate block."""
    G = nx.ring_of_cliques(8, 6)
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    res = cohesive_blocks(edges_dataset(src, dst), gather_max_arcs=50)
    assert res.approximated is True
    out, cohesion, parent = res
    sets = _block_sets(out, cohesion)
    assert (frozenset(G.nodes()), cohesion[0]) in sets
    assert parent[0] == -1


def test_bound_raises_when_disabled(ray_session):
    G = nx.ring_of_cliques(4, 4)
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    with pytest.raises(NotImplementedError):
        cohesive_blocks(
            edges_dataset(src, dst),
            gather_max_arcs=2,
            auto_coarsen=False,
        )
