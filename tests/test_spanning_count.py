"""Exact spanning-tree count (Kirchhoff matrix-tree, Bareiss big-int
elimination) vs closed forms and a brute-force enumeration oracle.

networkx's own ``number_of_spanning_trees`` needs scipy (absent from
this container), so the oracles here are independent: published
closed forms (Cayley ``n^(n-2)`` for K_n, ``n`` for C_n, ``1`` for
trees, ``m^(n-1) n^(m-1)`` for K_{m,n}, 2000 for Petersen) and an
exhaustive C(m, n-1) subset enumeration for small random graphs.
"""

from itertools import combinations

import networkx as nx
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.kernels.spanning import spanning_tree_count


def _ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, v in edges], pa.int64()),
                "dst": pa.array([v for u, v in edges], pa.int64()),
            }
        )
    )


def _brute(G):
    n = G.number_of_nodes()
    if n == 0:
        return 0
    if n == 1:
        return 1
    count = 0
    edges = [e for e in G.edges() if e[0] != e[1]]
    for sub in combinations(edges, n - 1):
        T = nx.Graph(sub)
        if T.number_of_nodes() == n and nx.is_connected(T):
            count += 1
    return count


@pytest.mark.parametrize(
    "G, expected",
    [
        (nx.complete_graph(5), 5**3),
        (nx.complete_graph(8), 8**6),
        (nx.cycle_graph(7), 7),
        (nx.path_graph(9), 1),
        (nx.complete_bipartite_graph(3, 4), 3**3 * 4**2),
        (nx.petersen_graph(), 2000),
        (nx.random_labeled_tree(12, seed=3), 1),
    ],
)
def test_closed_forms(ray_session, G, expected):
    assert spanning_tree_count(_ds(list(G.edges()))) == expected


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_brute_force_random(ray_session, seed):
    G = nx.gnm_random_graph(7, 11, seed=seed)
    assert spanning_tree_count(_ds(list(G.edges()))) == _brute(G)


def test_disconnected_is_zero(ray_session):
    assert spanning_tree_count(_ds([(0, 1), (2, 3)])) == 0


def test_single_vertex_self_loop(ray_session):
    # self-loops are ignored; a lone vertex has exactly one
    # (empty) spanning tree
    assert spanning_tree_count(_ds([(0, 0)])) == 1


def test_self_loops_do_not_change_count(ray_session):
    base = list(nx.complete_graph(5).edges())
    assert spanning_tree_count(_ds(base + [(2, 2), (4, 4)])) == 5**3


def test_parallel_pairs_collapse(ray_session):
    # duplicated pair rows must not weight the count
    assert spanning_tree_count(_ds([(0, 1), (1, 0), (1, 2), (0, 2)])) == 3


def test_bigint_exactness(ray_session):
    # K_20: 20^18 = 262144000000000000000000 — far beyond int64
    assert spanning_tree_count(_ds(list(nx.complete_graph(20).edges()))) == 20**18
