"""Luby maximal-independent-set tests: the output must satisfy the
defining properties (independence + maximality) on the input graph,
deterministically."""

import networkx as nx

from igraph_ray.kernels.mis import maximal_independent_set
from tests.util import ds_to_table, graph_from_nx


def _mis_set(ds):
    tbl = ds_to_table(ds)
    return {
        v
        for v, m in zip(
            tbl.column("vid").to_pylist(), tbl.column("in_mis").to_pylist()
        )
        if m
    }


def _assert_mis(G, S):
    for u, v in G.edges():
        assert not (u in S and v in S), (u, v)  # independence
    for v in G.nodes():
        assert v in S or any(n in S for n in G.neighbors(v)), v  # maximal


def test_mis_gnm(tmp_graph_dir):
    G = nx.gnm_random_graph(120, 360, seed=29)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=4)
    S = _mis_set(maximal_independent_set(g))
    _assert_mis(G, S)
    # deterministic across runs
    assert S == _mis_set(maximal_independent_set(g))


def test_mis_star_and_isolates(tmp_graph_dir):
    G = nx.star_graph(8)
    G.add_node(50)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    S = _mis_set(maximal_independent_set(g))
    _assert_mis(G, S)
    assert 50 in S  # isolated vertices always join
