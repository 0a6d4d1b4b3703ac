"""K-core decomposition vs nx.core_number (exact integers)."""

import networkx as nx

from igraph_ray.kernels.kcore import core_numbers
from tests.util import graph_from_nx, state_dict


def _check(G, tmp_graph_dir, parts=3):
    g = graph_from_nx(G, tmp_graph_dir, num_parts=parts)
    run = core_numbers(g)
    assert run.converged
    assert state_dict(run.state, "core") == nx.core_number(G)


def test_kcore_clique_plus_tail(tmp_graph_dir):
    G = nx.complete_graph(5)
    G.add_edges_from([(4, 10), (10, 11), (11, 12)])
    _check(G, tmp_graph_dir)


def test_kcore_gnm(tmp_graph_dir):
    G = nx.gnm_random_graph(150, 700, seed=41)
    _check(G, tmp_graph_dir)


def test_kcore_isolated_and_star(tmp_graph_dir):
    G = nx.star_graph(30)
    G.add_node(99)
    _check(G, tmp_graph_dir, parts=2)
