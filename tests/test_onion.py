"""Onion decomposition vs nx.onion_layers (exact integer layers)."""

import networkx as nx

from igraph_ray.kernels.onion import onion_layers
from tests.util import graph_from_nx, state_dict


def _check(G, tmp_graph_dir, parts=3):
    g = graph_from_nx(G, tmp_graph_dir, num_parts=parts)
    run = onion_layers(g)
    assert run.converged
    assert state_dict(run.state, "layer") == nx.onion_layers(G)


def test_onion_clique_plus_tail(tmp_graph_dir):
    G = nx.complete_graph(5)
    G.add_edges_from([(4, 10), (10, 11), (11, 12)])
    _check(G, tmp_graph_dir)


def test_onion_gnm(tmp_graph_dir):
    G = nx.gnm_random_graph(150, 700, seed=41)
    _check(G, tmp_graph_dir)


def test_onion_isolated_and_star(tmp_graph_dir):
    G = nx.star_graph(30)
    G.add_node(99)
    _check(G, tmp_graph_dir, parts=2)


def test_onion_layers_refine_cores(tmp_graph_dir):
    # every vertex of a smaller core number peels in an earlier layer
    G = nx.gnm_random_graph(80, 300, seed=7)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    layers = state_dict(onion_layers(g).state, "layer")
    cores = nx.core_number(G)
    for u in G.nodes():
        for v in G.nodes():
            if cores[u] < cores[v]:
                assert layers[u] < layers[v], (u, v)
