"""Brandes betweenness oracle tests vs networkx (igraph
``Graph.betweenness`` parity on unweighted graphs)."""

import networkx as nx
import numpy as np

from igraph_ray.api import build_graph, edges_dataset
from igraph_ray.kernels.betweenness import betweenness_centrality
from tests.util import ds_to_table, graph_from_nx


def _bc_dict(ds):
    tbl = ds_to_table(ds)
    return dict(
        zip(
            tbl.column("vid").to_pylist(),
            tbl.column("betweenness").to_pylist(),
        )
    )


def test_star_exact(tmp_graph_dir):
    G = nx.star_graph(8)  # center 0
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    bc = _bc_dict(betweenness_centrality(g, normalized=False))
    ref = nx.betweenness_centrality(G, normalized=False)
    for v in G.nodes():
        assert abs(bc[v] - ref[v]) < 1e-9, v


def test_gnm_exact_all_pivots(tmp_graph_dir):
    G = nx.gnm_random_graph(30, 75, seed=21)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    bc = _bc_dict(betweenness_centrality(g, normalized=True))
    ref = nx.betweenness_centrality(G, normalized=True)
    for v in G.nodes():
        assert abs(bc[v] - ref[v]) < 1e-9, v


def test_disconnected(tmp_graph_dir):
    G = nx.Graph()
    G.add_edges_from([(0, 1), (1, 2), (5, 6)])
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    bc = _bc_dict(betweenness_centrality(g, normalized=False))
    ref = nx.betweenness_centrality(G, normalized=False)
    for v in G.nodes():
        assert abs(bc[v] - ref[v]) < 1e-9, v


def test_sampled_full_k_equals_exact(tmp_graph_dir):
    G = nx.gnm_random_graph(16, 36, seed=5)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    exact = _bc_dict(betweenness_centrality(g, normalized=True))
    sampled = _bc_dict(
        betweenness_centrality(g, k=G.number_of_nodes(), normalized=True)
    )
    for v in G.nodes():
        assert abs(exact[v] - sampled[v]) < 1e-9


def test_sampled_pivots_approximate(tmp_graph_dir):
    # ring of cliques has stable high-betweenness bridge nodes; a
    # half-size pivot sample must rank bridges above clique interiors
    G = nx.ring_of_cliques(6, 5)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    approx = _bc_dict(
        betweenness_centrality(g, k=10, normalized=True)
    )
    ref = nx.betweenness_centrality(G, normalized=True)
    top_ref = sorted(ref, key=ref.get, reverse=True)[:6]
    top_ours = sorted(approx, key=approx.get, reverse=True)[:12]
    assert len(set(top_ref) & set(top_ours)) >= 4
