"""VoteRank vs networkx.voterank."""

import networkx as nx

from igraph_ray.kernels.voterank import voterank
from tests.util import graph_from_nx


def _nx_avg_degree(G):
    degs = [d for _, d in G.degree()]
    return sum(degs) / len(degs)


def test_voterank_star_chain():
    # two stars joined by a path: distinct scores at every selection
    G = nx.Graph()
    G.add_edges_from((0, i) for i in range(1, 8))  # star at 0 (deg 7)
    G.add_edges_from((10, i) for i in range(11, 16))  # star at 10 (deg 5)
    G.add_edges_from([(7, 9), (9, 10)])
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        graph = graph_from_nx(G, f"{d}/g", num_parts=3)
        got = voterank(graph, G.number_of_nodes(), number_of_nodes=3)
    want = nx.voterank(G, number_of_nodes=3)
    assert got == want


def test_voterank_full_selection_karate():
    G = nx.karate_club_graph()
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        graph = graph_from_nx(G, f"{d}/g", num_parts=3)
        got = voterank(graph, G.number_of_nodes(), number_of_nodes=8)
    want = nx.voterank(G, number_of_nodes=8)
    # nx breaks score ties by node-iteration order while we use
    # smallest-vid; karate's top-8 selections are tie-free in practice
    assert got == want


def test_voterank_stops_when_votes_exhausted():
    # 3 disjoint edges: after selecting one endpoint per edge the
    # remaining abilities still produce positive scores until every
    # pair is spent; selection never exceeds vertex count and always
    # returns distinct vertices
    G = nx.Graph([(0, 1), (2, 3), (4, 5)])
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        graph = graph_from_nx(G, f"{d}/g", num_parts=2)
        got = voterank(graph, G.number_of_nodes(), number_of_nodes=6)
    want = nx.voterank(G, number_of_nodes=6)
    assert got == want
