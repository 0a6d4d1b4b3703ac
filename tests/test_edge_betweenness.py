"""Edge betweenness vs networkx (igraph ``edge_betweenness`` parity)."""

import networkx as nx

from igraph_ray.api import edges_dataset
from igraph_ray.kernels.betweenness import edge_betweenness
from tests.util import ds_to_table, graph_from_nx, nx_edge_arrays


def _ebc_dict(graph, G, **kw):
    src, dst = nx_edge_arrays(G)
    ds = edges_dataset(src, dst)
    tbl = ds_to_table(edge_betweenness(graph, ds, **kw))
    return {
        (a, b): v
        for a, b, v in zip(
            tbl.column("a").to_pylist(),
            tbl.column("b").to_pylist(),
            tbl.column("ebc").to_pylist(),
        )
    }


def _ref(G, **kw):
    return {
        (min(u, v), max(u, v)): val
        for (u, v), val in nx.edge_betweenness_centrality(G, **kw).items()
    }


def test_path_graph_exact(tmp_graph_dir):
    G = nx.path_graph(6)  # middle edges carry the most paths
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    got = _ebc_dict(g, G, normalized=False)
    ref = _ref(G, normalized=False)
    assert set(got) == set(ref)
    for e in ref:
        assert abs(got[e] - ref[e]) < 1e-9, e


def test_gnm_exact_normalized(tmp_graph_dir):
    G = nx.gnm_random_graph(25, 60, seed=11)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    got = _ebc_dict(g, G, normalized=True)
    ref = _ref(G, normalized=True)
    assert set(got) == set(ref)
    for e in ref:
        assert abs(got[e] - ref[e]) < 1e-9, e


def test_disconnected_zero_edges(tmp_graph_dir):
    G = nx.Graph()
    nx.add_path(G, [0, 1, 2])
    nx.add_path(G, [10, 11])  # separate component
    G.add_edge(20, 21)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    got = _ebc_dict(g, G, normalized=False)
    ref = _ref(G, normalized=False)
    assert set(got) == set(ref)
    for e in ref:
        assert abs(got[e] - ref[e]) < 1e-9, e
