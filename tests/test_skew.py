"""Skew-path tests (FIXTURES.md hub_star): a 10⁴-degree hub exercises
the two-level message combine (hub receiver sees ≤ P rows per
iteration) and must produce results identical to the oracle."""

import networkx as nx
from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

from igraph_ray.kernels import connected_components, pagerank
from tests.util import graph_from_nx, min_vid_components, state_dict


def test_hub_star_pagerank(tmp_graph_dir):
    # star pagerank oscillates with amplitude ~alpha^t, so use a
    # faster-mixing alpha to reach 1e-6 agreement in few iterations
    n = 5_000
    G = nx.star_graph(n)
    # small random background so the graph is not a pure star
    import random

    rng = random.Random(5)
    for _ in range(200):
        u, v = rng.randrange(1, n), rng.randrange(1, n)
        if u != v:
            G.add_edge(u, v)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=4)
    run = pagerank(g, alpha=0.7, tol=1e-10, max_iter=80,
                   raise_on_nonconvergence=False)
    ours = state_dict(run.state, "rank")
    ref = _pagerank_python(G, alpha=0.7, tol=1e-12, max_iter=1000)
    # spot-check hub + sampled leaves (full dict compare is slow)
    assert abs(ours[0] - ref[0]) < 1e-6
    for v in range(1, n, 499):
        assert abs(ours[v] - ref[v]) < 1e-6


def test_hub_star_components(tmp_graph_dir):
    G = nx.star_graph(5_000)
    G.add_edge(10_000, 10_001)  # disconnected pair
    g = graph_from_nx(G, tmp_graph_dir, num_parts=4)
    run = connected_components(g)
    assert state_dict(run.state, "comp") == min_vid_components(G)
    # star diameter 2 → min-label fixpoint within a few rounds
    assert run.iterations <= 4
