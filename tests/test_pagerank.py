"""K1 oracle tests (SURVEY.md §5.2): golden Langville-Meyer digraph,
networkx cross-check, dangling/personalization/nstart paths, error
paths."""

import networkx as nx
import numpy as np
import pytest
from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

from igraph_ray.api import build_graph, edges_dataset
from igraph_ray.kernels import PowerIterationFailedConvergence, pagerank
from tests.util import graph_from_nx, state_dict

# The 6-vertex digraph with published ranks (public values, also in
# networkx's test_pagerank.py); vertex 2 is dangling.
LANGVILLE_EDGES = [
    (1, 2), (1, 3), (3, 1), (3, 2), (3, 5),
    (4, 5), (4, 6), (5, 4), (5, 6), (6, 4),
]
LANGVILLE_RANKS = {
    1: 0.03721197, 2: 0.05395735, 3: 0.04150565,
    4: 0.37508082, 5: 0.20599833, 6: 0.28624589,
}


def test_langville_golden(tmp_graph_dir):
    src = [u for u, v in LANGVILLE_EDGES]
    dst = [v for u, v in LANGVILLE_EDGES]
    g = build_graph(edges_dataset(src, dst), tmp_graph_dir, num_parts=2)
    run = pagerank(g, alpha=0.9, tol=1e-10, max_iter=200)
    ours = state_dict(run.state, "rank")
    for v, expect in LANGVILLE_RANKS.items():
        assert ours[v] == pytest.approx(expect, abs=1e-4)


def test_gnm_oracle_allclose(tmp_graph_dir):
    G = nx.gnm_random_graph(150, 600, seed=7)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    run = pagerank(g, alpha=0.85, tol=1e-9, max_iter=300)
    ours = state_dict(run.state, "rank")
    ref = _pagerank_python(G, alpha=0.85, tol=1e-11, max_iter=1000)
    assert max(abs(ours[v] - ref[v]) for v in ref) < 1e-6


def test_rank_sums_to_one(tmp_graph_dir):
    G = nx.gnm_random_graph(100, 300, seed=3)
    g = graph_from_nx(G, tmp_graph_dir)
    run = pagerank(g, tol=1e-9, max_iter=200)
    assert run.state.sum("rank") == pytest.approx(1.0, abs=1e-9)


def test_personalization_and_dangling(tmp_graph_dir):
    G = nx.DiGraph(LANGVILLE_EDGES)
    src = [u for u, v in LANGVILLE_EDGES]
    dst = [v for u, v in LANGVILLE_EDGES]
    g = build_graph(edges_dataset(src, dst), tmp_graph_dir, num_parts=2)
    pers = {v: float(v) for v in G.nodes()}
    run = pagerank(g, alpha=0.85, tol=1e-10, max_iter=300, personalization=pers)
    ours = state_dict(run.state, "rank")
    ref = _pagerank_python(
        G, alpha=0.85, tol=1e-12, max_iter=1000, personalization=pers
    )
    assert max(abs(ours[v] - ref[v]) for v in ref) < 1e-6

    dang = {v: 1.0 if v == 4 else 0.0 for v in G.nodes()}
    run = pagerank(g, alpha=0.85, tol=1e-10, max_iter=300, dangling=dang)
    ours = state_dict(run.state, "rank")
    ref = _pagerank_python(
        G, alpha=0.85, tol=1e-12, max_iter=1000, dangling=dang
    )
    assert max(abs(ours[v] - ref[v]) for v in ref) < 1e-6


def test_nstart_converges_same(tmp_graph_dir):
    G = nx.gnm_random_graph(60, 200, seed=5)
    g = graph_from_nx(G, tmp_graph_dir)
    nstart = {v: 1.0 + (v % 7) for v in G.nodes()}
    run = pagerank(g, tol=1e-10, max_iter=300, nstart=nstart)
    ours = state_dict(run.state, "rank")
    ref = _pagerank_python(G, tol=1e-12, max_iter=1000)
    assert max(abs(ours[v] - ref[v]) for v in ref) < 1e-6


def test_nonconvergence_raises(tmp_graph_dir):
    g = build_graph(edges_dataset([0, 1], [1, 2]), tmp_graph_dir, num_parts=2)
    with pytest.raises(PowerIterationFailedConvergence):
        pagerank(g, max_iter=1, tol=1e-15)


def test_zero_personalization_raises(tmp_graph_dir):
    g = build_graph(edges_dataset([0], [1]), tmp_graph_dir, num_parts=1)
    with pytest.raises(Exception):  # ZeroDivisionError inside tasks
        pagerank(g, personalization={0: 0.0, 1: 0.0}, max_iter=5)


def test_single_vertex(tmp_graph_dir):
    import pyarrow as pa
    import ray.data

    vds = ray.data.from_arrow(pa.table({"vid": pa.array([7], pa.int64())}))
    g = build_graph(
        edges_dataset([], []), tmp_graph_dir, num_parts=1, vertices=vds
    )
    run = pagerank(g)
    assert state_dict(run.state, "rank") == {7: 1.0}


def test_weighted_edges(tmp_graph_dir):
    G = nx.Graph()
    rng = np.random.default_rng(11)
    for _ in range(150):
        u, v = rng.integers(0, 40, 2)
        if u != v:
            G.add_edge(int(u), int(v), weight=float(rng.integers(1, 5)))
    src, dst, w = (
        [u for u, v in G.edges()],
        [v for u, v in G.edges()],
        [G[u][v]["weight"] for u, v in G.edges()],
    )
    g = build_graph(
        edges_dataset(src, dst, w), tmp_graph_dir, num_parts=3, symmetrize=True
    )
    run = pagerank(g, tol=1e-10, max_iter=300)
    ours = state_dict(run.state, "rank")
    ref = _pagerank_python(G, tol=1e-12, max_iter=1000, weight="weight")
    assert max(abs(ours[v] - ref[v]) for v in ref) < 1e-6


def test_google_matrix_oracle(tmp_graph_dir):
    import numpy as np

    from igraph_ray.kernels.google import google_matrix, pagerank_dense

    src = np.array([u for u, v in LANGVILLE_EDGES])
    dst = np.array([v for u, v in LANGVILLE_EDGES])
    g = google_matrix(src, dst, num_vertices=7, alpha=0.9)
    assert np.allclose(g.sum(axis=1), 1.0)
    x = pagerank_dense(src, dst, num_vertices=7, alpha=0.9)
    # vertex 0 is isolated in the 1-indexed Langville graph; renormalize
    # over 1..6 to compare with the published vector
    ranks = {v: x[v] for v in range(1, 7)}
    s = sum(ranks.values())
    for v, expect in LANGVILLE_RANKS.items():
        assert abs(ranks[v] / s - expect) < 1e-3


def test_self_loops_match_reference(tmp_graph_dir):
    G = nx.DiGraph([(0, 1), (1, 2), (2, 0), (1, 1), (2, 2)])
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    g = build_graph(edges_dataset(src, dst), tmp_graph_dir, num_parts=2)
    run = pagerank(g, tol=1e-10, max_iter=300)
    ours = state_dict(run.state, "rank")
    ref = _pagerank_python(G, tol=1e-12, max_iter=1000)
    assert max(abs(ours[v] - ref[v]) for v in ref) < 1e-6
