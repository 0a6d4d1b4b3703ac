"""Katz centrality (nx oracle) + greedy coloring (property oracle).

Katz: exact value parity with ``nx.katz_centrality`` (networkx 3.6.1).
Coloring: iterated-Luby output is *a* proper coloring, so the oracle
asserts the defining properties — no adjacent equal colors, contiguous
color ids, and the classic ``≤ Δ+1`` bound — plus determinism.
"""

import networkx as nx
import numpy as np
import pytest

from igraph_ray.kernels.coloring import greedy_coloring
from igraph_ray.kernels.katz import katz_centrality
from tests.util import ds_to_table, graph_from_nx


def _col_dict(ds, col):
    tbl = ds_to_table(ds)
    return dict(
        zip(tbl.column("vid").to_pylist(), tbl.column(col).to_pylist())
    )


def test_katz_matches_nx_undirected(tmp_graph_dir):
    G = nx.gnm_random_graph(70, 210, seed=11)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    alpha = 0.9 / max(d for _, d in G.degree())
    got = _col_dict(
        katz_centrality(g, G.number_of_nodes(), alpha=alpha, tol=1e-9),
        "centrality",
    )
    ref = nx.katz_centrality(G, alpha=alpha, tol=1e-9, max_iter=2000)
    for v in G.nodes():
        assert got[v] == pytest.approx(ref[v], abs=1e-6), v


def test_katz_matches_nx_directed(tmp_graph_dir):
    G = nx.gnp_random_graph(50, 0.08, seed=23, directed=True)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2, symmetrize=False)
    got = _col_dict(
        katz_centrality(g, G.number_of_nodes(), alpha=0.05, tol=1e-9),
        "centrality",
    )
    ref = nx.katz_centrality(G, alpha=0.05, tol=1e-9, max_iter=2000)
    for v in G.nodes():
        assert got[v] == pytest.approx(ref[v], abs=1e-6), v


def test_katz_beta_scaling(tmp_graph_dir):
    # with normalization the result is invariant to uniform beta
    G = nx.cycle_graph(12)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    a = _col_dict(katz_centrality(g, 12, alpha=0.2, beta=1.0), "centrality")
    b = _col_dict(katz_centrality(g, 12, alpha=0.2, beta=3.0), "centrality")
    for v in G.nodes():
        assert a[v] == pytest.approx(b[v], abs=1e-6)


def test_katz_raises_on_nonconvergence(tmp_graph_dir):
    from igraph_ray.kernels.pagerank import PowerIterationFailedConvergence

    G = nx.gnm_random_graph(30, 90, seed=5)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    with pytest.raises(PowerIterationFailedConvergence):
        # alpha ≥ 1/λ_max diverges, exactly as nx raises
        katz_centrality(g, 30, alpha=0.9, tol=1e-9, max_iter=50)


def _assert_proper(G, colors):
    assert set(colors) == set(G.nodes())
    for u, v in G.edges():
        if u != v:
            assert colors[u] != colors[v], (u, v)
    used = sorted(set(colors.values()))
    max_deg = max((d for _, d in G.degree()), default=0)
    assert used == list(range(len(used)))  # contiguous ids from 0
    assert len(used) <= max_deg + 1


def test_coloring_gnm_proper(tmp_graph_dir):
    G = nx.gnm_random_graph(120, 420, seed=31)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    colors = _col_dict(greedy_coloring(g), "color")
    _assert_proper(G, colors)


def test_coloring_complete_graph_uses_n_colors(tmp_graph_dir):
    G = nx.complete_graph(9)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    colors = _col_dict(greedy_coloring(g), "color")
    _assert_proper(G, colors)
    assert len(set(colors.values())) == 9  # K_n needs exactly n


def test_coloring_star_two_colors(tmp_graph_dir):
    G = nx.star_graph(25)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    colors = _col_dict(greedy_coloring(g), "color")
    _assert_proper(G, colors)
    assert len(set(colors.values())) == 2


def test_coloring_with_isolated_vertices(tmp_graph_dir):
    G = nx.gnm_random_graph(40, 60, seed=3)
    G.add_nodes_from(range(40, 48))  # isolated
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    colors = _col_dict(greedy_coloring(g), "color")
    _assert_proper(G, colors)
    for v in range(40, 48):
        assert colors[v] == 0  # no neighbours → first epoch


def test_coloring_deterministic(tmp_graph_dir, tmp_path):
    G = nx.gnm_random_graph(60, 180, seed=9)
    g1 = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    c1 = _col_dict(greedy_coloring(g1), "color")
    g2 = graph_from_nx(G, str(tmp_path / "g2"), num_parts=3)
    c2 = _col_dict(greedy_coloring(g2), "color")
    assert c1 == c2


def test_katz_fixed_integer_exact_and_partition_invariant(tmp_path):
    # the integer-exact truncated variant must be bitwise identical
    # across partition counts (order-independent integer sums), unit
    # L2 norm, and rank-agree with convergent Katz on a simple graph
    from igraph_ray.kernels.katz import katz_fixed_integer

    G = nx.gnm_random_graph(40, 120, seed=7)
    g2 = graph_from_nx(G, str(tmp_path / "g2"), num_parts=2)
    g5 = graph_from_nx(G, str(tmp_path / "g5"), num_parts=5)
    t2 = katz_fixed_integer(g2, g2.num_vertices)
    t5 = katz_fixed_integer(g5, g5.num_vertices)
    assert t2.equals(t5)
    c = t2.column("centrality").to_numpy(zero_copy_only=False)
    assert abs(float((c * c).sum()) - 1.0) < 1e-12
    # rank agreement with the convergent reference mode (top vertex)
    conv = ds_to_table(
        katz_centrality(g2, num_vertices=g2.num_vertices, alpha=0.05)
    )
    cv = dict(
        zip(
            conv.column("vid").to_pylist(),
            conv.column("centrality").to_pylist(),
        )
    )
    fv = dict(
        zip(
            t2.column("vid").to_pylist(),
            t2.column("centrality").to_pylist(),
        )
    )
    top_fixed = max(fv, key=fv.get)
    # the truncated walk count favors the same high-centrality region
    assert cv[top_fixed] >= np.percentile(list(cv.values()), 80)
