"""Multi-pivot BFS + closeness/harmonic centrality oracle tests
(igraph ``closeness`` / ``harmonic_centrality`` parity via networkx)."""

import math

import networkx as nx
import numpy as np
import pytest

from igraph_ray.kernels.multibfs import (
    closeness_centrality,
    harmonic_centrality,
    pivot_distances,
    sample_pivots,
)
from tests.util import ds_to_table, graph_from_nx


def _col_dict(ds, col):
    tbl = ds_to_table(ds)
    return dict(
        zip(tbl.column("vid").to_pylist(), tbl.column(col).to_pylist())
    )


def test_pivot_distances_match_per_source_bfs(tmp_graph_dir):
    G = nx.gnm_random_graph(120, 260, seed=31)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=4)
    pivots = np.array([0, 17, 55, 119], np.int64)
    run = pivot_distances(g, pivots)
    tbl = ds_to_table(run.state)
    vids = tbl.column("vid").to_pylist()
    for i, p in enumerate(pivots):
        ref = nx.single_source_shortest_path_length(G, int(p))
        got = dict(zip(vids, tbl.column(f"d{i}").to_pylist()))
        for v in G.nodes():
            if v in ref:
                assert got[v] == ref[v], (p, v)
            else:
                assert math.isinf(got[v]), (p, v)


def test_harmonic_exact_all_pivots(tmp_graph_dir):
    G = nx.gnm_random_graph(60, 110, seed=5)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    got = _col_dict(
        harmonic_centrality(g, G.number_of_nodes()), "harmonic"
    )
    ref = nx.harmonic_centrality(G)
    for v in G.nodes():
        assert got[v] == pytest.approx(ref[v], abs=1e-9), v


def test_closeness_exact_all_pivots_disconnected(tmp_graph_dir):
    # two components — exercises the wf_improved component scaling
    G = nx.gnm_random_graph(40, 70, seed=8)
    G.add_edges_from([(100, 101), (101, 102)])
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    got = _col_dict(
        closeness_centrality(g, G.number_of_nodes()), "closeness"
    )
    ref = nx.closeness_centrality(G)
    for v in G.nodes():
        assert got[v] == pytest.approx(ref[v], abs=1e-9), v


def test_sampled_estimates_track_exact(tmp_graph_dir):
    G = nx.connected_watts_strogatz_graph(120, 6, 0.2, seed=17)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=4)
    n = G.number_of_nodes()
    pivots = sample_pivots(np.arange(n, dtype=np.int64), 48)
    assert len(pivots) == 48
    est = _col_dict(harmonic_centrality(g, n, pivots=pivots), "harmonic")
    ref = nx.harmonic_centrality(G)
    rel = [abs(est[v] - ref[v]) / ref[v] for v in G.nodes()]
    # 48/120 pivots: estimates within 35% per vertex, ~10% in the mean
    assert max(rel) < 0.35
    assert np.mean(rel) < 0.10


def test_eccentricity_diameter_radius_exact(tmp_graph_dir):
    from igraph_ray.kernels.multibfs import diameter_radius, eccentricity

    G = nx.connected_watts_strogatz_graph(80, 4, 0.1, seed=3)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    ecc_ds = eccentricity(g, np.arange(80, dtype=np.int64))
    got = _col_dict(ecc_ds, "eccentricity")
    ref = nx.eccentricity(G)
    for v in G.nodes():
        assert got[v] == ref[v], v
    d, r = diameter_radius(ecc_ds.materialize())
    assert d == nx.diameter(G)
    assert r == nx.radius(G)


def test_eccentricity_isolated_vertex(tmp_graph_dir):
    G = nx.path_graph(5)
    G.add_node(10)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    from igraph_ray.kernels.multibfs import eccentricity

    got = _col_dict(
        eccentricity(g, np.array(sorted(G.nodes()), np.int64)),
        "eccentricity",
    )
    assert got[10] == 0
    assert got[0] == 4 and got[2] == 2


def test_distance_histogram_wiener_vs_nx(tmp_graph_dir):
    from igraph_ray.kernels.multibfs import distance_histogram

    G = nx.gnm_random_graph(40, 70, seed=17)
    g = graph_from_nx(G, tmp_graph_dir)
    hist = ds_to_table(
        distance_histogram(g, np.array(sorted(G.nodes()), np.int64))
    )
    d = np.array(hist.column("dist").to_pylist())
    p = np.array(hist.column("pairs").to_pylist())
    total = int((d * p).sum())
    # ordered reachable pairs halve to the Wiener index
    want = sum(
        nx.wiener_index(G.subgraph(c)) for c in nx.connected_components(G)
    )
    assert total // 2 == int(want)
    # average over reachable ordered pairs == nx on a connected graph
    H = nx.connected_watts_strogatz_graph(30, 4, 0.3, seed=4)
    g2 = graph_from_nx(H, tmp_graph_dir + "_h")
    hist2 = ds_to_table(
        distance_histogram(g2, np.array(sorted(H.nodes()), np.int64))
    )
    d2 = np.array(hist2.column("dist").to_pylist())
    p2 = np.array(hist2.column("pairs").to_pylist())
    apl = float((d2 * p2).sum() / p2.sum())
    assert apl == pytest.approx(nx.average_shortest_path_length(H), abs=1e-12)


def test_weighted_eccentricity_vs_nx(tmp_graph_dir):
    from igraph_ray.kernels.multibfs import eccentricity

    G = nx.gnm_random_graph(30, 60, seed=23)
    rng = np.random.default_rng(2)
    for u, v in G.edges():
        G[u][v]["weight"] = int(rng.integers(1, 6))
    import pyarrow as pa
    import ray.data

    from igraph_ray.api import build_graph, edges_dataset

    src = np.array([u for u, v in G.edges()], np.int64)
    dst = np.array([v for u, v in G.edges()], np.int64)
    w = np.array([G[u][v]["weight"] for u, v in G.edges()], np.float64)
    vertices = ray.data.from_arrow(
        pa.table({"vid": pa.array(sorted(G.nodes()), pa.int64())})
    )
    g = build_graph(
        edges_dataset(src, dst, w),
        tmp_graph_dir,
        num_parts=3,
        symmetrize=True,
        vertices=vertices,
    )
    got = _col_dict(
        eccentricity(g, np.array(sorted(G.nodes()), np.int64), weighted=True),
        "eccentricity",
    )
    ecc = {}
    for comp in nx.connected_components(G):
        sub = G.subgraph(comp)
        ecc.update(nx.eccentricity(sub, weight="weight"))
    for v, e in ecc.items():
        assert got[v] == e, v
