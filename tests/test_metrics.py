"""Oracle tests for whole-graph metrics and Jaccard similarity
(igraph ``reciprocity`` / ``density`` / ``assortativity_degree`` /
``similarity_jaccard`` parity via the networkx twins)."""

import math

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.kernels.metrics import (
    degree_assortativity,
    density,
    jaccard_edge_similarity,
    reciprocity,
)
from tests.util import ds_to_table, nx_edge_arrays


def _pairs_ds(G) -> ray.data.Dataset:
    src, dst = nx_edge_arrays(G)
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    )


def test_reciprocity_gnp():
    G = nx.gnp_random_graph(60, 0.08, seed=4, directed=True)
    arcs = _pairs_ds(G)
    r, m, rec = reciprocity(arcs)
    assert m == G.number_of_edges()
    assert r == pytest.approx(nx.overall_reciprocity(G))


def test_reciprocity_ignores_loops_and_dups():
    arcs = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 1, 0, 0, 2, 2], pa.int64()),
                "dst": pa.array([1, 0, 1, 0, 3, 3], pa.int64()),
            }
        )
    )
    # distinct non-loop arcs: 0→1, 1→0, 2→3 → 2 of 3 reciprocated
    r, m, rec = reciprocity(arcs)
    assert (m, rec) == (3, 2)
    assert r == pytest.approx(2 / 3)


def test_density_matches_nx():
    G = nx.gnm_random_graph(40, 111, seed=9)
    assert density(
        G.number_of_nodes(), G.number_of_edges()
    ) == pytest.approx(nx.density(G))
    D = nx.gnp_random_graph(30, 0.1, seed=2, directed=True)
    assert density(
        D.number_of_nodes(), D.number_of_edges(), directed=True
    ) == pytest.approx(nx.density(D))


def test_degree_assortativity_gnm():
    G = nx.gnm_random_graph(80, 200, seed=13)
    r, stats = degree_assortativity(_pairs_ds(G))
    assert r == pytest.approx(
        nx.degree_assortativity_coefficient(G), abs=1e-9
    )
    assert stats["m"] == 2 * G.number_of_edges()
    assert stats["sx"] == stats["sy"]


def test_degree_assortativity_star_is_negative_one():
    G = nx.star_graph(6)
    r, _ = degree_assortativity(_pairs_ds(G))
    assert r == pytest.approx(-1.0)


def test_jaccard_edges_gnm():
    G = nx.gnm_random_graph(70, 180, seed=21)
    out = ds_to_table(jaccard_edge_similarity(_pairs_ds(G)))
    got = {
        (min(a, b), max(a, b)): j
        for a, b, j in zip(
            out.column("src").to_pylist(),
            out.column("dst").to_pylist(),
            out.column("jaccard").to_pylist(),
        )
    }
    ref = {
        (min(u, v), max(u, v)): j
        for u, v, j in nx.jaccard_coefficient(G, ebunch=list(G.edges()))
    }
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-12), k


def test_jaccard_common_counts_triangle_plus_tail():
    # 0-1-2 triangle with a tail 2-3: edge (0,1) shares neighbour 2
    G = nx.Graph([(0, 1), (1, 2), (0, 2), (2, 3)])
    out = ds_to_table(jaccard_edge_similarity(_pairs_ds(G)))
    rows = {
        (a, b): (c, j)
        for a, b, c, j in zip(
            out.column("src").to_pylist(),
            out.column("dst").to_pylist(),
            out.column("common").to_pylist(),
            out.column("jaccard").to_pylist(),
        )
    }
    assert rows[(0, 1)] == (1, pytest.approx(1 / 3))
    assert rows[(2, 3)][0] == 0
    assert rows[(2, 3)][1] == 0.0


def test_dice_matches_definition():
    G = nx.gnm_random_graph(50, 120, seed=6)
    out = ds_to_table(jaccard_edge_similarity(_pairs_ds(G)))
    for a, b, c, d in zip(
        out.column("src").to_pylist(),
        out.column("dst").to_pylist(),
        out.column("common").to_pylist(),
        out.column("dice").to_pylist(),
    ):
        assert d == pytest.approx(2 * c / (G.degree(a) + G.degree(b)))


def test_adamic_adar_matches_nx():
    from igraph_ray.kernels.metrics import adamic_adar_edges

    G = nx.gnm_random_graph(60, 170, seed=12)
    out = ds_to_table(adamic_adar_edges(_pairs_ds(G)))
    got = {
        (min(a, b), max(a, b)): v
        for a, b, v in zip(
            out.column("src").to_pylist(),
            out.column("dst").to_pylist(),
            out.column("adamic_adar").to_pylist(),
        )
    }
    ref = {
        (min(u, v), max(u, v)): p
        for u, v, p in nx.adamic_adar_index(G, ebunch=list(G.edges()))
    }
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-9), k


def test_rich_club_gnm():
    from igraph_ray.kernels.metrics import rich_club

    G = nx.gnm_random_graph(90, 260, seed=17)
    tbl = rich_club(_pairs_ds(G)).to_pandas().set_index("k")["phi"]
    want = nx.rich_club_coefficient(G, normalized=False)
    assert set(tbl.index) == set(want)
    for k, phi in want.items():
        assert tbl[k] == pytest.approx(phi, abs=1e-12), k


def test_rich_club_star_and_clique():
    from igraph_ray.kernels.metrics import rich_club

    # clique: every phi(k) == 1 for all defined k
    K = nx.complete_graph(7)
    tbl = rich_club(_pairs_ds(K)).to_pandas()
    assert (tbl["phi"] == 1.0).all()
    want = nx.rich_club_coefficient(K, normalized=False)
    assert set(tbl["k"]) == set(want)


def test_avg_neighbor_degree_gnm():
    from igraph_ray.kernels.metrics import avg_neighbor_degree

    G = nx.gnm_random_graph(80, 220, seed=23)
    out = ds_to_table(avg_neighbor_degree(_pairs_ds(G))).to_pandas()
    out = out.set_index("key")
    want = nx.average_neighbor_degree(G)
    for v, w in want.items():
        if G.degree(v) == 0:
            assert v not in out.index
            continue
        assert out.loc[v, "knn"] == pytest.approx(w, abs=1e-12), v
        assert out.loc[v, "degree"] == G.degree(v)


def test_degree_connectivity_gnm():
    from igraph_ray.kernels.metrics import degree_connectivity

    G = nx.gnm_random_graph(80, 220, seed=29)
    tbl = degree_connectivity(_pairs_ds(G)).to_pandas().set_index("k")["knnk"]
    want = nx.average_degree_connectivity(G)
    want = {k: v for k, v in want.items() if k > 0}
    assert set(tbl.index) == set(want)
    for k, v in want.items():
        assert tbl[k] == pytest.approx(v, abs=1e-12), k


def test_partition_quality_components_and_random():
    from igraph_ray.kernels.modularity import partition_quality

    G = nx.gnm_random_graph(70, 140, seed=31)
    # partition 1: connected components; partition 2: vid % 4
    for parts in (
        list(nx.connected_components(G)),
        [set(v for v in G if v % 4 == r) for r in range(4)],
    ):
        parts = [p for p in parts if p]
        comm = {v: i for i, p in enumerate(parts) for v in p}
        mem = ray.data.from_arrow(
            pa.table(
                {
                    "key": pa.array(sorted(comm), pa.int64()),
                    "comm": pa.array(
                        [comm[v] for v in sorted(comm)], pa.int64()
                    ),
                }
            )
        )
        got = partition_quality(_pairs_ds(G), mem).to_pandas().iloc[0]
        cov, perf = nx.community.partition_quality(G, parts)
        assert got["coverage"] == pytest.approx(cov, abs=1e-12)
        assert got["performance"] == pytest.approx(perf, abs=1e-12)
        assert got["n"] == G.number_of_nodes()
        assert got["m"] == G.number_of_edges()


def test_attribute_assortativity_vs_nx():
    import networkx as nx
    import numpy as np

    from igraph_ray.kernels.metrics import attribute_assortativity

    rng = np.random.default_rng(13)
    G = nx.gnm_random_graph(60, 150, seed=13)
    cats = {v: ["x", "y", "z"][rng.integers(0, 3)] for v in G.nodes()}
    nx.set_node_attributes(G, cats, "grp")
    src, dst, cs, cd = [], [], [], []
    for u, v in G.edges():
        for a, b in ((u, v), (v, u)):  # both directions (undirected)
            src.append(a)
            dst.append(b)
            cs.append(cats[a])
            cd.append(cats[b])
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "cat_src": pa.array(cs),
                "cat_dst": pa.array(cd),
            }
        )
    ).repartition(4)
    r, stats = attribute_assortativity(ds)
    want = nx.attribute_assortativity_coefficient(G, "grp")
    assert abs(r - want) < 1e-12
    assert stats["n"] == 2 * G.number_of_edges()


def test_attribute_assortativity_perfect():
    import numpy as np

    from igraph_ray.kernels.metrics import attribute_assortativity

    # two monochromatic cliques, no cross edges -> r == 1
    src, dst, cs, cd = [], [], [], []
    for grp, base in (("a", 0), ("b", 10)):
        for i in range(4):
            for j in range(4):
                if i != j:
                    src.append(base + i)
                    dst.append(base + j)
                    cs.append(grp)
                    cd.append(grp)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "cat_src": pa.array(cs),
                "cat_dst": pa.array(cd),
            }
        )
    )
    r, _ = attribute_assortativity(ds)
    assert r == 1.0


def test_eulerian_summary_vs_nx():
    from igraph_ray.kernels.metrics import eulerian_summary
    from tests.util import min_vid_components

    def run(G):
        comp = min_vid_components(G)
        vs = sorted(G.nodes())
        st = ray.data.from_arrow(
            pa.table(
                {
                    "vid": pa.array(vs, pa.int64()),
                    "comp": pa.array([comp[v] for v in vs], pa.int64()),
                }
            )
        )
        return eulerian_summary(_pairs_ds(G), st).to_pylist()[0]

    cases = [
        nx.cycle_graph(6),
        nx.path_graph(5),
        nx.star_graph(3),
        nx.complete_graph(5),  # all even -> circuit
        nx.complete_graph(4),  # all odd -> neither
    ]
    for seed in (7, 8):
        cases.append(nx.gnm_random_graph(40, 60, seed=seed))
    for G in cases:
        G.remove_nodes_from(list(nx.isolates(G)))
        if G.number_of_edges() == 0:
            continue
        row = run(G)
        assert bool(row["has_euler_circuit"]) == nx.is_eulerian(G), G
        assert bool(row["has_euler_path"]) == nx.has_eulerian_path(G), G
        odd = sum(1 for _, d in G.degree() if d % 2)
        assert row["n_odd_degree"] == odd
        assert row["n_edge_components"] == nx.number_connected_components(G)


def test_eulerian_summary_disconnected():
    from igraph_ray.kernels.metrics import eulerian_summary
    from tests.util import min_vid_components

    G = nx.union(
        nx.cycle_graph(3),
        nx.relabel_nodes(nx.cycle_graph(3), {0: 10, 1: 11, 2: 12}),
    )
    comp = min_vid_components(G)
    vs = sorted(G.nodes())
    st = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(vs, pa.int64()),
                "comp": pa.array([comp[v] for v in vs], pa.int64()),
            }
        )
    )
    row = eulerian_summary(_pairs_ds(G), st).to_pylist()[0]
    assert row["n_edge_components"] == 2
    assert row["has_euler_circuit"] == 0 and row["has_euler_path"] == 0


def test_burt_constraint_vs_nx():
    from igraph_ray.kernels.metrics import burt_constraint

    for G in (
        nx.gnm_random_graph(80, 200, seed=11),
        nx.star_graph(5),
        nx.complete_graph(6),
        nx.path_graph(4),
    ):
        out = ds_to_table(burt_constraint(_pairs_ds(G)))
        got = dict(
            zip(
                out.column("vid").to_pylist(),
                out.column("constraint").to_pylist(),
            )
        )
        want = nx.constraint(G)
        for v, w in want.items():
            if np.isnan(w):
                assert v not in got  # isolated vertices have no rows
            else:
                assert got[v] == pytest.approx(w, abs=1e-9), v


def test_jaccard_all_pairs_vs_nx():
    import itertools

    from igraph_ray.kernels.metrics import jaccard_all_pairs

    G = nx.gnm_random_graph(60, 150, seed=12)
    out = ds_to_table(jaccard_all_pairs(_pairs_ds(G)))
    got = {
        (s, d): (c, j, dc)
        for s, d, c, j, dc in zip(
            out.column("src").to_pylist(),
            out.column("dst").to_pylist(),
            out.column("common").to_pylist(),
            out.column("jaccard").to_pylist(),
            out.column("dice").to_pylist(),
        )
    }
    n_pos = 0
    for u, v in itertools.combinations(sorted(G.nodes()), 2):
        c = len(set(G[u]) & set(G[v]))
        if c == 0:
            assert (u, v) not in got
            continue
        n_pos += 1
        j = c / len(set(G[u]) | set(G[v]))
        dice = 2 * c / (G.degree(u) + G.degree(v))
        gc, gj, gd = got[(u, v)]
        assert gc == c and gj == pytest.approx(j, abs=1e-15)
        assert gd == pytest.approx(dice, abs=1e-15)
    assert len(got) == n_pos


def test_resource_allocation_matches_nx():
    from igraph_ray.kernels.metrics import resource_allocation_edges

    G = nx.gnm_random_graph(70, 240, seed=13)
    got = ds_to_table(resource_allocation_edges(_pairs_ds(G)))
    ours = {
        (min(s, d), max(s, d)): v
        for s, d, v in zip(
            got.column("src").to_pylist(),
            got.column("dst").to_pylist(),
            got.column("resource_allocation").to_pylist(),
        )
    }
    ref = {
        (min(u, v), max(u, v)): r
        for u, v, r in nx.resource_allocation_index(G, G.edges())
    }
    assert set(ours) == set(ref)
    for k, r in ref.items():
        assert ours[k] == pytest.approx(r, abs=1e-9), k


def test_preferential_attachment_degree_products():
    # exact-int check of the degree-product score on a pinned graph
    from igraph_ray.kernels.metrics import _degree_map, attach_degrees

    G = nx.gnm_random_graph(50, 140, seed=21)
    ds = _pairs_ds(G)
    degs = _degree_map(ds).materialize()
    got = ds_to_table(attach_degrees(ds, degs))
    for s, d, a, b in zip(
        got.column("src").to_pylist(),
        got.column("dst").to_pylist(),
        got.column("deg_src").to_pylist(),
        got.column("deg_dst").to_pylist(),
    ):
        assert a == G.degree(s) and b == G.degree(d)
        assert a * b == next(
            iter(nx.preferential_attachment(G, [(s, d)]))
        )[2]
