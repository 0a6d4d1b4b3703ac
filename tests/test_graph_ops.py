"""Graph set operators vs the networkx edge-set oracles."""

from __future__ import annotations

import networkx as nx
import pyarrow as pa
import ray.data

from igraph_ray.stages.graph_ops import (
    graph_difference,
    graph_intersection,
    graph_union,
)
from tests.util import ds_to_table, nx_edge_arrays


def _ds(G) -> ray.data.Dataset:
    src, dst = nx_edge_arrays(G)
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    )


def _pairs(tbl: pa.Table) -> set[tuple[int, int]]:
    return set(
        zip(tbl.column("src").to_pylist(), tbl.column("dst").to_pylist())
    )


def _canon_edges(G) -> set[tuple[int, int]]:
    return {(min(u, v), max(u, v)) for u, v in G.edges()}


def test_set_ops_gnm():
    A = nx.gnm_random_graph(60, 150, seed=3)
    B = nx.gnm_random_graph(60, 150, seed=7)
    ea, eb = _canon_edges(A), _canon_edges(B)
    assert _pairs(ds_to_table(graph_union(_ds(A), _ds(B)))) == ea | eb
    assert _pairs(ds_to_table(graph_intersection(_ds(A), _ds(B)))) == ea & eb
    assert _pairs(ds_to_table(graph_difference(_ds(A), _ds(B)))) == ea - eb
    # nx twins on the shared node set
    assert _pairs(
        ds_to_table(graph_intersection(_ds(A), _ds(B)))
    ) == _canon_edges(nx.intersection(A, B))
    assert _pairs(
        ds_to_table(graph_difference(_ds(A), _ds(B)))
    ) == _canon_edges(nx.difference(A, B))


def test_set_ops_collapse_parallel_and_orientation():
    # (1,2) appears reversed and duplicated in A; still a single pair
    A = ray.data.from_arrow(
        pa.table({"src": pa.array([1, 2, 2]), "dst": pa.array([2, 1, 3])})
    )
    B = ray.data.from_arrow(
        pa.table({"src": pa.array([2]), "dst": pa.array([1])})
    )
    assert _pairs(ds_to_table(graph_union(A, B))) == {(1, 2), (2, 3)}
    assert _pairs(ds_to_table(graph_intersection(A, B))) == {(1, 2)}
    assert _pairs(ds_to_table(graph_difference(A, B))) == {(2, 3)}
    assert _pairs(ds_to_table(graph_difference(B, A))) == set()


def test_quotient_graph_modes():
    import numpy as np

    from igraph_ray.stages.graph_ops import quotient_graph

    rng = np.random.default_rng(19)
    n, m = 40, 200
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    w = rng.integers(1, 5, m).astype(np.float64)
    comm = rng.integers(0, 6, n).astype(np.int64)
    edges = ray.data.from_arrow(
        pa.table(
            {"src": pa.array(src), "dst": pa.array(dst),
             "weight": pa.array(w)}
        )
    ).repartition(4)
    assign = ray.data.from_arrow(
        pa.table(
            {"vid": pa.array(np.arange(n, dtype=np.int64)),
             "comm": pa.array(comm)}
        )
    ).repartition(3)

    def collect(ds):
        t = ds_to_table(ds)
        return {
            (cs, cd): (wt, ne)
            for cs, cd, wt, ne in zip(
                t.column("c_src").to_pylist(),
                t.column("c_dst").to_pylist(),
                t.column("weight").to_pylist(),
                t.column("n_edges").to_pylist(),
            )
        }

    got_b = collect(quotient_graph(edges, assign, mode="broadcast"))
    got_j = collect(quotient_graph(edges, assign, mode="join"))
    want = {}
    for s, d, ww in zip(src, dst, w):
        k = (comm[s], comm[d])
        cur = want.get(k, (0.0, 0))
        want[k] = (cur[0] + ww, cur[1] + 1)
    want = {k: (v[0], v[1]) for k, v in want.items()}
    assert got_b == want
    assert got_j == want


def test_line_graph_vs_nx():
    import networkx as nx

    from igraph_ray.stages.graph_ops import line_graph

    for seed, n, m in ((3, 30, 70), (9, 40, 120)):
        G = nx.gnm_random_graph(n, m, seed=seed)
        src = [u for u, v in G.edges()]
        dst = [v for u, v in G.edges()]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array(src, pa.int64()),
                    "dst": pa.array(dst, pa.int64()),
                }
            )
        ).repartition(3)
        got = {
            ((r["a_src"], r["a_dst"]), (r["b_src"], r["b_dst"]))
            for r in line_graph(ds).iter_rows()
        }
        want = set()
        for e1, e2 in nx.line_graph(G).edges():
            a, b = tuple(sorted(e1)), tuple(sorted(e2))
            want.add(tuple(sorted([a, b])))
        assert got == want, seed


# ---------------------------------------------------------------------------
# bipartite projection (igraph bipartite_projection multiplicity /
# nx.bipartite.weighted_projected_graph)
# ---------------------------------------------------------------------------
def _bip_ds(edges) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array([f"u{a}" for a, _ in edges], pa.string()),
                "v": pa.array([f"v{b}" for _, b in edges], pa.string()),
            }
        )
    )


def _proj_map(tbl: pa.Table) -> dict[tuple[str, str], int]:
    return dict(
        zip(
            zip(
                tbl.column("src_key").to_pylist(),
                tbl.column("dst_key").to_pylist(),
            ),
            tbl.column("weight").to_pylist(),
        )
    )


def _nx_proj(edges, mode: str) -> dict[tuple[str, str], int]:
    from networkx.algorithms import bipartite as nxb

    G = nx.Graph()
    us = {f"u{a}" for a, _ in edges}
    vs = {f"v{b}" for _, b in edges}
    G.add_nodes_from(us, bipartite=0)
    G.add_nodes_from(vs, bipartite=1)
    G.add_edges_from((f"u{a}", f"v{b}") for a, b in edges)
    nodes = us if mode == "u" else vs
    P = nxb.weighted_projected_graph(G, nodes)
    return {
        (min(a, b), max(a, b)): d["weight"] for a, b, d in P.edges(data=True)
    }


def test_bipartite_projection_both_modes_vs_nx():
    from igraph_ray.stages.graph_ops import bipartite_projection

    rng = __import__("random").Random(5)
    edges = {(rng.randrange(12), rng.randrange(9)) for _ in range(70)}
    edges = sorted(edges)
    ds = _bip_ds(edges)
    for mode in ("u", "v"):
        got = _proj_map(
            ds_to_table(bipartite_projection(ds, "u", "v", onto=mode))
        )
        assert got == _nx_proj(edges, mode)


def test_bipartite_projection_duplicate_incidence_and_cap():
    from igraph_ray.stages.graph_ops import bipartite_projection

    # duplicated (u,v) rows must not inflate multiplicity
    edges = [(0, 0), (1, 0), (0, 0), (2, 0), (0, 1), (1, 1)]
    ds = _bip_ds(edges)
    got = _proj_map(ds_to_table(bipartite_projection(ds, "u", "v")))
    assert got == _nx_proj(set(edges), "u")
    # fanout_cap drops the degree-3 key v0 entirely; only v1's pair stays
    capped = _proj_map(
        ds_to_table(bipartite_projection(ds, "u", "v", fanout_cap=2))
    )
    assert capped == {("u0", "u1"): 1}


def test_bipartite_projection_integer_members():
    # member column type must flow through to src_key/dst_key
    # (ADVICE r3: was hard-coded pa.string() → ArrowTypeError on ints)
    from igraph_ray.stages.graph_ops import bipartite_projection

    edges = [(0, 0), (1, 0), (2, 0), (0, 1), (1, 1)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array([a for a, _ in edges], pa.int64()),
                "v": pa.array([f"v{b}" for _, b in edges], pa.string()),
            }
        )
    )
    tbl = ds_to_table(bipartite_projection(ds, "u", "v", onto="u"))
    assert tbl.column("src_key").type == pa.int64()
    got = _proj_map(tbl)
    assert got == {(0, 1): 2, (0, 2): 1, (1, 2): 1}
