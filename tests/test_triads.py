"""Dyad/triad census + cocitation vs networkx oracles
(nx.triadic_census implements the same Batagelj-Mrvar MAN
classification as igraph_triad_census)."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.kernels.triads import (
    TRICODE_TYPE,
    cocitation_counts,
    dyad_census,
    triad_census,
)
from tests.util import ds_to_table


def _arcs_ds(G: nx.DiGraph) -> ray.data.Dataset:
    src = np.array([u for u, v in G.edges()], np.int64)
    dst = np.array([v for u, v in G.edges()], np.int64)
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    )


def test_tricode_table_matches_nx():
    # bit 1=x->y 2=y->x 4=x->z 8=z->x 16=y->z 32=z->y over triple (0,1,2)
    for code in range(64):
        G = nx.DiGraph()
        G.add_nodes_from([0, 1, 2])
        for bit, (u, v) in enumerate(
            [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)]
        ):
            if code & (1 << bit):
                G.add_edge(u, v)
        cens = nx.triadic_census(G)
        want = next(
            (t for t, n in cens.items() if n == 1 and t != "003"), "003"
        )
        assert TRICODE_TYPE[code] == want, code


def _census_dict(tbl: pa.Table) -> dict[str, int]:
    return dict(
        zip(tbl.column("triad_type").to_pylist(), tbl.column("n").to_pylist())
    )


@pytest.mark.parametrize("seed,p", [(3, 0.06), (11, 0.12)])
def test_triad_census_random(seed, p):
    G = nx.gnp_random_graph(40, p, seed=seed, directed=True)
    G.add_nodes_from(range(40, 44))  # isolated vertices count via n
    got = _census_dict(triad_census(_arcs_ds(G), G.number_of_nodes()))
    assert got == dict(nx.triadic_census(G))


def test_triad_census_textbook():
    # mutual dyad + cycle + transitive triple + out/in stars, dup arcs
    G = nx.DiGraph(
        [
            (0, 1), (1, 0),          # mutual
            (2, 3), (3, 4), (4, 2),  # 3-cycle
            (5, 6), (5, 7), (6, 7),  # transitive
            (8, 9), (8, 10),         # out-star
            (0, 1),                  # duplicate arc (collapsed)
        ]
    )
    got = _census_dict(triad_census(_arcs_ds(G), G.number_of_nodes()))
    want = dict(nx.triadic_census(G))
    assert got == want
    assert sum(got.values()) == 11 * 10 * 9 // 6


def test_dyad_census():
    G = nx.gnp_random_graph(30, 0.15, seed=5, directed=True)
    tbl = dyad_census(_arcs_ds(G), G.number_of_nodes())
    got = dict(zip(tbl.column("dyad_type").to_pylist(), tbl.column("n").to_pylist()))
    mut = sum(1 for u, v in G.edges() if u < v and G.has_edge(v, u))
    asym = G.number_of_edges() - 2 * mut
    n = G.number_of_nodes()
    assert got == {
        "mut": mut,
        "asym": asym,
        "null": n * (n - 1) // 2 - mut - asym,
    }


def _pair_dict(ds) -> dict[tuple[int, int], int]:
    t = ds_to_table(ds)
    return dict(
        zip(
            zip(t.column("a").to_pylist(), t.column("b").to_pylist()),
            t.column("common").to_pylist(),
        )
    )


def test_cocitation_and_bibcoupling():
    G = nx.gnp_random_graph(35, 0.1, seed=9, directed=True)
    coc = _pair_dict(cocitation_counts(_arcs_ds(G), mode="cocitation"))
    bib = _pair_dict(cocitation_counts(_arcs_ds(G), mode="bibcoupling"))
    nodes = sorted(G.nodes())
    want_c, want_b = {}, {}
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            c = len(set(G.predecessors(u)) & set(G.predecessors(v)))
            b = len(set(G.successors(u)) & set(G.successors(v)))
            if c:
                want_c[(u, v)] = c
            if b:
                want_b[(u, v)] = b
    assert coc == want_c
    assert bib == want_b
