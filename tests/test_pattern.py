"""Subgraph pattern matching vs the networkx GraphMatcher oracle
(igraph ``count_subisomorphisms_vf2`` surface)."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray.data
from networkx.algorithms import isomorphism as iso

from igraph_ray.kernels.pattern import (
    count_subgraph_matches,
    subgraph_embeddings,
)

PATTERNS = {
    "triangle": [(0, 1), (1, 2), (0, 2)],
    "p3": [(0, 1), (1, 2)],
    "p4": [(0, 1), (1, 2), (2, 3)],
    "claw": [(0, 1), (0, 2), (0, 3)],
    "c4": [(0, 1), (1, 2), (2, 3), (3, 0)],
    "diamond": [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)],
    "paw": [(0, 1), (1, 2), (0, 2), (2, 3)],
    "k4": [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)],
}


def _edges_ds(G: nx.Graph) -> ray.data.Dataset:
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )
    )


def _nx_counts(G: nx.Graph, pedges, induced: bool) -> int:
    P = nx.Graph(pedges)
    gm = iso.GraphMatcher(G, P)
    it = (
        gm.subgraph_isomorphisms_iter()
        if induced
        else gm.subgraph_monomorphisms_iter()
    )
    return sum(1 for _ in it)


@pytest.mark.parametrize("name", sorted(PATTERNS))
@pytest.mark.parametrize("induced", [False, True])
def test_counts_match_networkx(ray_session, name, induced):
    G = nx.gnm_random_graph(50, 130, seed=11)
    pe = PATTERNS[name]
    want = _nx_counts(G, pe, induced)
    got = count_subgraph_matches(_edges_ds(G), pe, induced=induced)
    assert got == want


@pytest.mark.parametrize("seed", [3, 9])
def test_counts_second_graph(ray_session, seed):
    G = nx.gnm_random_graph(40, 90, seed=seed)
    for name in ("p4", "diamond", "claw"):
        pe = PATTERNS[name]
        assert count_subgraph_matches(_edges_ds(G), pe) == _nx_counts(
            G, pe, False
        )


def test_join_close_mode_equals_broadcast(ray_session):
    G = nx.gnm_random_graph(40, 100, seed=5)
    ds = _edges_ds(G)
    pe = PATTERNS["diamond"]
    a = count_subgraph_matches(ds, pe, close_mode="broadcast")
    b = count_subgraph_matches(ds, pe, close_mode="join")
    assert a == b == _nx_counts(G, pe, False)
    ai = count_subgraph_matches(
        ds, pe, induced=True, close_mode="broadcast"
    )
    bi = count_subgraph_matches(ds, pe, induced=True, close_mode="join")
    assert ai == bi == _nx_counts(G, pe, True)


def test_embeddings_are_valid_mappings(ray_session):
    G = nx.gnm_random_graph(30, 60, seed=2)
    pe = PATTERNS["c4"]
    emb = subgraph_embeddings(_edges_ds(G), pe)
    tbl = pa.concat_tables(
        emb.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    cols = [
        tbl.column(f"m{i}").to_numpy(zero_copy_only=False)
        for i in range(4)
    ]
    m = np.stack(cols, axis=1)
    # rows unique (each mapping once)
    assert len(np.unique(m, axis=0)) == len(m)
    for row in m:
        assert len(set(row.tolist())) == 4  # injective
        for a, b in pe:
            assert G.has_edge(int(row[a]), int(row[b]))


def test_triangle_mono_is_six_times_triangles(ray_session):
    G = nx.gnm_random_graph(60, 180, seed=13)
    n_tri = sum(nx.triangles(G).values()) // 3
    got = count_subgraph_matches(_edges_ds(G), PATTERNS["triangle"])
    assert got == 6 * n_tri


def test_disconnected_pattern_raises(ray_session):
    with pytest.raises(ValueError):
        count_subgraph_matches(
            _edges_ds(nx.path_graph(5)), [(0, 1), (2, 3)]
        )


def test_self_loop_pattern_raises(ray_session):
    with pytest.raises(ValueError):
        count_subgraph_matches(_edges_ds(nx.path_graph(5)), [(0, 0)])


def test_no_match_zero(ray_session):
    # star graph has no triangle
    G = nx.star_graph(6)
    assert (
        count_subgraph_matches(_edges_ds(G), PATTERNS["triangle"]) == 0
    )
