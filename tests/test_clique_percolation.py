"""K-clique percolation communities vs nx.community.k_clique_communities
(exact overlapping community sets)."""

import networkx as nx
import pyarrow as pa
import ray.data

from igraph_ray.kernels.clique_percolation import k_clique_communities
from tests.util import ds_to_table, nx_edge_arrays


def _pairs_ds(G, parts=3) -> ray.data.Dataset:
    src, dst = nx_edge_arrays(G)
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).repartition(parts)


def _communities(ds_out) -> set[frozenset]:
    t = ds_to_table(ds_out)
    by_label: dict[int, set] = {}
    for v, c in zip(
        t.column("vid").to_pylist(), t.column("community").to_pylist()
    ):
        by_label.setdefault(c, set()).add(v)
    return {frozenset(s) for s in by_label.values()}


def _check(G, k, tmp_graph_dir, parts=3):
    got = _communities(
        k_clique_communities(_pairs_ds(G, parts), k, tmp_graph_dir)
    )
    want = {
        frozenset(c) for c in nx.community.k_clique_communities(G, k)
    }
    assert got == want


def test_cpm_two_overlapping_triangles(tmp_graph_dir):
    # triangles 0-1-2 and 1-2-3 share edge (1,2) → one community at k=3
    G = nx.Graph([(0, 1), (1, 2), (0, 2), (1, 3), (2, 3), (3, 4)])
    _check(G, 3, tmp_graph_dir, parts=1)


def test_cpm_gnp_k3(tmp_graph_dir):
    G = nx.gnp_random_graph(45, 0.14, seed=8)
    _check(G, 3, tmp_graph_dir)


def test_cpm_gnp_k4(tmp_graph_dir):
    G = nx.gnp_random_graph(40, 0.25, seed=21)
    _check(G, 4, tmp_graph_dir)


def test_cpm_disjoint_cliques(tmp_graph_dir):
    # two disjoint 4-cliques: separate communities at k=3 AND k=4
    G = nx.disjoint_union(nx.complete_graph(4), nx.complete_graph(4))
    got = _communities(
        k_clique_communities(_pairs_ds(G, 2), 4, tmp_graph_dir)
    )
    assert got == {frozenset({0, 1, 2, 3}), frozenset({4, 5, 6, 7})}


def test_cpm_no_cliques_empty(tmp_graph_dir):
    G = nx.path_graph(6)  # no triangles
    got = _communities(
        k_clique_communities(_pairs_ds(G, 2), 3, tmp_graph_dir)
    )
    assert got == set()
