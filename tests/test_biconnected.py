"""Biconnected components / articulation points vs the networkx
oracle (nx.biconnected_component_edges / nx.articulation_points)."""

import networkx as nx
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.kernels.biconnected import (
    articulation_points,
    biconnected_edge_labels,
)
from tests.util import ds_to_table, nx_edge_arrays


def _edges_ds(G) -> ray.data.Dataset:
    src, dst = nx_edge_arrays(G)
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    )


def _nx_edge_partition(G) -> set[frozenset]:
    return {
        frozenset(tuple(sorted(e)) for e in comp)
        for comp in nx.biconnected_component_edges(G)
    }


def _partition_of(tbl: pa.Table) -> set[frozenset]:
    by_label: dict[int, set] = {}
    for s, d, c in zip(
        tbl.column("src").to_pylist(),
        tbl.column("dst").to_pylist(),
        tbl.column("bicomp").to_pylist(),
    ):
        by_label.setdefault(c, set()).add((s, d))
    return {frozenset(v) for v in by_label.values()}


def _check_graph(G, tmp, **kw):
    labels = ds_to_table(
        biconnected_edge_labels(_edges_ds(G), graph_dir=str(tmp), **kw)
    )
    assert _partition_of(labels) == _nx_edge_partition(G)
    got = set(
        ds_to_table(articulation_points(labels=ray.data.from_arrow(labels)))
        .column("vid")
        .to_pylist()
    )
    assert got == set(nx.articulation_points(G))
    return labels


@pytest.mark.parametrize("seed,p", [(1, 0.04), (7, 0.08)])
def test_biconnected_random(seed, p, tmp_path):
    G = nx.gnp_random_graph(60, p, seed=seed)
    _check_graph(G, tmp_path)


def test_biconnected_structured(tmp_path):
    # chained cliques (classic articulation ladder) + pendant path +
    # disjoint cycle
    G = nx.Graph()
    for base in (0, 4, 8):
        K = nx.complete_graph(5)
        G.update(nx.relabel_nodes(K, {i: i + base for i in K}))
    G.add_edges_from([(12, 20), (20, 21), (21, 22)])
    G.add_edges_from([(30, 31), (31, 32), (32, 30)])
    _check_graph(G, tmp_path)


def test_biconnected_trivial(tmp_path):
    # single edge: one bicomp, no cut vertex
    G = nx.Graph([(0, 1)])
    labels = _check_graph(G, tmp_path)
    assert _partition_of(labels) == {frozenset({(0, 1)})}


def test_biconnected_distributed_path(tmp_path):
    # force the beyond-bound pipeline (MSF + broadcast passes +
    # distributed aux components) and check it agrees bitwise with the
    # fast path's labels
    G = nx.gnp_random_graph(30, 0.1, seed=3)
    fast = ds_to_table(
        biconnected_edge_labels(_edges_ds(G), graph_dir=str(tmp_path / "f"))
    ).sort_by([("src", "ascending"), ("dst", "ascending")])
    dist = ds_to_table(
        biconnected_edge_labels(
            _edges_ds(G),
            graph_dir=str(tmp_path / "d"),
            single_task_max=0,
        )
    ).sort_by([("src", "ascending"), ("dst", "ascending")])
    assert fast.equals(dist)
    assert _partition_of(dist) == _nx_edge_partition(G)
