"""Witness validators (kernels/validity.py): zero violations on good
witnesses, and — the part that makes the constant-row SQL twins
meaningful — nonzero counts on deliberately corrupted ones."""

import networkx as nx
import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.validity import (
    coloring_validity,
    matching_validity,
    mis_validity,
)
from tests.util import nx_edge_arrays


def _edges_ds(G) -> ray.data.Dataset:
    src, dst = nx_edge_arrays(G)
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    )


def _G():
    return nx.gnp_random_graph(60, 0.08, seed=7)


def test_coloring_validity_good():
    G = _G()
    colors = nx.coloring.greedy_color(G, strategy="largest_first")
    n = G.number_of_nodes()
    arr = np.array([colors[v] for v in range(n)], dtype=np.int64)
    wit = ray.data.from_arrow(
        pa.table(
            {"vid": pa.array(np.arange(n, dtype=np.int64)), "color": pa.array(arr)}
        )
    )
    out = coloring_validity(_edges_ds(G), wit)
    assert out.column("conflicts")[0].as_py() == 0
    assert out.column("contiguous")[0].as_py() is True
    assert out.column("within_bound")[0].as_py() is True


def test_coloring_validity_detects_conflicts():
    G = _G()
    n = G.number_of_nodes()
    # constant coloring: every edge is a conflict, trivially contiguous
    wit = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(np.arange(n, dtype=np.int64)),
                "color": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )
    )
    out = coloring_validity(_edges_ds(G), wit)
    assert out.column("conflicts")[0].as_py() == G.number_of_edges()


def test_coloring_validity_detects_gaps_and_bound():
    G = nx.path_graph(6)
    n = 6
    # colors {0, 5}: proper on a path but non-contiguous and > Δ+1
    arr = np.array([0, 5, 0, 5, 0, 5], dtype=np.int64)
    wit = ray.data.from_arrow(
        pa.table(
            {"vid": pa.array(np.arange(n, dtype=np.int64)), "color": pa.array(arr)}
        )
    )
    out = coloring_validity(_edges_ds(G), wit)
    assert out.column("conflicts")[0].as_py() == 0
    assert out.column("contiguous")[0].as_py() is False


def test_mis_validity_good_and_bad():
    G = _G()
    n = G.number_of_nodes()
    mis = nx.maximal_independent_set(G, seed=3)
    member = np.zeros(n, dtype=np.int8)
    member[list(mis)] = 1
    wit = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(np.arange(n, dtype=np.int64)),
                "in_mis": pa.array(member),
            }
        )
    )
    out = mis_validity(_edges_ds(G), wit, n)
    assert out.column("independence_violations")[0].as_py() == 0
    assert out.column("non_dominated")[0].as_py() == 0

    # everyone in: every edge violates independence
    wit_all = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(np.arange(n, dtype=np.int64)),
                "in_mis": pa.array(np.ones(n, dtype=np.int8)),
            }
        )
    )
    out = mis_validity(_edges_ds(G), wit_all, n)
    assert (
        out.column("independence_violations")[0].as_py()
        == G.number_of_edges()
    )

    # nobody in: every non-isolated vertex is non-dominated
    wit_none = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(np.arange(n, dtype=np.int64)),
                "in_mis": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )
    )
    out = mis_validity(_edges_ds(G), wit_none, n)
    assert out.column("non_dominated")[0].as_py() == n


def test_matching_validity_good_and_bad():
    G = _G()
    n = G.number_of_nodes()
    m = nx.maximal_matching(G)
    ms = np.array([min(e) for e in m], dtype=np.int64)
    md = np.array([max(e) for e in m], dtype=np.int64)
    wit = ray.data.from_arrow(
        pa.table({"src": pa.array(ms), "dst": pa.array(md)})
    )
    out = matching_validity(_edges_ds(G), wit, n)
    assert out.column("overlaps")[0].as_py() == 0
    assert out.column("uncovered_edges")[0].as_py() == 0

    # empty matching: every edge uncovered
    empty = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
            }
        )
    )
    out = matching_validity(_edges_ds(G), empty, n)
    assert out.column("uncovered_edges")[0].as_py() == G.number_of_edges()

    # duplicate endpoint: overlap detected
    e0, e1 = list(G.edges())[:2]
    shared = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e0[0], e0[0]], pa.int64()),
                "dst": pa.array([e0[1], e1[1]], pa.int64()),
            }
        )
    )
    out = matching_validity(_edges_ds(G), shared, n)
    assert out.column("overlaps")[0].as_py() >= 1
