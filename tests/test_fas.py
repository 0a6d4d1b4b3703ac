"""Feedback arc set (Eades-Lin-Smyth) — acyclicity + bound oracles."""

import networkx as nx
import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.fas import feedback_arc_set
from tests.util import ds_to_table


def _arcs(G):
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


def _fas_set(G):
    order, fas = feedback_arc_set(_arcs(G))
    ft = ds_to_table(fas)
    return (
        set(zip(ft.column("src").to_pylist(), ft.column("dst").to_pylist())),
        order,
    )


def test_fas_makes_acyclic_and_bounded():
    for seed, p in ((4, 0.08), (9, 0.15), (13, 0.05)):
        G = nx.gnp_random_graph(80, p, seed=seed, directed=True)
        fset, order = _fas_set(G)
        H = G.copy()
        H.remove_edges_from(fset)
        assert nx.is_directed_acyclic_graph(H), seed
        # removing any FAS of a digraph needs >= #2-cycles arcs; ELS
        # guarantees at most m/2 overall
        assert len(fset) <= G.number_of_edges() / 2, seed
        # order covers every vertex exactly once
        ot = order.to_pylist()
        assert len({r["vid"] for r in ot}) == G.number_of_nodes()
        assert sorted(r["pos"] for r in ot) == list(
            range(G.number_of_nodes())
        )


def test_fas_dag_is_empty():
    D = nx.gnp_random_graph(50, 0.2, seed=3, directed=True)
    D = nx.DiGraph((u, v) for u, v in D.edges() if u < v)
    fset, _ = _fas_set(D)
    assert fset == set()


def test_fas_single_cycle_and_self_loop():
    G = nx.cycle_graph(10, create_using=nx.DiGraph)
    fset, _ = _fas_set(G)
    assert len(fset) == 1
    G.add_edge(3, 3)
    fset, _ = _fas_set(G)
    assert (3, 3) in fset and len(fset) == 2
