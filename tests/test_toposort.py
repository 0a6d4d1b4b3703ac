"""Topological layers (igraph_topological_sorting parity as layering),
SCC condensation composition, and distance statistics (hop histogram /
global efficiency / Wiener index) vs networkx."""

import math

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.api import edges_dataset
from igraph_ray.kernels.multibfs import (
    distance_histogram,
    global_efficiency,
    wiener_index,
)
from igraph_ray.kernels.toposort import (
    condensation_arcs,
    topological_layers,
)
from tests.util import ds_to_table, graph_from_nx, nx_edge_arrays


def _nx_layers(G):
    """layer(v) = longest directed path ending at v (DP in topo order)."""
    layer = {v: 0 for v in G.nodes()}
    for v in nx.topological_sort(G):
        for u in G.predecessors(v):
            layer[v] = max(layer[v], layer[u] + 1)
    return layer


def _layers_dict(ds):
    tbl = ds_to_table(ds)
    return dict(
        zip(tbl.column("vid").to_pylist(), tbl.column("layer").to_pylist())
    )


def test_topological_layers_random_dag(tmp_graph_dir):
    G = nx.gnp_random_graph(90, 0.06, seed=7, directed=True)
    dag = nx.DiGraph((u, v) for u, v in G.edges() if u < v)
    dag.add_nodes_from(G.nodes())
    g = graph_from_nx(dag, tmp_graph_dir, num_parts=4, symmetrize=False)
    assert _layers_dict(topological_layers(g)) == _nx_layers(dag)


def test_topological_layers_chain_and_isolated(tmp_graph_dir):
    # a long chain exercises one superstep per layer
    n = 40
    dag = nx.DiGraph((i, i + 1) for i in range(n - 1))
    dag.add_node(n)  # isolated
    g = graph_from_nx(dag, tmp_graph_dir, num_parts=3, symmetrize=False)
    got = _layers_dict(topological_layers(g))
    assert got == {**{i: i for i in range(n)}, n: 0}


def test_topological_layers_cycle_raises(tmp_graph_dir):
    cyc = nx.DiGraph([(0, 1), (1, 2), (2, 0), (2, 3)])
    g = graph_from_nx(cyc, tmp_graph_dir, num_parts=2, symmetrize=False)
    with pytest.raises(ValueError, match="cycle"):
        topological_layers(g)


def test_condensation_layers_match_nx(tmp_graph_dir, tmp_path):
    from igraph_ray.kernels.scc import scc

    G = nx.gnp_random_graph(70, 0.05, seed=13, directed=True)
    src, dst = nx_edge_arrays(G)
    arcs = edges_dataset(src, dst)
    vds = ray.data.from_arrow(
        pa.table({"vid": pa.array(sorted(G.nodes()), pa.int64())})
    )
    state = scc(arcs, str(tmp_path / "sccg"), vertices=vds)
    cond = condensation_arcs(arcs, state)

    # condensed vertex set = distinct scc labels (min-vid per SCC)
    sccs = ds_to_table(state)
    labels = sorted(set(sccs.column("scc").to_pylist()))
    from igraph_ray.api import build_graph

    cond_vds = ray.data.from_arrow(
        pa.table({"vid": pa.array(labels, pa.int64())})
    )
    cg = build_graph(
        cond,
        str(tmp_path / "condg"),
        num_parts=2,
        symmetrize=False,
        vertices=cond_vds,
    )
    got = _layers_dict(topological_layers(cg))

    # nx oracle: condensation relabeled by min member vid
    C = nx.condensation(G)
    relabel = {c: min(C.nodes[c]["members"]) for c in C.nodes()}
    want = {relabel[c]: l for c, l in _nx_layers(C).items()}
    assert got == want


def _hist_dict(g, pivots):
    tbl = ds_to_table(distance_histogram(g, pivots))
    return dict(
        zip(tbl.column("dist").to_pylist(), tbl.column("pairs").to_pylist())
    )


def test_distance_stats_connected(tmp_graph_dir):
    G = nx.gnm_random_graph(60, 150, seed=1)
    assert nx.is_connected(G)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    vids = np.array(sorted(G.nodes()), np.int64)

    want = {}
    for _, lengths in nx.all_pairs_shortest_path_length(G):
        for d in lengths.values():
            if d > 0:
                want[d] = want.get(d, 0) + 1
    assert _hist_dict(g, vids) == want

    n = G.number_of_nodes()
    assert global_efficiency(g, n, vids) == pytest.approx(
        nx.global_efficiency(G), abs=1e-12
    )
    assert wiener_index(g, n, vids) == pytest.approx(
        nx.wiener_index(G), abs=0
    )


def test_distance_stats_disconnected(tmp_graph_dir):
    G = nx.gnm_random_graph(40, 45, seed=11)
    G.add_node(99)  # force disconnection
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    vids = np.array(sorted(G.nodes()), np.int64)
    n = G.number_of_nodes()
    assert global_efficiency(g, n, vids) == pytest.approx(
        nx.global_efficiency(G), abs=1e-12
    )
    assert math.isinf(wiener_index(g, n, vids))
