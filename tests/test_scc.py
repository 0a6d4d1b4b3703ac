"""Strongly connected components vs networkx (min-vid canonical)."""

import networkx as nx
import numpy as np

from igraph_ray.kernels.scc import scc
from tests.util import ds_to_table, nx_edge_arrays


def _scc_oracle(G):
    out = {}
    for comp in nx.strongly_connected_components(G):
        m = min(comp)
        for v in comp:
            out[v] = m
    return out


def _ours(edges_ds, graph_dir, vertices=None):
    state = scc(edges_ds, graph_dir, vertices=vertices)
    t = ds_to_table(state)
    return dict(zip(t.column("vid").to_pylist(), t.column("scc").to_pylist()))


def test_scc_cycles_and_dag(tmp_graph_dir):
    from igraph_ray.api import edges_dataset

    # two 3-cycles bridged by one arc + a dangling tail
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3), (5, 6)]
    G = nx.DiGraph(edges)
    got = _ours(
        edges_dataset([u for u, v in edges], [v for u, v in edges]),
        tmp_graph_dir,
    )
    assert got == _scc_oracle(G)


def test_scc_random_digraph(tmp_graph_dir):
    import pyarrow as pa
    import ray.data

    from igraph_ray.api import edges_dataset

    G = nx.gnp_random_graph(80, 0.05, seed=23, directed=True)
    src, dst = nx_edge_arrays(G)
    vds = ray.data.from_arrow(
        pa.table({"vid": pa.array(sorted(G.nodes()), pa.int64())})
    )
    got = _ours(edges_dataset(src, dst), tmp_graph_dir, vertices=vds)
    assert got == _scc_oracle(G)


def test_scc_all_singletons(tmp_graph_dir):
    from igraph_ray.api import edges_dataset

    # a directed path: every vertex its own SCC (worst-case peeling)
    n = 5
    got = _ours(
        edges_dataset(list(range(n - 1)), list(range(1, n))), tmp_graph_dir
    )
    assert got == {v: v for v in range(n)}
