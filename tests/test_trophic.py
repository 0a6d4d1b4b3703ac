"""Trophic levels vs a dense (I−P)s=1 solve (the networkx reference
solves the same system; nx.trophic_levels itself needs scipy, which is
absent — the dense replay below is the exact same linear algebra)."""

from __future__ import annotations

import tempfile

import networkx as nx
import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.api import build_graph
from igraph_ray.kernels.trophic import trophic_levels


def _dense_oracle(G) -> dict[int, float]:
    nodes = sorted(G.nodes())
    pos = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    a = np.zeros((n, n))
    for u, v, d in G.edges(data=True):
        a[pos[v], pos[u]] += d.get("weight", 1.0)
    rowsum = a.sum(axis=1)
    p = np.divide(a, rowsum[:, None], where=rowsum[:, None] > 0)
    p[rowsum == 0] = 0.0
    s = np.linalg.solve(np.eye(n) - p, np.ones(n))
    return {v: float(s[pos[v]]) for v in nodes}


def _run(G) -> dict[int, float]:
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    w = [d.get("weight", 1.0) for _, _, d in G.edges(data=True)]
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "weight": pa.array(w, pa.float64()),
            }
        )
    )
    verts = ray.data.from_arrow(
        pa.table({"vid": pa.array(sorted(G.nodes()), pa.int64())})
    )
    graph = build_graph(
        edges,
        tempfile.mkdtemp(prefix="igr_troph_"),
        num_parts=3,
        vertices=verts,
        symmetrize=False,
    )
    out = pa.concat_tables(
        trophic_levels(graph, G.number_of_nodes()).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return dict(
        zip(out.column("vid").to_pylist(), out.column("level").to_pylist())
    )


def test_trophic_chain_and_tree():
    chain = nx.path_graph(6, create_using=nx.DiGraph)
    got = _run(chain)
    assert got == {i: float(i + 1) for i in range(6)}

    tree = nx.DiGraph([(0, 2), (1, 2), (2, 3), (1, 3)])
    got = _run(tree)
    want = _dense_oracle(tree)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-8


def test_trophic_random_dag_weighted():
    rng = np.random.default_rng(7)
    G = nx.DiGraph()
    G.add_nodes_from(range(40))
    for _ in range(160):
        u, v = sorted(rng.integers(0, 40, size=2))
        if u != v:
            G.add_edge(int(u), int(v), weight=float(rng.integers(1, 5)))
    want = _dense_oracle(G)
    got = _run(G)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-8


def test_trophic_basal_fed_cycle_converges():
    # 0 (basal) feeds a 3-cycle: defined per nx (all reachable), needs
    # the geometric (non-DAG) convergence path
    G = nx.DiGraph([(0, 1), (1, 2), (2, 3), (3, 1)])
    want = _dense_oracle(G)
    got = _run(G)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-7
