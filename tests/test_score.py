"""Weighted s-core (kernels/kcore.py::s_core_numbers) vs the
sequential generalized-core peeling oracle (Batagelj-Zaveršnik), plus
the unit-weight identity s-core == k-core."""

import networkx as nx
import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.api import build_graph, state_to_table
from igraph_ray.kernels.kcore import core_numbers, s_core_numbers
from tests.util import graph_from_nx


def _peel_oracle(G, weight="weight"):
    """core(v) = running max of the min current strength at removal."""
    S = {
        v: float(sum(d.get(weight, 1.0) for _, _, d in G.edges(v, data=True)))
        for v in G.nodes()
    }
    remaining = set(G.nodes())
    core, cur = {}, 0.0
    while remaining:
        v = min(remaining, key=lambda x: (S[x], x))
        cur = max(cur, S[v])
        core[v] = cur
        remaining.remove(v)
        for u in G.neighbors(v):
            if u in remaining:
                S[u] -= float(G[v][u].get(weight, 1.0))
    return core


def _weighted_graph(G, tmp_dir, parts=3):
    src, dst, w = [], [], []
    for u, v, d in G.edges(data=True):
        src.append(u)
        dst.append(v)
        w.append(float(d["weight"]))
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "weight": pa.array(w, pa.float64()),
            }
        )
    )
    vertices = ray.data.from_arrow(
        pa.table({"vid": pa.array(sorted(G.nodes()), pa.int64())})
    )
    return build_graph(
        edges, tmp_dir, num_parts=parts, symmetrize=True, vertices=vertices
    )


def _ours(graph):
    run = s_core_numbers(graph)
    tbl = state_to_table(run.state, ["vid", "core"])
    return dict(
        zip(tbl.column("vid").to_pylist(), tbl.column("core").to_pylist())
    )


def test_score_int_weights_gnm(tmp_graph_dir):
    rng = np.random.default_rng(3)
    G = nx.gnm_random_graph(80, 220, seed=21)
    for u, v in G.edges():
        G[u][v]["weight"] = int(rng.integers(1, 7))
    got = _ours(_weighted_graph(G, tmp_graph_dir, parts=4))
    exp = _peel_oracle(G)
    assert got.keys() == exp.keys()
    for v in exp:
        assert got[v] == exp[v], (v, got[v], exp[v])


def test_score_unit_weights_equals_kcore(tmp_graph_dir):
    G = nx.gnm_random_graph(100, 260, seed=5)
    for u, v in G.edges():
        G[u][v]["weight"] = 1
    graph = _weighted_graph(G, tmp_graph_dir)
    got = _ours(graph)
    kc = nx.core_number(G)
    for v in kc:
        assert got[v] == float(kc[v]), (v, got[v], kc[v])


def test_score_star_and_isolated(tmp_graph_dir):
    # hub with 4 spokes of weight 3: spokes peel at strength 3; the
    # hub then has no support left -> every vertex cores at 3
    G = nx.star_graph(4)
    for u, v in G.edges():
        G[u][v]["weight"] = 3
    G.add_node(99)  # isolated -> core 0
    got = _ours(_weighted_graph(G, tmp_graph_dir))
    exp = _peel_oracle(G)
    assert got == exp
    assert got[99] == 0.0 and got[0] == 3.0


def test_score_float_weights(tmp_graph_dir):
    rng = np.random.default_rng(8)
    G = nx.gnm_random_graph(40, 90, seed=2)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.integers(1, 20)) / 4.0
    got = _ours(_weighted_graph(G, tmp_graph_dir))
    exp = _peel_oracle(G)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-12, (v, got[v], exp[v])
