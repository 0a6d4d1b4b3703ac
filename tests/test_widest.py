"""Widest (maximum-bottleneck) path oracle tests.

Exact oracle: capacity(s→v) = max weight w such that v is reachable
from s in the subgraph of edges with weight ≥ w (threshold sweep over
the distinct weights — definitionally equivalent to max-over-paths of
min edge weight)."""

import math

import networkx as nx
import numpy as np

from igraph_ray.api import build_graph, edges_dataset
from igraph_ray.kernels.widest import widest_paths
from tests.util import state_dict


def _capacity_oracle(G, sources) -> dict:
    cap = {v: -math.inf for v in G.nodes()}
    for s in sources:
        cap[s] = math.inf
    for w in sorted({d["weight"] for _, _, d in G.edges(data=True)}, reverse=True):
        H = nx.Graph(
            (u, v) for u, v, d in G.edges(data=True) if d["weight"] >= w
        )
        for s in sources:
            if s not in H:
                continue
            for v in nx.node_connected_component(H, s):
                cap[v] = max(cap[v], w)
    return cap


def _build(G, tmp):
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    w = [G[u][v]["weight"] for u, v in G.edges()]
    return build_graph(
        edges_dataset(src, dst, weight=w),
        str(tmp),
        num_parts=3,
        symmetrize=True,
    )


def test_widest_gnm(tmp_graph_dir):
    rng = np.random.default_rng(4)
    G = nx.gnm_random_graph(100, 250, seed=9)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.integers(1, 8))
    g = _build(G, tmp_graph_dir)
    run = widest_paths(g, [0])
    width = state_dict(run.state, "width")
    ref = _capacity_oracle(G, [0])
    for v in G.nodes():
        assert width[v] == ref[v], (v, width[v], ref[v])


def test_widest_multi_source(tmp_graph_dir):
    rng = np.random.default_rng(12)
    G = nx.gnm_random_graph(80, 130, seed=2)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.integers(1, 5))
    g = _build(G, tmp_graph_dir)
    sources = [0, 41]
    run = widest_paths(g, sources)
    width = state_dict(run.state, "width")
    ref = _capacity_oracle(G, sources)
    for v in G.nodes():
        if v in width:
            assert width[v] == ref[v], v
        else:  # isolated vertices are absent from the edge table
            assert G.degree(v) == 0 and v not in sources


def test_widest_path_graph(tmp_graph_dir):
    # bottleneck on a path is the min edge on the unique route
    G = nx.Graph()
    ws = [5.0, 2.0, 7.0, 3.0]
    for i, w in enumerate(ws):
        G.add_edge(i, i + 1, weight=w)
    g = _build(G, tmp_graph_dir)
    width = state_dict(widest_paths(g, [0]).state, "width")
    assert width[0] == math.inf
    assert [width[i] for i in range(1, 5)] == [5.0, 2.0, 2.0, 2.0]
