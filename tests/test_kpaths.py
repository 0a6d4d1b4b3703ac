"""Yen k-shortest simple paths vs nx.shortest_simple_paths."""

import itertools

import networkx as nx
import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.kpaths import k_shortest_paths


def _arcs_ds(G):
    rows = {"src": [], "dst": [], "weight": []}
    for u, v, data in G.edges(data=True):
        for a, b in ((u, v), (v, u)):
            rows["src"].append(a)
            rows["dst"].append(b)
            rows["weight"].append(float(data.get("weight", 1.0)))
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(rows["src"], pa.int64()),
                "dst": pa.array(rows["dst"], pa.int64()),
                "weight": pa.array(rows["weight"], pa.float64()),
            }
        )
    )


def test_ksp_unweighted_cost_multiset():
    G = nx.gnm_random_graph(25, 60, seed=6)
    got = k_shortest_paths(_arcs_ds(G), 0, 20, k=5).to_pylist()
    want = list(itertools.islice(nx.shortest_simple_paths(G, 0, 20), 5))
    assert [r["cost"] for r in got] == [float(len(p) - 1) for p in want]
    for r in got:  # each returned path is simple and valid
        p = r["path"]
        assert len(set(p)) == len(p) and p[0] == 0 and p[-1] == 20
        assert all(G.has_edge(a, b) for a, b in zip(p, p[1:]))


def test_ksp_weighted_exact_paths():
    G = nx.gnm_random_graph(25, 60, seed=6)
    rng = np.random.default_rng(4)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.integers(1, 100)) + rng.random() * 1e-3
    got = k_shortest_paths(
        _arcs_ds(G), 0, 20, k=5, weighted=True
    ).to_pylist()
    want = list(
        itertools.islice(
            nx.shortest_simple_paths(G, 0, 20, weight="weight"), 5
        )
    )
    assert [tuple(r["path"]) for r in got] == [tuple(p) for p in want]


def test_ksp_disconnected_and_exhausted():
    H = nx.Graph()
    H.add_edge(0, 1)
    H.add_node(5)
    assert k_shortest_paths(_arcs_ds(H), 0, 5, k=3).num_rows == 0
    # path graph has exactly one simple path between its ends
    P = nx.path_graph(4)
    out = k_shortest_paths(_arcs_ds(P), 0, 3, k=5)
    assert out.num_rows == 1 and out.to_pylist()[0]["path"] == [0, 1, 2, 3]
