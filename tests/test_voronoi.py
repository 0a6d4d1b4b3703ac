"""Voronoi cells (kernels/voronoi.py) vs a networkx BFS/Dijkstra
oracle: cell = argmin over generators of (dist, generator vid)."""

import networkx as nx
import numpy as np
import pytest

from igraph_ray.api import state_to_table
from igraph_ray.kernels.voronoi import voronoi_cells
from tests.util import graph_from_nx


def _oracle(G, seeds, weight=None):
    """(dist, cell) per vertex: lexicographic min over seeds."""
    best = {v: (float("inf"), -1) for v in G.nodes()}
    for s in sorted(seeds):
        if weight is None:
            dist = nx.single_source_shortest_path_length(G, s)
        else:
            dist = nx.single_source_dijkstra_path_length(
                G, s, weight=weight
            )
        for v, d in dist.items():
            if (float(d), s) < best[v]:
                best[v] = (float(d), s)
    return best


def _ours(graph, seeds, weighted=False):
    run = voronoi_cells(graph, seeds, weighted=weighted)
    tbl = state_to_table(run.state, ["vid", "dist", "cell"])
    return {
        v: (d, c)
        for v, d, c in zip(
            tbl.column("vid").to_pylist(),
            tbl.column("dist").to_pylist(),
            tbl.column("cell").to_pylist(),
        )
    }


def _check(G, seeds, tmp_graph_dir, parts=3):
    graph = graph_from_nx(G, tmp_graph_dir, num_parts=parts)
    got = _ours(graph, seeds)
    exp = _oracle(G, seeds)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == exp[v], (v, got[v], exp[v])


def test_voronoi_path_graph(tmp_graph_dir):
    # two seeds at the ends: the midpoint tie goes to the smaller vid
    _check(nx.path_graph(9), [0, 8], tmp_graph_dir)


def test_voronoi_gnm(tmp_graph_dir):
    G = nx.gnm_random_graph(120, 300, seed=9)
    _check(G, [3, 50, 99], tmp_graph_dir, parts=4)


def test_voronoi_unreachable_component(tmp_graph_dir):
    G = nx.union(nx.path_graph(5), nx.relabel_nodes(nx.path_graph(4), {i: i + 10 for i in range(4)}))
    graph = graph_from_nx(G, tmp_graph_dir)
    got = _ours(graph, [0])
    assert got[12] == (float("inf"), -1)
    assert got[4] == (4.0, 0)


def test_voronoi_tie_breaks_to_smallest_seed(tmp_graph_dir):
    # star: every leaf is at distance 1 from the centre seed set {1, 2}
    G = nx.star_graph(6)  # centre 0, leaves 1..6
    graph = graph_from_nx(G, tmp_graph_dir)
    got = _ours(graph, [1, 2])
    # leaves 3..6 are at distance 2 from both seeds -> cell 1
    for leaf in (3, 4, 5, 6):
        assert got[leaf] == (2.0, 1)
    assert got[0] == (1.0, 1)
    assert got[1] == (0.0, 1) and got[2] == (0.0, 2)


def test_voronoi_weighted(tmp_graph_dir):
    rng = np.random.default_rng(4)
    G = nx.gnm_random_graph(60, 150, seed=12)
    for u, v in G.edges():
        G[u][v]["weight"] = int(rng.integers(1, 9))
    src, dst, w = [], [], []
    for u, v, d in G.edges(data=True):
        src.append(u)
        dst.append(v)
        w.append(float(d["weight"]))
    import pyarrow as pa
    import ray.data

    from igraph_ray.api import build_graph

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
    graph = build_graph(
        edges, tmp_graph_dir, num_parts=3, symmetrize=True, vertices=vertices
    )
    got = _ours(graph, [0, 30], weighted=True)
    exp = _oracle(G, [0, 30], weight="weight")
    for v in exp:
        assert got[v] == exp[v], (v, got[v], exp[v])


def test_voronoi_requires_generators(tmp_graph_dir):
    G = nx.path_graph(3)
    graph = graph_from_nx(G, tmp_graph_dir)
    with pytest.raises(ValueError):
        voronoi_cells(graph, [])
