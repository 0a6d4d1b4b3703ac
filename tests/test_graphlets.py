"""Induced 4-graphlet census vs a brute-force 4-subset oracle."""

import itertools

import networkx as nx
import pyarrow as pa
import ray.data

from igraph_ray.kernels.graphlets import graphlet_census4


def _brute(G):
    counts = dict(k4=0, diamond=0, c4=0, tailed_triangle=0, path4=0, claw=0)
    for quad in itertools.combinations(G.nodes(), 4):
        H = G.subgraph(quad)
        m = H.number_of_edges()
        degs = sorted(d for _, d in H.degree())
        if m == 6:
            counts["k4"] += 1
        elif m == 5:
            counts["diamond"] += 1
        elif m == 4 and degs == [2, 2, 2, 2]:
            counts["c4"] += 1
        elif m == 4 and degs == [1, 2, 2, 3]:
            counts["tailed_triangle"] += 1
        elif m == 3 and degs == [1, 1, 2, 2]:
            counts["path4"] += 1
        elif m == 3 and degs == [1, 1, 1, 3]:
            counts["claw"] += 1
    return counts


def _run(G):
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )
    )
    return graphlet_census4(ds).to_pylist()[0]


def test_graphlet_census_random_vs_brute():
    for seed, n, m in ((3, 20, 50), (7, 25, 80)):
        G = nx.gnm_random_graph(n, m, seed=seed)
        got = _run(G)
        want = _brute(G)
        for k, v in want.items():
            assert got[k] == v, (seed, k)
        assert got["triangles"] == sum(nx.triangles(G).values()) // 3


def test_graphlet_census_fixtures():
    # one of each class, as disjoint components (connected graphlets
    # never span components, so the union census is exactly 1 each)
    D = nx.complete_graph(4)
    D.remove_edge(0, 1)
    tailed = nx.complete_graph(3)
    tailed.add_edge(0, 99)
    G = nx.disjoint_union_all(
        [
            nx.complete_graph(4),
            nx.cycle_graph(4),
            nx.star_graph(3),
            nx.path_graph(4),
            D,
            tailed,
        ]
    )
    got = _run(G)
    for k in ("k4", "diamond", "c4", "tailed_triangle", "path4", "claw"):
        assert got[k] == 1, k
