"""Maximal matching property oracle (matching + maximality +
determinism), fast path and distributed rounds."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.kernels.matching import maximal_matching
from tests.util import ds_to_table, nx_edge_arrays


def _edges_ds(G) -> ray.data.Dataset:
    src, dst = nx_edge_arrays(G)
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    )


def _check(G, matched: set[tuple[int, int]]):
    # 1. a matching: no two edges share a vertex
    seen = set()
    for u, v in matched:
        assert G.has_edge(u, v)
        assert u not in seen and v not in seen
        seen.add(u)
        seen.add(v)
    # 2. maximal: every edge touches a matched vertex
    for u, v in G.edges():
        assert u in seen or v in seen, (u, v)
    # 3. 2-approximation of maximum
    assert len(matched) >= len(nx.maximal_matching(G)) / 2


def _run(G, **kw) -> set[tuple[int, int]]:
    t = ds_to_table(maximal_matching(_edges_ds(G), **kw))
    return set(zip(t.column("src").to_pylist(), t.column("dst").to_pylist()))


@pytest.mark.parametrize("seed,p", [(2, 0.05), (9, 0.15)])
def test_maximal_matching(seed, p):
    G = nx.gnp_random_graph(80, p, seed=seed)
    got = _run(G)
    _check(G, got)
    assert got == _run(G)  # deterministic


def test_maximal_matching_distributed_rounds():
    G = nx.gnp_random_graph(40, 0.1, seed=5)
    got = _run(G, single_task_max=0)
    _check(G, got)
    # both paths run the same local-max rule with the same priorities
    assert got == _run(G)


def test_maximal_matching_star_and_path():
    G = nx.star_graph(10)
    got = _run(G)
    assert len(got) == 1  # star: one edge max
    _check(G, got)
    P = nx.path_graph(9)
    gotp = _run(P)
    _check(P, gotp)
