"""Hopcroft–Karp maximum bipartite matching + König certificate."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.kernels.bipartite_matching import (
    maximum_bipartite_matching,
)


def _run(G):
    t = pa.table(
        {
            "src": pa.array([u for u, v in G.edges()], pa.int64()),
            "dst": pa.array([v for u, v in G.edges()], pa.int64()),
        }
    )
    return maximum_bipartite_matching(ray.data.from_arrow(t))


@pytest.mark.parametrize("seed", range(6))
def test_matches_nx_size_with_valid_certificate(ray_session, seed):
    rng = np.random.RandomState(seed)
    nl, nr = rng.randint(3, 20), rng.randint(3, 20)
    G = nx.bipartite.random_graph(nl, nr, rng.uniform(0.1, 0.5), seed=seed)
    if G.number_of_edges() == 0:
        return
    matching, cover = _run(G)
    top = {n for n, d in G.nodes(data=True) if d["bipartite"] == 0}
    ref = len(nx.bipartite.maximum_matching(G, top_nodes=top)) // 2
    assert matching.num_rows == ref
    assert cover.num_rows == ref  # König
    cov = set(cover.column("vid").to_pylist())
    assert all(u in cov or v in cov for u, v in G.edges())
    seen = set()
    for u, v in zip(
        matching.column("src").to_pylist(), matching.column("dst").to_pylist()
    ):
        assert G.has_edge(u, v)
        assert u not in seen and v not in seen
        seen.add(u)
        seen.add(v)


def test_perfect_matching_on_even_cycle(ray_session):
    G = nx.cycle_graph(8)  # bipartite, perfect matching of size 4
    matching, cover = _run(G)
    assert matching.num_rows == 4
    assert cover.num_rows == 4


def test_rejects_odd_cycle(ray_session):
    G = nx.cycle_graph(5)
    with pytest.raises(Exception, match="bipartite"):
        _run(G)
