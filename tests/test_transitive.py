"""Transitive reduction vs nx.transitive_reduction (unique for DAGs)."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.kernels.transitive import transitive_reduction


def _ds(G):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, v in G.edges()], pa.int64()),
                "dst": pa.array([v for u, v in G.edges()], pa.int64()),
            }
        )
    )


@pytest.mark.parametrize("seed", range(8))
def test_matches_nx_on_random_dags(ray_session, seed):
    rng = np.random.RandomState(seed)
    n = rng.randint(5, 40)
    p = rng.uniform(0.05, 0.4)
    G = nx.DiGraph()
    G.add_nodes_from(range(n))
    for i in range(n):
        for j in range(i + 1, n):
            if rng.rand() < p:
                G.add_edge(i, j)
    if G.number_of_edges() == 0:
        return
    out = transitive_reduction(_ds(G))
    ours = set(
        zip(out.column("src").to_pylist(), out.column("dst").to_pylist())
    )
    assert ours == set(nx.transitive_reduction(G).edges())


def test_chain_with_shortcuts(ray_session):
    G = nx.DiGraph([(0, 1), (1, 2), (2, 3), (0, 2), (0, 3), (1, 3)])
    out = transitive_reduction(_ds(G))
    ours = set(
        zip(out.column("src").to_pylist(), out.column("dst").to_pylist())
    )
    assert ours == {(0, 1), (1, 2), (2, 3)}


def test_rejects_cycle(ray_session):
    G = nx.DiGraph([(0, 1), (1, 2), (2, 0)])
    with pytest.raises(Exception, match="cycle"):
        transitive_reduction(_ds(G))
