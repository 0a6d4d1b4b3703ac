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


def test_transitive_closure_vs_nx():
    import networkx as nx

    from igraph_ray.kernels.transitive import transitive_closure

    for seed in (1, 5):
        G = nx.gnp_random_graph(25, 0.12, seed=seed, directed=True)
        dag = nx.DiGraph(
            (u, v) for u, v in G.edges() if u < v
        )
        dag.add_nodes_from(G.nodes())
        arcs = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array(
                        [u for u, v in dag.edges()], pa.int64()
                    ),
                    "dst": pa.array(
                        [v for u, v in dag.edges()], pa.int64()
                    ),
                }
            )
        ).repartition(3)
        out = transitive_closure(arcs)
        got = set(
            zip(out.column("src").to_pylist(), out.column("dst").to_pylist())
        )
        want = set(nx.transitive_closure_dag(dag).edges())
        assert got == want


def test_transitive_closure_rejects_cycles():
    import pytest

    from igraph_ray.kernels.transitive import transitive_closure

    arcs = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 1, 2], pa.int64()),
                "dst": pa.array([1, 2, 0], pa.int64()),
            }
        )
    )
    with pytest.raises(Exception, match="cycle"):
        transitive_closure(arcs)
