"""Hierholzer Eulerian circuit: chain/closure/usage vs nx fixtures."""

from collections import Counter

import networkx as nx
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.kernels.euler import eulerian_circuit


def _run(edges_list):
    t = pa.table(
        {
            "src": pa.array([u for u, v in edges_list], pa.int64()),
            "dst": pa.array([v for u, v in edges_list], pa.int64()),
        }
    )
    c = eulerian_circuit(ray.data.from_arrow(t))
    u = c.column("u").to_pylist()
    v = c.column("v").to_pylist()
    assert all(v[i] == u[i + 1] for i in range(len(u) - 1))  # chained
    assert len(u) == 0 or v[-1] == u[0]  # closed
    usage = Counter((min(a, b), max(a, b)) for a, b in zip(u, v))
    want = Counter((min(a, b), max(a, b)) for a, b in edges_list)
    assert usage == want  # every edge exactly its multiplicity
    return u, v


@pytest.mark.parametrize(
    "maker",
    [
        lambda: list(nx.cycle_graph(6).edges()),
        lambda: list(nx.complete_graph(5).edges()),  # K5: all deg 4
        lambda: list(nx.complete_graph(7).edges()),
    ],
)
def test_eulerian_graphs(ray_session, maker):
    _run(maker())


def test_doubled_graph_always_eulerian(ray_session):
    H = nx.gnm_random_graph(30, 60, seed=1)
    H = H.subgraph(max(nx.connected_components(H), key=len))
    doubled = list(H.edges()) + list(H.edges())
    u, _ = _run(doubled)
    assert len(u) == len(doubled)


def test_determinism(ray_session):
    edges = list(nx.complete_graph(5).edges())
    assert _run(edges) == _run(edges)


def test_rejects_odd_and_disconnected(ray_session):
    t = pa.table(
        {"src": pa.array([0, 1, 2], pa.int64()), "dst": pa.array([1, 2, 3], pa.int64())}
    )
    with pytest.raises(ValueError, match="odd-degree"):
        eulerian_circuit(ray.data.from_arrow(t))
    two = list(nx.cycle_graph(3).edges()) + [(10, 11), (11, 12), (12, 10)]
    t2 = pa.table(
        {
            "src": pa.array([u for u, v in two], pa.int64()),
            "dst": pa.array([v for u, v in two], pa.int64()),
        }
    )
    with pytest.raises(ValueError, match="disconnected"):
        eulerian_circuit(ray.data.from_arrow(t2))
