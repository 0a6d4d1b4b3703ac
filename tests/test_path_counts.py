"""Shortest-path counts (Brandes forward phase exposed) vs a
pure-Python BFS path-counting oracle."""

from collections import deque

import networkx as nx
import pyarrow as pa

from igraph_ray.kernels.betweenness import shortest_path_counts
from tests.util import graph_from_nx


def _oracle(G: nx.Graph, s: int) -> dict[int, tuple[int, int]]:
    """vid -> (dist, sigma) by level-order BFS path counting."""
    dist = {s: 0}
    sigma = {s: 1}
    dq = deque([s])
    while dq:
        u = dq.popleft()
        for v in G.neighbors(u):
            if v not in dist:
                dist[v] = dist[u] + 1
                sigma[v] = 0
                dq.append(v)
            if dist[v] == dist[u] + 1:
                sigma[v] += sigma[u]
    return {v: (dist[v], sigma[v]) for v in dist}


def _run(G, tmp_graph_dir, source):
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    out = pa.concat_tables(
        shortest_path_counts(g, source=source).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return {
        int(v): (int(d), int(c))
        for v, d, c in zip(
            out.column("vid").to_pylist(),
            out.column("dist").to_pylist(),
            out.column("sigma").to_pylist(),
        )
    }


def test_gnm_counts_exact(ray_session, tmp_graph_dir):
    G = nx.gnm_random_graph(40, 110, seed=17)
    assert _run(G, tmp_graph_dir, 0) == _oracle(G, 0)


def test_grid_many_paths(ray_session, tmp_graph_dir):
    # 2D grid: sigma to the far corner is a binomial coefficient
    G = nx.convert_node_labels_to_integers(nx.grid_2d_graph(5, 5))
    got = _run(G, tmp_graph_dir, 0)
    want = _oracle(G, 0)
    assert got == want
    # C(8,4) = 70 paths across a 5x5 grid corner to corner
    far = max(want, key=lambda v: want[v][0])
    assert want[far] == (8, 70)


def test_disconnected_drops_unreachable(ray_session, tmp_graph_dir):
    G = nx.Graph([(0, 1), (1, 2), (5, 6)])
    got = _run(G, tmp_graph_dir, 0)
    assert set(got) == {0, 1, 2}
    assert got == _oracle(G, 0)
