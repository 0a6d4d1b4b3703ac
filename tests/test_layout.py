"""Force-directed layout: structural + determinism oracles."""

import networkx as nx
import numpy as np
import pyarrow as pa

from igraph_ray.kernels.layout import fruchterman_reingold
from tests.util import ds_to_table, graph_from_nx


def _xy(g, iterations=60):
    t = ds_to_table(fruchterman_reingold(g, iterations=iterations)).sort_by(
        "vid"
    )
    return np.stack(
        [t.column("x").to_numpy(), t.column("y").to_numpy()], axis=1
    ), t


def test_fr_layout_separates_communities(tmp_path):
    G = nx.barbell_graph(6, 2)
    g = graph_from_nx(G, str(tmp_path / "g"))
    xy, t = _xy(g)
    A, B = list(range(6)), list(range(8, 14))
    intra = np.mean(
        [np.linalg.norm(xy[i] - xy[j]) for i in A for j in A if i < j]
        + [np.linalg.norm(xy[i] - xy[j]) for i in B for j in B if i < j]
    )
    inter = np.mean([np.linalg.norm(xy[i] - xy[j]) for i in A for j in B])
    assert inter > 1.5 * intra
    # all positions inside the unit square
    assert (xy >= 0).all() and (xy <= 1).all()


def test_fr_layout_deterministic(tmp_path):
    G = nx.gnm_random_graph(30, 60, seed=8)
    g = graph_from_nx(G, str(tmp_path / "g"))
    _, t1 = _xy(g, iterations=20)
    _, t2 = _xy(g, iterations=20)
    assert t1.equals(t2)


def test_fr_layout_neighbors_closer(tmp_path):
    G = nx.gnm_random_graph(40, 80, seed=5)
    g = graph_from_nx(G, str(tmp_path / "g"))
    xy, _ = _xy(g)
    edge_d = np.mean(
        [np.linalg.norm(xy[u] - xy[v]) for u, v in G.edges()]
    )
    rng = np.random.default_rng(0)
    non = []
    while len(non) < 200:
        u, v = rng.integers(0, 40, 2)
        if u != v and not G.has_edge(int(u), int(v)):
            non.append(np.linalg.norm(xy[u] - xy[v]))
    assert edge_d < np.mean(non)
