"""Girth (shortest cycle) vs the networkx oracle."""

import shutil

import networkx as nx
import numpy as np
import pytest

from igraph_ray.kernels.girth import girth
from tests.util import graph_from_nx


def _run(G, tmp_path, lane_width=16):
    G = nx.convert_node_labels_to_integers(G)
    d = str(tmp_path / "g")
    shutil.rmtree(d, ignore_errors=True)
    g = graph_from_nx(G, d)
    return girth(
        g, np.array(sorted(G.nodes()), np.int64), lane_width=lane_width
    )


@pytest.mark.parametrize(
    "G,want",
    [
        (nx.cycle_graph(5), 5),  # odd girth
        (nx.cycle_graph(6), 6),  # even girth
        (nx.petersen_graph(), 5),
        (nx.complete_graph(4), 3),
        (nx.hypercube_graph(3), 4),  # bipartite, even girth only
        (nx.path_graph(6), float("inf")),  # forest
        (nx.balanced_tree(2, 4), float("inf")),
    ],
)
def test_girth_fixtures(G, want, tmp_path):
    assert _run(G, tmp_path) == want


def test_girth_random_vs_nx(tmp_path):
    for seed in (7, 9, 21):
        G = nx.gnm_random_graph(50, 70, seed=seed)
        got = _run(G, tmp_path / str(seed), lane_width=13)
        assert got == nx.girth(G), seed


def test_girth_sampled_upper_bound(tmp_path):
    # a sampled pivot set gives an upper bound (inf allowed)
    G = nx.convert_node_labels_to_integers(nx.petersen_graph())
    d = str(tmp_path / "s")
    g = graph_from_nx(G, d)
    got = girth(g, np.array([0, 1, 2], np.int64), lane_width=8)
    assert got >= 5


def test_bipartite_check_vs_nx(tmp_path):
    from igraph_ray.kernels.girth import bipartite_check
    from tests.util import min_vid_components

    cases = [
        nx.cycle_graph(6),
        nx.cycle_graph(5),
        nx.hypercube_graph(3),
        nx.complete_bipartite_graph(3, 4),
        nx.petersen_graph(),
        nx.gnm_random_graph(40, 50, seed=5),
        nx.union(
            nx.cycle_graph(4),
            nx.relabel_nodes(nx.cycle_graph(3), {0: 10, 1: 11, 2: 12}),
        ),
        nx.balanced_tree(2, 3),  # forest -> bipartite
    ]
    for i, G in enumerate(cases):
        G = nx.convert_node_labels_to_integers(G)
        g = graph_from_nx(G, str(tmp_path / f"b{i}"))
        comp = min_vid_components(G)
        roots = np.unique(np.array(list(comp.values()), np.int64))
        is_bip, colors = bipartite_check(g, roots)
        assert is_bip == nx.is_bipartite(G), i
        if is_bip and G.number_of_edges():
            c = {r["vid"]: r["color"] for r in colors.iter_rows()}
            assert all(c[u] != c[v] for u, v in G.edges()), i
            assert all(v in (0, 1) for v in c.values())
