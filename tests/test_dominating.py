"""Dominating set kernel: domination property, determinism, fixtures."""

import shutil

import networkx as nx
import pyarrow as pa
import pytest

from igraph_ray.api import build_graph, edges_dataset
from igraph_ray.kernels.dominating import dominating_set


def _run(G, tmp_path, tag):
    d = str(tmp_path / f"dom_{tag}")
    shutil.rmtree(d, ignore_errors=True)
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    g = build_graph(
        edges_dataset(src, dst), d, num_parts=4, symmetrize=True
    )
    out = dominating_set(g)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    mem = dict(
        zip(tbl.column("vid").to_pylist(), tbl.column("in_ds").to_pylist())
    )
    return {v for v, m in mem.items() if m}


@pytest.mark.parametrize(
    "maker",
    [
        lambda: nx.karate_club_graph(),
        lambda: nx.gnm_random_graph(60, 150, seed=1),
        lambda: nx.gnm_random_graph(50, 40, seed=2),  # has isolates
    ],
)
def test_dominating_property(ray_session, tmp_path, maker):
    G = nx.convert_node_labels_to_integers(maker())
    S = _run(G, tmp_path, "p")
    # engine convention: the vertex set is the keys appearing in >=1
    # edge (isolates have no edge-table row), so domination is
    # asserted over the non-isolated vertices
    for v in G.nodes():
        if G.degree(v) == 0:
            continue
        assert (v in S) or any(w in S for w in G.neighbors(v)), v


def test_dominating_star_is_optimal_and_deterministic(
    ray_session, tmp_path
):
    G = nx.star_graph(9)
    S = _run(G, tmp_path, "a")
    assert S == {0}  # the centre alone dominates
    assert _run(G, tmp_path, "b") == S
