"""k-truss and minimum-spanning-forest oracle tests (nx.k_truss /
nx.minimum_spanning_edges parity; igraph k_truss and
igraph_minimum_spanning_tree surface)."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.kernels.ktruss import k_truss
from igraph_ray.kernels.mst import minimum_spanning_forest
from tests.util import ds_to_table, nx_edge_arrays


def _edges_ds(G, weights=None) -> ray.data.Dataset:
    src, dst = nx_edge_arrays(G)
    cols = {"src": pa.array(src), "dst": pa.array(dst)}
    if weights is not None:
        cols["weight"] = pa.array(np.asarray(weights, np.float64))
    return ray.data.from_arrow(pa.table(cols))


def _edge_set(tbl: pa.Table) -> set[tuple[int, int]]:
    return set(
        zip(tbl.column("src").to_pylist(), tbl.column("dst").to_pylist())
    )


@pytest.mark.parametrize("k", [3, 4])
def test_k_truss_matches_nx(k):
    G = nx.gnm_random_graph(40, 170, seed=23)
    got = _edge_set(ds_to_table(k_truss(_edges_ds(G), k)))
    ref = {
        (min(u, v), max(u, v)) for u, v in nx.k_truss(G, k).edges()
    }
    assert got == ref


def test_k_truss_k2_keeps_all_nonloop_edges():
    G = nx.gnm_random_graph(30, 60, seed=1)
    got = _edge_set(ds_to_table(k_truss(_edges_ds(G), 2)))
    ref = {(min(u, v), max(u, v)) for u, v in G.edges()}
    assert got == ref


def test_k_truss_peeling_cascades():
    # triangle chain: edge (2,3) has support 1 only via (2,3,4); removing
    # low-support edges cascades — k=4 must empty this graph, while the
    # 4-clique part survives k=4
    G = nx.Graph()
    G.add_edges_from(nx.complete_graph(4).edges())  # 0-3 clique
    G.add_edges_from([(3, 4), (3, 5), (4, 5)])  # pendant triangle
    got = _edge_set(ds_to_table(k_truss(_edges_ds(G), 4)))
    ref = {(min(u, v), max(u, v)) for u, v in nx.k_truss(G, 4).edges()}
    assert got == ref
    assert got == {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}


def _check_msf(G, tbl: pa.Table):
    # forest validity + total-weight optimality (all MSFs share weight)
    F = nx.Graph()
    F.add_nodes_from(G.nodes())
    rows = list(
        zip(
            tbl.column("src").to_pylist(),
            tbl.column("dst").to_pylist(),
            tbl.column("weight").to_pylist(),
        )
    )
    for u, v, w in rows:
        assert G.has_edge(u, v)
        F.add_edge(u, v, weight=w)
    assert nx.is_forest(F)
    n_comp = nx.number_connected_components(G)
    assert F.number_of_edges() == G.number_of_nodes() - n_comp
    ref_w = sum(
        d["weight"] for _, _, d in nx.minimum_spanning_edges(G, data=True)
    )
    got_w = sum(w for _, _, w in rows)
    assert got_w == pytest.approx(ref_w, abs=1e-9)


def test_msf_random_weights(tmp_path):
    rng = np.random.default_rng(5)
    G = nx.gnm_random_graph(60, 170, seed=41)
    w = rng.uniform(0.1, 10.0, G.number_of_edges())
    for (u, v), wi in zip(G.edges(), w):
        G[u][v]["weight"] = float(wi)
    out = ds_to_table(
        minimum_spanning_forest(_edges_ds(G, w), str(tmp_path / "mst"))
    )
    _check_msf(G, out)


def test_msf_uniform_ties_and_disconnected(tmp_path):
    G = nx.gnm_random_graph(36, 54, seed=9)  # sparse → several components
    for u, v in G.edges():
        G[u][v]["weight"] = 1.0
    w = np.ones(G.number_of_edges())
    out = ds_to_table(
        minimum_spanning_forest(_edges_ds(G, w), str(tmp_path / "mst"))
    )
    _check_msf(G, out)
