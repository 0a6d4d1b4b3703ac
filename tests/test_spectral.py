"""Fiedler vector / algebraic connectivity vs dense numpy eigh."""

import math

import networkx as nx
import numpy as np
import pytest

from igraph_ray.kernels.spectral import fiedler_vector, spectral_bisection
from tests.util import graph_from_nx


def _dense_fiedler(G):
    nodes = sorted(G.nodes())
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    L = np.zeros((n, n))
    for u, v in G.edges():
        if u == v:
            continue
        L[idx[u], idx[v]] -= 1.0
        L[idx[v], idx[u]] -= 1.0
        L[idx[u], idx[u]] += 1.0
        L[idx[v], idx[v]] += 1.0
    w, vec = np.linalg.eigh(L)
    return nodes, float(w[1]), vec[:, 1]


def _run(G, tmp_dir, **kw):
    graph = graph_from_nx(G, tmp_dir, num_parts=3)
    ds, lam2 = fiedler_vector(graph, G.number_of_nodes(), **kw)
    rows = {}
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        rows.update(
            zip(b.column("vid").to_pylist(), b.column("fiedler").to_pylist())
        )
    return rows, lam2


def test_fiedler_path_graph(tmp_graph_dir):
    n = 8
    G = nx.path_graph(n)
    rows, lam2 = _run(G, tmp_graph_dir, tol=1e-7)
    # closed form: lambda_2 = 2(1 - cos(pi/n))
    assert lam2 == pytest.approx(2 * (1 - math.cos(math.pi / n)), abs=1e-5)
    got = np.array([rows[v] for v in range(n)])
    _, lam_ref, ref = _dense_fiedler(G)
    ref = ref / np.linalg.norm(ref)
    if ref[0] < 0:
        ref = -ref
    assert np.allclose(got, ref, atol=1e-3)
    assert abs(np.linalg.norm(got) - 1.0) < 1e-8
    assert abs(got.sum()) < 1e-8


def test_fiedler_irregular_connected(tmp_graph_dir):
    # lollipop = clique + tail: irregular degrees, healthy spectral gap
    G = nx.lollipop_graph(6, 3)
    assert nx.is_connected(G)
    rows, lam2 = _run(G, tmp_graph_dir, tol=1e-6)
    nodes, lam_ref, ref = _dense_fiedler(G)
    assert lam2 == pytest.approx(lam_ref, abs=1e-4)
    got = np.array([rows[v] for v in nodes])
    ref = ref / np.linalg.norm(ref)
    if np.dot(got, ref) < 0:
        ref = -ref
    # eigenvector up to sign, modest gap -> modest tolerance
    assert np.abs(got - ref).max() < 1e-3


def test_spectral_bisection_two_cliques(tmp_graph_dir):
    # two 8-cliques joined by one bridge edge: the Fiedler cut is the
    # bridge
    G = nx.disjoint_union(nx.complete_graph(8), nx.complete_graph(8))
    G.add_edge(0, 8)
    ds = spectral_bisection(
        graph_from_nx(G, tmp_graph_dir, num_parts=3), G.number_of_nodes()
    )
    side = {}
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        side.update(
            zip(b.column("vid").to_pylist(), b.column("side").to_pylist())
        )
    left = {side[v] for v in range(8)}
    right = {side[v] for v in range(8, 16)}
    assert len(left) == 1 and len(right) == 1 and left != right
