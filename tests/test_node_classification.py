"""Harmonic-function node classification vs a dense replay of the
reference iteration (networkx node_classification.harmonic_function
semantics: F <- P@F + B with labeled rows of P zeroed; scipy is absent
in this container, so the oracle is the same formula in dense numpy).
"""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.api import build_graph, edges_dataset
from igraph_ray.kernels.node_classification import harmonic_function_labels
from tests.util import ds_to_table


def _dense_oracle(G, seed_vids, seed_labels, max_iter=30):
    n = G.number_of_nodes()
    nodes = sorted(G.nodes())
    assert nodes == list(range(n))
    A = np.zeros((n, n))
    for u, v, d in G.edges(data=True):
        w = d.get("weight", 1.0)
        A[u, v] += w
        A[v, u] += w
    classes = np.unique(np.asarray(seed_labels))
    k = len(classes)
    deg = A.sum(axis=0)
    deg[deg == 0] = 1
    P = A / deg[:, None]
    P[list(seed_vids)] = 0.0
    B = np.zeros((n, k))
    for v, lab in zip(seed_vids, seed_labels):
        B[v, int(np.searchsorted(classes, lab))] = 1.0
    F = np.zeros((n, k))
    for _ in range(max_iter):
        F = P @ F + B
    return {v: classes[int(np.argmax(F[v]))] for v in range(n)}, F


def _run(G, seed_vids, seed_labels, tmpdir, num_parts=3, max_iter=30):
    src = np.array([u for u, v in G.edges()], np.int64)
    dst = np.array([v for u, v in G.edges()], np.int64)
    w = np.array(
        [G[u][v].get("weight", 1.0) for u, v in G.edges()], np.float64
    )
    vertices = ray.data.from_arrow(
        pa.table({"vid": pa.array(sorted(int(v) for v in G.nodes()))})
    )
    graph = build_graph(
        edges_dataset(src, dst, w), str(tmpdir / "g"),
        num_parts=num_parts, symmetrize=True, vertices=vertices,
    )
    tbl = ds_to_table(
        harmonic_function_labels(graph, seed_vids, seed_labels,
                                 max_iter=max_iter)
    )
    return dict(
        zip(tbl.column("vid").to_pylist(), tbl.column("label").to_pylist())
    )


def test_two_cluster_path(tmp_path):
    # 0-1-2-3-4-5: seeds at the ends; split follows hop distance, and
    # the exact midpoint tie goes to the smaller class ("a" < "b")
    G = nx.path_graph(6)
    got = _run(G, [0, 5], ["a", "b"], tmp_path, num_parts=2)
    assert got == {0: "a", 1: "a", 2: "a", 3: "b", 4: "b", 5: "b"}


def test_matches_dense_reference_weighted(tmp_path):
    rng = np.random.default_rng(11)
    G = nx.gnm_random_graph(60, 150, seed=11)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.uniform(0.2, 3.0))
    seeds = [0, 7, 23, 41]
    labels = ["x", "y", "x", "z"]
    want, F = _dense_oracle(G, seeds, labels)
    got = _run(G, seeds, labels, tmp_path, num_parts=3)
    # generic weights: no near-tie rows (sanity), so argmax is stable
    top2 = np.sort(F, axis=1)[:, -2:]
    reached = F.sum(axis=1) > 0
    assert (top2[reached, 1] - top2[reached, 0] > 1e-9).all()
    assert got == want


def test_isolated_and_unreachable_default_class(tmp_path):
    # component without any seed + isolated vertex: all-zero scores,
    # argmax -> first class in sorted order
    G = nx.Graph()
    G.add_edges_from([(0, 1), (2, 3)])
    G.add_node(4)
    got = _run(G, [0], ["m"], tmp_path, num_parts=2)
    assert got[0] == got[1] == "m"
    assert got[2] == got[3] == got[4] == "m"  # single class everywhere

    got2 = _run(G, [0, 2], ["b", "a"], tmp_path, num_parts=2)
    assert got2[0] == got2[1] == "b"
    assert got2[2] == got2[3] == "a"
    assert got2[4] == "a"  # all-zero row -> sorted-first class


def test_validation(tmp_path):
    G = nx.path_graph(3)
    with pytest.raises(ValueError):
        _run(G, [], [], tmp_path)
    with pytest.raises(ValueError):
        _run(G, [0, 0], ["a", "b"], tmp_path)
