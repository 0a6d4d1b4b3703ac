"""Leading-eigenvector oracle: an independent dense np.linalg.eigh
reference recursion (explicitly materializing B^(g)) must produce the
identical partition; planted partitions recovered; Q cross-checked vs
nx.community.modularity."""

import networkx as nx
import numpy as np
import pytest

from igraph_ray.api import edges_dataset
from igraph_ray.kernels.leading_eigen import (
    _leading_eigen_py,
    leading_eigenvector,
)
from tests.util import ds_to_table


def _dense_reference(vids, src, dst, w):
    """Dense eigh recursion per Newman 2006; identical stop rules and
    split-label order as the kernel (stack discipline: pop, negative
    side gets fresh label, push g then fresh)."""
    n = len(vids)
    a = np.searchsorted(vids, src)
    b = np.searchsorted(vids, dst)
    A = np.zeros((n, n))
    for i, j, wij in zip(a, b, w):
        if i == j:
            A[i, i] += 2.0 * wij
        else:
            A[i, j] += wij
            A[j, i] += wij
    k = A.sum(1)
    two_m = k.sum()
    B = A - np.outer(k, k) / two_m
    labels = np.zeros(n, dtype=np.int64)
    nxt = 1
    stack = [0]
    while stack:
        g = stack.pop()
        idx = np.flatnonzero(labels == g)
        if len(idx) <= 1:
            continue
        Bg = B[np.ix_(idx, idx)].copy()
        Bg[np.diag_indices(len(idx))] -= B[np.ix_(idx, idx)].sum(1)
        vals, vecs = np.linalg.eigh(Bg)
        lam = vals[-1]
        x = vecs[:, -1]
        piv = int(np.argmax(np.abs(x)))
        if x[piv] < 0:
            x = -x
        s = np.where(x >= 0.0, 1.0, -1.0)
        dq = float(s @ Bg @ s) / (2.0 * two_m)
        if lam <= 1e-10 or dq <= 1e-12 or len(set(s)) < 2:
            continue
        labels[idx[s < 0.0]] = nxt
        stack.append(g)
        stack.append(nxt)
        nxt += 1
    out = {}
    for i in range(n):
        out.setdefault(labels[i], []).append(int(vids[i]))
    return {frozenset(v) for v in out.values()}


def _partition_sets(tbl):
    comm = {}
    for v, c in zip(
        tbl.column("vid").to_pylist(), tbl.column("community").to_pylist()
    ):
        comm.setdefault(c, set()).add(v)
    return {frozenset(s) for s in comm.values()}


@pytest.mark.parametrize("seed", [0, 2, 6])
def test_matches_dense_eigh_reference(seed):
    rng = np.random.default_rng(seed)
    G = nx.gnm_random_graph(28, 80, seed=seed)
    src = np.array([min(u, v) for u, v in G.edges()], dtype=np.int64)
    dst = np.array([max(u, v) for u, v in G.edges()], dtype=np.int64)
    # distinct weights keep the leading eigenvalue simple (separated)
    w = rng.permutation(len(src)).astype(np.float64) + 1.0
    vids = np.unique(np.concatenate([src, dst]))
    labels, Q = _leading_eigen_py(vids, src, dst, w)
    ours = {}
    for v, c in zip(vids, labels):
        ours.setdefault(c, set()).add(int(v))
    ours = {frozenset(s) for s in ours.values()}
    ref = _dense_reference(vids, src, dst, w)
    assert ours == ref


def test_recovers_planted_partition(ray_session):
    src, dst = [], []
    for base in (0, 8):
        for i in range(8):
            for j in range(i + 1, 8):
                src.append(base + i)
                dst.append(base + j)
    src.append(0)
    dst.append(8)
    assign, Q = leading_eigenvector(edges_dataset(src, dst))
    parts = _partition_sets(ds_to_table(assign))
    assert parts == {frozenset(range(0, 8)), frozenset(range(8, 16))}
    assert Q > 0.3


def test_karate_q_matches_nx_modularity(ray_session):
    G = nx.karate_club_graph()
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    assign, Q = leading_eigenvector(edges_dataset(src, dst))
    parts = _partition_sets(ds_to_table(assign))
    q_nx = nx.community.modularity(G, parts, weight=None)
    assert abs(Q - q_nx) < 1e-9
    assert Q > 0.35  # Newman 2006 reports ~0.393 for karate
