"""Walktrap oracle: an independent brute-force reference (recomputes
every adjacent-pair delta_sigma from scratch from the community
probability vectors at every step — no heap, no incremental state)
must produce the identical merge sequence; planted partitions are
recovered; the modularity trace matches kernels/modularity.py on the
final cut."""

import networkx as nx
import numpy as np
import pytest

from igraph_ray.api import edges_dataset
from igraph_ray.kernels.walktrap import _walktrap_py, walktrap
from tests.util import ds_to_table


def _brute_walktrap_merges(vids, src, dst, w, t=4):
    """Reference merge sequence: dense recompute each step."""
    n = len(vids)
    a = np.searchsorted(vids, src)
    b = np.searchsorted(vids, dst)
    deg = np.zeros(n)
    np.add.at(deg, a, w)
    np.add.at(deg, b, w)
    A = np.zeros((n, n))
    np.add.at(A, (a, b), w)
    np.add.at(A, (b, a), w)
    P = A / deg[:, None]
    Pt = np.linalg.matrix_power(P, t)
    inv_deg = 1.0 / deg

    vec = {i: Pt[i].copy() for i in range(n)}
    size = {i: 1 for i in range(n)}
    adj = {i: set() for i in range(n)}
    for i, j in zip(a, b):
        if i != j:
            adj[int(i)].add(int(j))
            adj[int(j)].add(int(i))
    merges = []
    while True:
        best = None
        for i in sorted(adj):
            for j in sorted(adj[i]):
                if j <= i:
                    continue
                r2 = float(((vec[i] - vec[j]) ** 2 * inv_deg).sum())
                ds = size[i] * size[j] / (size[i] + size[j]) * r2 / n
                key = (ds, i, j)
                if best is None or key < best:
                    best = key
        if best is None:
            break
        ds, i, j = best
        merges.append((i, j))
        s1, s2 = size[i], size[j]
        vec[i] = (s1 * vec[i] + s2 * vec[j]) / (s1 + s2)
        size[i] = s1 + s2
        for k in adj[j]:
            if k != i:
                adj[k].add(i)
                adj[i].add(k)
            adj[k].discard(j)
        adj[i].discard(j)
        del adj[j], vec[j], size[j]
    return merges


@pytest.mark.parametrize("seed", [0, 3, 11])
def test_walktrap_merge_sequence_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    G = nx.gnm_random_graph(24, 60, seed=seed)
    # keep only the largest component-free requirement: walktrap runs
    # per component anyway; distinct weights make every argmin unique
    src = np.array([u for u, v in G.edges()], dtype=np.int64)
    dst = np.array([v for u, v in G.edges()], dtype=np.int64)
    w = rng.permutation(len(src)).astype(np.float64) + 1.0
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    vids = np.unique(np.concatenate([lo, hi]))
    _, _, _, merges = _walktrap_py(vids, lo, hi, w, t=4)
    ref = _brute_walktrap_merges(vids, lo, hi, w, t=4)
    assert merges == ref


def test_walktrap_recovers_planted_partition(ray_session):
    # two 8-cliques joined by one bridge edge
    src, dst = [], []
    for base in (0, 8):
        for i in range(8):
            for j in range(i + 1, 8):
                src.append(base + i)
                dst.append(base + j)
    src.append(0)
    dst.append(8)
    assign, qs = walktrap(edges_dataset(src, dst))
    tbl = ds_to_table(assign)
    comm = dict(
        zip(tbl.column("vid").to_pylist(), tbl.column("community").to_pylist())
    )
    left = {comm[v] for v in range(8)}
    right = {comm[v] for v in range(8, 16)}
    assert len(left) == 1 and len(right) == 1 and left != right
    assert max(qs) > 0.3


def test_walktrap_modularity_trace_matches_final_cut(ray_session):
    G = nx.karate_club_graph()
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    assign, qs = walktrap(edges_dataset(src, dst))
    tbl = ds_to_table(assign)
    comm = dict(
        zip(tbl.column("vid").to_pylist(), tbl.column("community").to_pylist())
    )
    part = {}
    for v, c in comm.items():
        part.setdefault(c, set()).add(v)
    # weight=None: karate_club_graph carries edge weights, but the
    # pipeline above ran unweighted
    q_nx = nx.community.modularity(G, part.values(), weight=None)
    assert abs(max(qs) - q_nx) < 1e-9
    # karate yields a meaningful community structure
    assert 0.3 < q_nx < 0.45 and 2 <= len(part) <= 6
