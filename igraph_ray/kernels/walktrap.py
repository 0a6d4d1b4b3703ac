"""Walktrap community detection (Pons & Latapy 2005, "Computing
communities in large networks using random walks") — the igraph
``community_walktrap`` + ``as_clustering()`` surface.

Algorithm (exact per the paper): short random walks of length ``t``
define a distance between vertices, ``r_ij^2 = sum_k (P^t_ik -
P^t_jk)^2 / d(k)``; communities are merged agglomeratively (only
ADJACENT pairs, paper §4) choosing at each step the merge minimizing
Ward's within-cluster variance increase ``delta_sigma(C1,C2) = (1/n)
* |C1||C2|/(|C1|+|C2|) * r^2_{C1C2}``.  After a merge the affected
delta_sigmas are recomputed exactly from the maintained community
probability vectors ``P^t_C = (|C1| P^t_{C1} + |C2| P^t_{C2}) /
(|C1|+|C2|)`` (paper Theorem 3; the paper's Lance-Williams shortcut,
Theorem 4, is an exact identity for Ward distances, so values are
identical either way).  The dendrogram is cut at the
maximum-modularity prefix (igraph ``as_clustering()`` default).

Distributed shape — DOCUMENTED BOUNDED-GATHER operator, same policy
as ``community_extra.fastgreedy``: the method needs the dense
``P^t`` rows (O(n^2) memory, paper §3.2) and pops ONE globally-best
merge at a time, so it is inherently a single-memory routine; igraph's
implementation is likewise.  The parallel-arc collapse + symmetrize
shuffle runs on the cluster, and the collapsed one-arc table ships to
ONE Ray task via block refs.  ``gather_max_vertices`` (default 6000:
dense P^t = 288 MB float64) is the declared boundary; past it the
default path auto-coarsens via distributed Louvain to a quotient
under the bound (``kernels/coarsen.py``, ``approximated=True`` on the
returned ``CommunityResult``; ``auto_coarsen=False`` restores the
loud raise).

Conventions: self-loops are DROPPED before the walk (the transition
matrix is built on the simple symmetric view; loop-only vertices get
singleton communities); multi-arcs are pre-summed by
``symmetrize_dedup``.  Determinism: merge selection is exact float
argmin with ``(delta_sigma, a, b)`` tie order, ``a < b`` community
ids (min member vid survives a merge).

Oracle: ``tests/test_walktrap.py`` — an independent brute-force
reference (re-computes every adjacent-pair delta_sigma from scratch
each step from the community probability vectors, no Lance-Williams,
no heap) must produce the identical merge sequence; planted-partition
recovery; modularity trace cross-checked against
``kernels/modularity.py``.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.stages.symmetrize import symmetrize_dedup

GATHER_MAX_VERTICES_WT = 6000


def _walktrap_py(
    vids: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    t: int = 4,
) -> tuple[np.ndarray, list[float], int, list[tuple[int, int]]]:
    """Walktrap merges on the canonical one-arc view (src <= dst,
    parallel arcs pre-summed, self-loops excluded by the caller).
    Returns ``(labels (min member vid), q_trace, best_prefix,
    merges)``."""
    n = len(vids)
    a = np.searchsorted(vids, src).astype(np.int64)
    b = np.searchsorted(vids, dst).astype(np.int64)

    deg = np.zeros(n, dtype=np.float64)
    np.add.at(deg, a, w)
    np.add.at(deg, b, w)
    m = float(w.sum())
    if m <= 0:
        raise ValueError("walktrap requires positive total weight")
    two_m = 2.0 * m

    # dense t-step transition probabilities P^t (paper §3.2); rows of
    # zero-degree vertices (loop-only, pre-filtered by caller) cannot
    # occur here
    A = np.zeros((n, n), dtype=np.float64)
    np.add.at(A, (a, b), w)
    np.add.at(A, (b, a), w)
    P = A / deg[:, None]
    Pt = np.linalg.matrix_power(P, t)
    inv_deg = 1.0 / deg

    # community state: probability vectors (row i of `vec` while
    # community i is alive), sizes, intra weight L, degree sum K
    vec = Pt  # mutated in place as communities merge
    size = np.ones(n, dtype=np.int64)
    K = deg.copy()
    L = np.zeros(n, dtype=np.float64)

    # adjacency + inter-community weights (dict-of-dicts, CNM-style)
    nbr: list[dict[int, float]] = [dict() for _ in range(n)]
    for i, j, wij in zip(a, b, w):
        i, j = int(i), int(j)
        nbr[i][j] = nbr[i].get(j, 0.0) + float(wij)
        nbr[j][i] = nbr[j].get(i, 0.0) + float(wij)

    def ds_from_vectors(i: int, j: int) -> float:
        r2 = float(((vec[i] - vec[j]) ** 2 * inv_deg).sum())
        si, sj = float(size[i]), float(size[j])
        return si * sj / (si + sj) * r2 / n

    # lazy min-heap keyed (delta_sigma, a, b); staleness via cur dict
    cur: dict[tuple[int, int], float] = {}
    heap: list[tuple[float, int, int]] = []
    for i in range(n):
        for j in nbr[i]:
            if i < j:
                d = ds_from_vectors(i, j)
                cur[(i, j)] = d
                heap.append((d, i, j))
    heapq.heapify(heap)

    alive = np.ones(n, dtype=bool)
    q0 = float((L / m - (K / two_m) ** 2).sum())
    qs = [q0]
    merges: list[tuple[int, int]] = []

    while heap:
        d, i, j = heapq.heappop(heap)
        if not (alive[i] and alive[j]):
            continue
        live = cur.get((i, j))
        if live is None or d != live:
            continue  # stale entry
        # merge j -> i (i < j: labels stay min member vid)
        merges.append((i, j))
        wij = nbr[i].pop(j)
        del nbr[j][i]
        cur.pop((i, j))
        qs.append(
            qs[-1] + 2.0 * (wij / two_m - (K[i] / two_m) * (K[j] / two_m))
        )
        s1, s2 = float(size[i]), float(size[j])
        s3 = s1 + s2
        vec[i] = (s1 * vec[i] + s2 * vec[j]) / s3  # paper Thm 3
        size[i] += size[j]
        K[i] += K[j]
        L[i] += L[j] + wij
        alive[j] = False
        size[j] = 0
        # fold j's adjacency into i, updating delta_sigma per neighbor
        moved = list(nbr[j].items())
        for k, wk in moved:
            cur.pop((min(j, k), max(j, k)), None)
            del nbr[k][j]
            nbr[i][k] = nbr[i].get(k, 0.0) + wk
            nbr[k][i] = nbr[i][k]
        nbr[j].clear()
        for k in nbr[i]:
            # recompute ds(C3, k) from the maintained community
            # vectors (paper Thm 3).  The Lance-Williams shortcut
            # (paper Thm 4) is an EXACT identity for Ward distances,
            # so recomputation yields the same value — we keep the
            # O(n)-per-pair vector form for a single code path; the
            # dense vectors are already resident for the
            # not-adjacent-to-both case the shortcut cannot cover.
            lo, hi = (i, k) if i < k else (k, i)
            nd = ds_from_vectors(lo, hi)
            cur[(lo, hi)] = nd
            heapq.heappush(heap, (nd, lo, hi))

    best = int(np.argmax(np.array(qs)))
    uf = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        while uf[x] != x:
            uf[x] = uf[uf[x]]
            x = int(uf[x])
        return x

    for i, j in merges[:best]:
        uf[find(j)] = find(i)
    labels = np.array([vids[find(x)] for x in range(n)], dtype=np.int64)
    return labels, qs, best, merges


def _concat_nonempty(tables: list[pa.Table]) -> pa.Table:
    live = [t for t in tables if t.num_rows]
    if not live:
        raise ValueError("bounded-gather input has no rows")
    return pa.concat_tables(live)


@ray.remote
def _walktrap_task(blocks, t: int):
    tbl = _concat_nonempty(ray.get(list(blocks)))
    src = tbl.column("src").to_numpy(zero_copy_only=False)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False)
    w = tbl.column("weight").to_numpy(zero_copy_only=False)
    # one-arc view; self-loops were already dropped by the caller's
    # symmetrize_dedup(keep_self_loops=False)
    keep = src < dst
    src, dst, w = src[keep], dst[keep], w[keep]
    vids = np.unique(np.concatenate([src, dst]))
    labels, qs, best, _ = _walktrap_py(vids, src, dst, w, t=t)
    out = pa.table(
        {"vid": pa.array(vids), "community": pa.array(labels)}
    )
    return out, qs, best


def walktrap(
    edges: ray.data.Dataset,
    t: int = 4,
    gather_max_vertices: int = GATHER_MAX_VERTICES_WT,
    auto_coarsen: bool = True,
) -> tuple[ray.data.Dataset, list[float]]:
    """Walktrap communities over the undirected weighted view of
    ``edges`` (igraph ``community_walktrap(steps=t)`` +
    ``as_clustering()``): Ward agglomeration on t-step random-walk
    distances, dendrogram cut at the maximum-modularity prefix.

    Returns ``(assignment, q_trace)``: assignment rows ``(vid,
    community)`` with community = min member vid.

    Past ``gather_max_vertices`` with ``auto_coarsen=True`` (default)
    the graph is first contracted to its distributed-Louvain quotient
    and Walktrap agglomerates the quotient — the returned
    :class:`~igraph_ray.kernels.coarsen.CommunityResult` then carries
    ``approximated=True`` and ``q_trace`` is the quotient's trace.
    """
    from igraph_ray.kernels.coarsen import (
        CommunityResult,
        gather_labels,
        louvain_quotient,
        project_assignment,
    )

    arcs = symmetrize_dedup(edges, keep_self_loops=False).materialize()
    # vertex bound (dense P^t); distinct src covers all vertices in
    # the symmetric view — a distributed groupby-count, never a
    # driver-side value list
    n_vertices = arcs.select_columns(["src"]).groupby("src").count().count()
    if n_vertices > gather_max_vertices:
        if not auto_coarsen:
            raise NotImplementedError(
                f"walktrap bounded-gather limit: {n_vertices} vertices "
                f"> {gather_max_vertices} (dense P^t is O(n^2)); run "
                "on a quotient/k-core/component subgraph or raise "
                "gather_max_vertices"
            )
        coarse_edges, assignment = louvain_quotient(arcs)
        qassign, qs = walktrap(
            coarse_edges, t, gather_max_vertices, auto_coarsen=False
        )
        out = project_assignment(assignment, gather_labels(qassign))
        return CommunityResult((out, qs), approximated=True)
    refs = arcs.to_arrow_refs()
    out, qs, _best = ray.get(_walktrap_task.remote(refs, t))
    return CommunityResult(
        (ray.data.from_arrow(out), qs), approximated=False
    )
