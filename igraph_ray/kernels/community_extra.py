"""Agglomerative / divisive community methods beyond Louvain, Leiden
and LPA (igraph ``community_fastgreedy`` and
``community_edge_betweenness`` surfaces; nx
``greedy_modularity_communities`` / ``girvan_newman`` parity).

Algorithms: Clauset-Newman-Moore greedy modularity agglomeration
(Clauset, Newman, Moore 2004) and Girvan-Newman edge-betweenness
division (Girvan, Newman 2002) with Brandes (2001) betweenness inside.

Distributed shape — DOCUMENTED BOUNDED-GATHER operators, the same
policy as ``kernels/maxflow.py``: both methods are inherently
sequential global loops (CNM pops ONE globally-best merge at a time
from a heap; GN removes ONE globally-max-betweenness edge per step),
so unlike the vertex-program kernels they cannot be expressed as
independent per-partition supersteps.  The heavy lifting that CAN be
distributed is: the parallel-arc collapse + symmetrize shuffle
(``symmetrize_dedup``) runs on the cluster, and only the collapsed
one-arc-per-pair table is shipped to ONE Ray task via block refs
(never materialized on the driver).  ``gather_max_arcs`` is the
declared boundary; igraph's own implementations of both methods are
likewise single-memory routines, and igraph explicitly documents
edge-betweenness clustering as suited to small/medium graphs.  Past
the bound the default path now AUTO-COARSENS (``kernels/coarsen.py``):
distributed Louvain contracts the graph to its community quotient
under the bound, the exact method runs on the quotient, and labels
project back — flagged ``approximated=True`` on the returned
``CommunityResult``.  ``auto_coarsen=False`` restores the loud raise.

Exactness: CNM merge selection is exact float argmax with a
deterministic ``(dq, a, b)`` tie order; GN uses exact integer sigma
counts and float dependencies with a deterministic smallest-``(a,b)``
tie order on the max edge.  Oracle: ``tests/test_community_extra.py``
(nx ``greedy_modularity_communities`` partition parity on
distinct-weight graphs; ``nx.community.girvan_newman`` split parity).
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.stages.symmetrize import symmetrize_dedup

GATHER_MAX_ARCS_CNM = 20_000_000
GATHER_MAX_ARCS_GN = 500_000


def _cnm_py(
    vids: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    resolution: float,
) -> tuple[np.ndarray, list[float], int]:
    """CNM greedy modularity agglomeration on the canonical one-arc
    view (src <= dst, parallel arcs pre-summed).  Returns
    ``(community label per vid  (min member vid), q_after_each_merge
    prefixed by the singleton Q, n_merges_applied_at_best_cut)``."""
    n = len(vids)
    a = np.searchsorted(vids, src)
    b = np.searchsorted(vids, dst)

    # weighted degree (self-loop counts twice) and intra weight
    K = np.zeros(n, dtype=np.float64)
    L = np.zeros(n, dtype=np.float64)  # intra-community edge weight
    self_mask = a == b
    np.add.at(K, a, np.where(self_mask, 2.0 * w, w))
    np.add.at(K, b[~self_mask], w[~self_mask])
    np.add.at(L, a[self_mask], w[self_mask])
    m = float(w.sum())
    if m <= 0:
        raise ValueError("fastgreedy requires positive total weight")

    # between-community weights as dict-of-dicts
    nbr: list[dict[int, float]] = [dict() for _ in range(n)]
    for i, j, wij in zip(a[~self_mask], b[~self_mask], w[~self_mask]):
        i, j = int(i), int(j)
        nbr[i][j] = nbr[i].get(j, 0.0) + float(wij)
        nbr[j][i] = nbr[j].get(i, 0.0) + float(wij)

    gamma = float(resolution)
    two_m = 2.0 * m
    # resolution-1 EXACT-INTEGER mode (integer weights): ΔQ and Q are
    # tracked scaled by 4m² — dq̂ = 4m·w_ij − 2·K_i·K_j, q̂ = 4m·L −
    # K² — all integer-valued float64 (< 2^53 far past this gather
    # bound), so merge decisions, tie-breaks and the best-prefix cut
    # are order-independent exact and the driver's DuckDB twin can
    # replay the whole agglomeration bitwise.  A positive scale is
    # order-isomorphic, so the partition equals the float
    # formulation's up to exact ties (which floats broke arbitrarily).
    exact = gamma == 1.0 and float(w.astype(np.int64).sum()) == m
    scale = 4.0 * m * m if exact else 1.0

    def dq_of(i: int, j: int) -> float:
        if exact:
            return 4.0 * m * nbr[i][j] - 2.0 * K[i] * K[j]
        return nbr[i][j] / m - gamma * K[i] * K[j] / (2.0 * m * m)

    # lazy max-heap keyed (-dq, a, b): stale entries are skipped when
    # their stored dq no longer equals the live pair's current dq
    cur: dict[tuple[int, int], float] = {}
    heap: list[tuple[float, int, int]] = []
    for i in range(n):
        for j in nbr[i]:
            if i < j:
                d = dq_of(i, j)
                cur[(i, j)] = d
                heap.append((-d, i, j))
    heapq.heapify(heap)

    alive = np.ones(n, dtype=bool)
    parent = np.arange(n, dtype=np.int64)
    if exact:
        q0 = float((4.0 * m * L - K * K).sum())
    else:
        q0 = float((L / m - gamma * (K / two_m) ** 2).sum())
    qs = [q0]
    merges: list[tuple[int, int]] = []

    while heap:
        negd, i, j = heapq.heappop(heap)
        if not (alive[i] and alive[j]):
            continue
        live = cur.get((i, j))
        if live is None or -negd != live:
            continue  # stale
        # apply merge j -> i (i < j always, so labels stay min-vid)
        merges.append((i, j))
        qs.append(qs[-1] + live)
        alive[j] = False
        parent[j] = i
        wij = nbr[i].pop(j)
        del nbr[j][i]
        cur.pop((i, j))
        L[i] += L[j] + wij
        K[i] += K[j]
        K[j] = 0.0
        L[j] = 0.0
        # fold j's neighbors into i
        for k, wk in nbr[j].items():
            cur.pop((min(j, k), max(j, k)), None)
            del nbr[k][j]
            nbr[i][k] = nbr[i].get(k, 0.0) + wk
            nbr[k][i] = nbr[i][k]
        nbr[j].clear()
        # refresh dq for every live neighbor of the merged community
        for k in nbr[i]:
            lo, hi = (i, k) if i < k else (k, i)
            d = dq_of(lo, hi)
            cur[(lo, hi)] = d
            heapq.heappush(heap, (-d, lo, hi))

    best = int(np.argmax(np.array(qs)))
    if exact:
        qs = [q / scale for q in qs]  # report in modularity units
    # replay the first `best` merges through a union-find
    uf = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        while uf[x] != x:
            uf[x] = uf[uf[x]]
            x = int(uf[x])
        return x

    for i, j in merges[:best]:
        uf[find(j)] = find(i)
    labels = np.array([vids[find(x)] for x in range(n)], dtype=np.int64)
    return labels, qs, best


def _concat_nonempty(tables: list[pa.Table]) -> pa.Table:
    """Concat gathered blocks, skipping zero-row blocks whose schema
    Ray degrades to empty (the known streaming-executor artifact)."""
    live = [t for t in tables if t.num_rows]
    if not live:
        raise ValueError("bounded-gather input has no rows")
    return pa.concat_tables(live)


@ray.remote
def _cnm_task(blocks, resolution: float):
    tbl = _concat_nonempty(ray.get(list(blocks)))
    src = tbl.column("src").to_numpy(zero_copy_only=False)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False)
    w = tbl.column("weight").to_numpy(zero_copy_only=False)
    keep = src <= dst  # one-arc view of the symmetric table
    src, dst, w = src[keep], dst[keep], w[keep]
    vids = np.unique(np.concatenate([src, dst]))
    labels, qs, best = _cnm_py(vids, src, dst, w, resolution)
    out = pa.table({"vid": pa.array(vids), "community": pa.array(labels)})
    return out, qs, best


def fastgreedy(
    edges: ray.data.Dataset,
    resolution: float = 1.0,
    gather_max_arcs: int = GATHER_MAX_ARCS_CNM,
    auto_coarsen: bool = True,
) -> tuple[ray.data.Dataset, list[float]]:
    """CNM greedy-modularity communities over the undirected weighted
    view of ``edges`` (igraph ``community_fastgreedy`` +
    ``as_clustering()``: the merge dendrogram is cut at the
    maximum-modularity prefix).

    Returns ``(assignment, q_trace)``: assignment rows
    ``(vid, community)`` with community = min member vid; ``q_trace``
    is modularity after each merge (``q_trace[0]`` = singletons).

    Past ``gather_max_arcs`` with ``auto_coarsen=True`` (default) the
    graph is first contracted to its distributed-Louvain quotient and
    CNM agglomerates the quotient — the returned
    :class:`~igraph_ray.kernels.coarsen.CommunityResult` then carries
    ``approximated=True`` and ``q_trace`` is the quotient's trace.
    """
    from igraph_ray.kernels.coarsen import (
        CommunityResult,
        gather_labels,
        louvain_quotient,
        project_assignment,
    )

    arcs = symmetrize_dedup(edges, keep_self_loops=True).materialize()
    n_arcs = arcs.count()
    if n_arcs > gather_max_arcs:
        if not auto_coarsen:
            raise NotImplementedError(
                f"fastgreedy bounded-gather limit: {n_arcs} arcs > "
                f"{gather_max_arcs}; run on a quotient/k-core/"
                "component subgraph or raise gather_max_arcs"
            )
        coarse_edges, assignment = louvain_quotient(arcs)
        qassign, qs = fastgreedy(
            coarse_edges, resolution, gather_max_arcs, auto_coarsen=False
        )
        out = project_assignment(assignment, gather_labels(qassign))
        return CommunityResult((out, qs), approximated=True)
    refs = arcs.to_arrow_refs()
    out, qs, _best = ray.get(_cnm_task.remote(refs, resolution))
    return CommunityResult(
        (ray.data.from_arrow(out), qs), approximated=False
    )


def _brandes_eb(
    n: int, av: np.ndarray, aw: np.ndarray, eid: np.ndarray
) -> np.ndarray:
    """Unweighted edge betweenness (unnormalized, per-direction sums)
    over arcs ``av -> aw`` (both orientations of each edge, ``eid`` =
    undirected edge index).  Level-vectorized Brandes: per source one
    BFS with per-level array ops, then dependency accumulation walking
    levels top-down (no per-vertex Python loop)."""
    m2 = len(av)
    eb = np.zeros(int(eid.max()) + 1 if m2 else 0, dtype=np.float64)
    INF = np.int64(np.iinfo(np.int64).max)
    for s in range(n):
        dist = np.full(n, INF, dtype=np.int64)
        sigma = np.zeros(n, dtype=np.float64)
        dist[s] = 0
        sigma[s] = 1.0
        d = 0
        while True:
            lvl = dist[av] == d
            if not lvl.any():
                break
            heads = aw[lvl]
            fresh = dist[heads] == INF
            if fresh.any():
                dist[heads[fresh]] = d + 1
            nxt = dist[heads] == d + 1
            np.add.at(sigma, heads[nxt], sigma[av[lvl]][nxt])
            d += 1
        delta = np.zeros(n, dtype=np.float64)
        dv, dw = dist[av], dist[aw]
        on_dag = (dw == dv + 1) & (dv != INF) & (dw != INF)
        for lev in range(d - 1, -1, -1):
            sel = on_dag & (dv == lev)
            if not sel.any():
                continue
            c = sigma[av[sel]] / sigma[aw[sel]] * (1.0 + delta[aw[sel]])
            np.add.at(delta, av[sel], c)
            np.add.at(eb, eid[sel], c)
    return eb


def _components_labels(
    n: int, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    uf = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        while uf[x] != x:
            uf[x] = uf[uf[x]]
            x = int(uf[x])
        return x

    for i, j in zip(a, b):
        ri, rj = find(int(i)), find(int(j))
        if ri != rj:
            if ri < rj:
                uf[rj] = ri
            else:
                uf[ri] = rj
    return np.array([find(x) for x in range(n)], dtype=np.int64)


@ray.remote
def _gn_task(blocks, target: int | None, resolution: float):
    tbl = _concat_nonempty(ray.get(list(blocks)))
    src = tbl.column("src").to_numpy(zero_copy_only=False)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False)
    keep = src < dst  # simple graph view; self-loops never split
    src, dst = src[keep], dst[keep]
    vids = np.unique(np.concatenate([src, dst]))
    n = len(vids)
    a0 = np.searchsorted(vids, src)
    b0 = np.searchsorted(vids, dst)
    m = len(a0)

    # unweighted modularity bookkeeping on the ORIGINAL graph
    K = np.zeros(n, dtype=np.float64)
    np.add.at(K, a0, 1.0)
    np.add.at(K, b0, 1.0)

    def modularity(labels: np.ndarray) -> float:
        intra = float((labels[a0] == labels[b0]).sum()) / m
        Kc = np.zeros(n, dtype=np.float64)
        np.add.at(Kc, labels, K)
        return intra - resolution * float(
            ((Kc / (2.0 * m)) ** 2).sum()
        )

    active = np.ones(m, dtype=bool)
    labels = _components_labels(n, a0, b0)
    n_comm = len(np.unique(labels))
    best_q = modularity(labels)
    best_labels = labels
    removal_seq: list[tuple[int, int]] = []

    while active.any():
        if target is not None and n_comm >= target:
            break
        idx = np.flatnonzero(active)
        a, b = a0[idx], b0[idx]
        av = np.concatenate([a, b])
        aw = np.concatenate([b, a])
        eid = np.concatenate(
            [np.arange(len(idx)), np.arange(len(idx))]
        )
        eb = _brandes_eb(n, av, aw, eid)
        # deterministic argmax: max eb, then smallest (a, b)
        mx = eb.max()
        cand = np.flatnonzero(eb == mx)
        pick = cand[np.lexsort((b[cand], a[cand]))[0]]
        removal_seq.append((int(vids[a[pick]]), int(vids[b[pick]])))
        active[idx[pick]] = False
        new_labels = _components_labels(
            n, a0[active], b0[active]
        )
        new_n = len(np.unique(new_labels))
        if new_n > n_comm:
            n_comm = new_n
            labels = new_labels
            q = modularity(labels)
            if target is None and q > best_q:
                best_q = q
                best_labels = labels
    if target is not None:
        best_labels = labels
        best_q = modularity(labels)
    out = pa.table(
        {
            "vid": pa.array(vids),
            "community": pa.array(vids[best_labels]),
        }
    )
    rem = pa.table(
        {
            "a": pa.array([x for x, _ in removal_seq], pa.int64()),
            "b": pa.array([y for _, y in removal_seq], pa.int64()),
        }
    )
    return out, float(best_q), rem


def girvan_newman(
    edges: ray.data.Dataset,
    target_communities: int | None = None,
    resolution: float = 1.0,
    gather_max_arcs: int = GATHER_MAX_ARCS_GN,
    auto_coarsen: bool = True,
) -> tuple[ray.data.Dataset, float, pa.Table]:
    """Girvan-Newman divisive clustering (igraph
    ``community_edge_betweenness``; ``nx.community.girvan_newman``):
    repeatedly remove the globally-max unweighted-edge-betweenness
    edge.  With ``target_communities=None`` the full removal sequence
    runs and the partition with maximum (unweighted) modularity is
    returned (igraph ``as_clustering()``); otherwise splitting stops
    at the first partition with >= target communities.

    Returns ``(assignment (vid, community = min member vid),
    modularity, removal_sequence pa.Table (a, b))``.  O(V * E^2)
    betweenness recomputations — igraph documents the same cost and
    scope (small/medium graphs); the declared gather bound reflects
    it.

    Past ``gather_max_arcs`` with ``auto_coarsen=True`` (default) the
    graph is first contracted to its distributed-Louvain quotient and
    GN splits the quotient (``approximated=True`` on the returned
    :class:`~igraph_ray.kernels.coarsen.CommunityResult`; modularity
    and the removal sequence refer to the quotient).
    """
    from igraph_ray.kernels.coarsen import (
        CommunityResult,
        gather_labels,
        louvain_quotient,
        project_assignment,
    )

    arcs = symmetrize_dedup(edges, keep_self_loops=False).materialize()
    n_arcs = arcs.count()
    if n_arcs > gather_max_arcs:
        if not auto_coarsen:
            raise NotImplementedError(
                f"girvan_newman bounded-gather limit: {n_arcs} arcs > "
                f"{gather_max_arcs}; run on a subgraph or raise "
                "gather_max_arcs"
            )
        coarse_edges, assignment = louvain_quotient(arcs)
        qassign, q, rem = girvan_newman(
            coarse_edges,
            target_communities,
            resolution,
            gather_max_arcs,
            auto_coarsen=False,
        )
        out = project_assignment(assignment, gather_labels(qassign))
        return CommunityResult((out, q, rem), approximated=True)
    refs = arcs.select_columns(["src", "dst"]).to_arrow_refs()
    out, q, rem = ray.get(
        _gn_task.remote(refs, target_communities, resolution)
    )
    return CommunityResult(
        (ray.data.from_arrow(out), q, rem), approximated=False
    )
