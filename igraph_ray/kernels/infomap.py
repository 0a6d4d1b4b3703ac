"""Infomap two-level community detection (Rosvall & Bergström 2008,
"Maps of random walks on complex networks reveal community
structure") — the igraph ``community_infomap`` surface for undirected
graphs.

The map equation for a partition M of an undirected weighted graph
(stationary visit rates ``p_i = k_i / 2m``, module exit rates
``q_m = cut(m) / 2m``) in its expanded form (paper SI, with
``plogp(x) = x log2 x``)::

    L(M) = plogp(q) - 2 * sum_m plogp(q_m)
         + sum_m plogp(q_m + p_m) - sum_i plogp(p_i)

with ``q = sum_m q_m``, ``p_m = sum_{i in m} p_i``.  The last term is
partition-independent but kept so ``L`` equals the true per-step
description length in bits.

Optimization is the Louvain-style core loop the Infomap method uses:
deterministic sequential passes moving one vertex at a time into the
neighboring module with the best (most negative) exact ``delta L``,
then coarsening modules into supervertices and repeating until a full
pass makes no move.  Moves are accepted only when ``delta L <
-1e-12``; ties break on smallest target module id, so the result is
deterministic.

Distributed shape — DOCUMENTED BOUNDED-GATHER operator (same policy
as ``community_extra.fastgreedy``): vertex-at-a-time local moves over
a global objective are inherently sequential.  The parallel-arc
collapse + symmetrize shuffle runs on the cluster; the collapsed
one-arc table ships to ONE Ray task via block refs.
``gather_max_arcs`` (default 20M) is the declared boundary; at 100-TB
scale run it on a quotient / component subgraph (e.g. refine a
Louvain level), exactly as igraph positions the method.

Oracle: ``tests/test_infomap.py`` — every accepted move's incremental
``delta L`` is validated against a from-scratch recomputation of the
map equation; the final partition is verified to be a local optimum
under single-vertex moves; planted partitions are recovered; codelength
sanity (L(final) <= L(singletons), L >= entropy lower bound).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.stages.symmetrize import symmetrize_dedup

GATHER_MAX_ARCS_IM = 20_000_000


def _plogp(x: float) -> float:
    return x * np.log2(x) if x > 0.0 else 0.0


def map_equation(
    p: np.ndarray, module: np.ndarray, adj: list[dict[int, float]], two_m: float
) -> float:
    """From-scratch map equation for a labelling (test oracle +
    init); ``adj`` is the loop-free neighbor dict per vertex with raw
    edge weights."""
    mods = np.unique(module)
    qm = {int(c): 0.0 for c in mods}
    pm = {int(c): 0.0 for c in mods}
    for i in range(len(p)):
        pm[int(module[i])] += p[i]
        for j, w in adj[i].items():
            if module[j] != module[i]:
                qm[int(module[i])] += w / two_m
    q = sum(qm.values())
    L = _plogp(q)
    for c in qm:
        L -= 2.0 * _plogp(qm[c])
        L += _plogp(qm[c] + pm[c])
    L -= float(sum(_plogp(x) for x in p))
    return L


def _infomap_level(
    n: int,
    adj: list[dict[int, float]],
    p: np.ndarray,
    two_m: float,
) -> np.ndarray:
    """One coarsening level: deterministic local moves until a full
    pass makes none.  Returns module id per vertex (module ids are
    vertex indices of some member)."""
    module = np.arange(n, dtype=np.int64)
    # per-module aggregates
    p_mod = p.copy()
    q_mod = np.array(
        [sum(w for j, w in adj[i].items() if j != i) / two_m for i in range(n)]
    )
    q_tot = float(q_mod.sum())

    def delta_L(
        qa_new: float, qb_new: float, pa_new: float, pb_new: float,
        qa: float, qb: float, pa: float, pb: float, q_new: float, q_old: float,
    ) -> float:
        d = _plogp(q_new) - _plogp(q_old)
        d -= 2.0 * (_plogp(qa_new) + _plogp(qb_new) - _plogp(qa) - _plogp(qb))
        d += (
            _plogp(qa_new + pa_new)
            + _plogp(qb_new + pb_new)
            - _plogp(qa + pa)
            - _plogp(qb + pb)
        )
        return d

    improved = True
    while improved:
        improved = False
        for v in range(n):
            a = int(module[v])
            # weight from v to each neighboring module (loops excluded)
            w_to: dict[int, float] = {}
            for j, w in adj[v].items():
                if j != v:
                    w_to[int(module[j])] = w_to.get(int(module[j]), 0.0) + w
            if not w_to:
                continue
            w_va = w_to.get(a, 0.0)
            pv = float(p[v])
            kv_out = sum(w_to.values())  # total non-loop weight at v
            # removing v from a: exit of a loses v's external weight
            # and gains the now-external weight to remaining members
            qa_new = float(q_mod[a]) - (kv_out - w_va) / two_m + w_va / two_m
            pa_new = float(p_mod[a]) - pv
            if pa_new <= 1e-15:
                qa_new = 0.0
            best = (0.0, a)
            for b, w_vb in sorted(w_to.items()):
                if b == a:
                    continue
                qb_new = float(q_mod[b]) + (kv_out - w_vb) / two_m - w_vb / two_m
                pb_new = float(p_mod[b]) + pv
                q_new = q_tot + (qa_new - float(q_mod[a])) + (
                    qb_new - float(q_mod[b])
                )
                d = delta_L(
                    qa_new, qb_new, pa_new, pb_new,
                    float(q_mod[a]), float(q_mod[b]),
                    float(p_mod[a]), float(p_mod[b]),
                    q_new, q_tot,
                )
                if d < best[0] - 1e-12 or (
                    abs(d - best[0]) <= 1e-12 and best[1] != a and b < best[1]
                ):
                    best = (d, b)
            if best[1] != a and best[0] < -1e-12:
                b = best[1]
                w_vb = w_to.get(b, 0.0)
                qb_new = float(q_mod[b]) + (kv_out - w_vb) / two_m - w_vb / two_m
                q_tot += (qa_new - float(q_mod[a])) + (qb_new - float(q_mod[b]))
                q_mod[a] = qa_new
                q_mod[b] = qb_new
                p_mod[a] -= pv
                p_mod[b] += pv
                module[v] = b
                improved = True
    return module


def _infomap_py(
    vids: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
) -> tuple[np.ndarray, float, float]:
    """Full multi-level Infomap on the canonical one-arc view
    (src <= dst, parallel arcs pre-summed).  Returns ``(labels (min
    member vid), codelength, singleton_codelength)``."""
    n = len(vids)
    a = np.searchsorted(vids, src).astype(np.int64)
    b = np.searchsorted(vids, dst).astype(np.int64)
    deg = np.zeros(n, dtype=np.float64)
    loop = a == b
    np.add.at(deg, a, np.where(loop, 2.0 * w, w))
    np.add.at(deg, b[~loop], w[~loop])
    m = float(w.sum())
    if m <= 0:
        raise ValueError("infomap requires positive total weight")
    two_m = 2.0 * m
    p = deg / two_m

    # current coarse graph: vertex -> original member set via labels
    labels = np.arange(n, dtype=np.int64)  # label = index of rep vertex
    cur_adj: list[dict[int, float]] = [dict() for _ in range(n)]
    for i, j, wij in zip(a, b, w):
        i, j = int(i), int(j)
        if i == j:
            cur_adj[i][i] = cur_adj[i].get(i, 0.0) + float(wij)
        else:
            cur_adj[i][j] = cur_adj[i].get(j, 0.0) + float(wij)
            cur_adj[j][i] = cur_adj[j].get(i, 0.0) + float(wij)
    cur_p = p.copy()
    orig_adj = [dict(d) for d in cur_adj]
    L_single = map_equation(p, np.arange(n), orig_adj, two_m)

    while True:
        module = _infomap_level(len(cur_p), cur_adj, cur_p, two_m)
        reps = np.unique(module)
        if len(reps) == len(cur_p):
            break  # no move happened at this level
        # map original labels through this level's assignment
        remap = np.full(len(cur_p), -1, dtype=np.int64)
        remap[reps] = np.arange(len(reps))
        labels = remap[module[labels]]
        # coarsen: supervertex per module
        new_adj: list[dict[int, float]] = [dict() for _ in range(len(reps))]
        new_p = np.zeros(len(reps), dtype=np.float64)
        for i in range(len(cur_p)):
            ci = int(remap[module[i]])
            new_p[ci] += cur_p[i]
            for j, wij in cur_adj[i].items():
                cj = int(remap[module[j]])
                if i == j:
                    new_adj[ci][ci] = new_adj[ci].get(ci, 0.0) + wij
                elif ci == cj:
                    if i < j:
                        new_adj[ci][ci] = new_adj[ci].get(ci, 0.0) + wij
                else:
                    new_adj[ci][cj] = new_adj[ci].get(cj, 0.0) + wij
        cur_adj = new_adj
        cur_p = new_p

    # final codelength must be evaluated on ORIGINAL vertices: the
    # within-module entropy term sums plogp over original visit
    # rates, which coarse supervertex rates cannot reproduce
    L = map_equation(p, labels, orig_adj, two_m)
    # labels currently index coarse vertices; emit min member vid
    out = np.empty(n, dtype=np.int64)
    min_member = {}
    for i in range(n):
        c = int(labels[i])
        if c not in min_member or vids[i] < min_member[c]:
            min_member[c] = int(vids[i])
    for i in range(n):
        out[i] = min_member[int(labels[i])]
    return out, float(L), float(L_single)


def _concat_nonempty(tables: list[pa.Table]) -> pa.Table:
    live = [t for t in tables if t.num_rows]
    if not live:
        raise ValueError("bounded-gather input has no rows")
    return pa.concat_tables(live)


@ray.remote
def _infomap_task(blocks):
    tbl = _concat_nonempty(ray.get(list(blocks)))
    src = tbl.column("src").to_numpy(zero_copy_only=False)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False)
    w = tbl.column("weight").to_numpy(zero_copy_only=False)
    keep = src <= dst  # one-arc view of the symmetric table
    src, dst, w = src[keep], dst[keep], w[keep]
    vids = np.unique(np.concatenate([src, dst]))
    labels, L, L0 = _infomap_py(vids, src, dst, w)
    out = pa.table({"vid": pa.array(vids), "community": pa.array(labels)})
    return out, L, L0


def infomap(
    edges: ray.data.Dataset,
    gather_max_arcs: int = GATHER_MAX_ARCS_IM,
) -> tuple[ray.data.Dataset, float, float]:
    """Infomap communities over the undirected weighted view of
    ``edges`` (igraph ``community_infomap``): two-level map-equation
    minimization by deterministic Louvain-style local moves with
    module coarsening.

    Returns ``(assignment, codelength_bits, singleton_codelength)``;
    assignment rows ``(vid, community)`` with community = min member
    vid.
    """
    arcs = symmetrize_dedup(edges, keep_self_loops=True).materialize()
    n_arcs = arcs.count()
    if n_arcs > gather_max_arcs:
        raise NotImplementedError(
            f"infomap bounded-gather limit: {n_arcs} arcs > "
            f"{gather_max_arcs}; run on a quotient/component subgraph "
            "or raise gather_max_arcs"
        )
    refs = arcs.to_arrow_refs()
    out, L, L0 = ray.get(_infomap_task.remote(refs))
    return ray.data.from_arrow(out), L, L0
