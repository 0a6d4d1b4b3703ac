"""Deterministic random walks — DeepWalk/node2vec-style corpus
generation (igraph ``igraph_random_walk`` surface, fleet-deterministic
variant).

Each walker advances one hop per superstep; the "random" neighbour
choice is ``splitmix64(walk_id ⊕ step ⊕ seed) mod degree`` over the
dst-ascending adjacency list, so the corpus is bitwise reproducible
across cluster sizes, retries and resumes (the same property the T2
hash sampler provides for row sampling — seeded per-block RNGs would
not survive re-blocking).

Distribution shape: walkers are rows ``(part, walk_id, cur, p0..pL)``
hash-partitioned by their CURRENT vertex; one superstep = one
``groupby(part).map_groups`` that advances every walker in a partition
vectorized (searchsorted into the partition's src-sorted adjacency
view, one gather for the choices).  The adjacency view is derived from
the mmap'd CSR block once per worker process and cached (same pattern
as the kernel chassis' CSR cache).  Per-superstep traffic is one row
per LIVE walker — walks that hit a dangling vertex retire in place.
Walk length L costs L shuffles of the walker table, independent of
graph size; the walk matrix is L+1 int64 columns (fixed width, no
ragged lists in flight).
"""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.partition import (
    GraphMeta,
    _part_with_overrides,
    load_csr,
)
from igraph_ray.utils import hash_int64

_ADJ_CACHE: "collections.OrderedDict[tuple[str, str, int], tuple]" = (
    collections.OrderedDict()
)
_ADJ_CACHE_MAX = 1024


def _adjacency(graph: GraphMeta, part: int):
    """(vids, indptr, nbr, w) — src-sorted, dst-ascending adjacency
    view of one CSR block (arc weights aligned to ``nbr``); built once
    per worker and cached."""
    # keyed by (dir, build_id, part): rebuilding a graph into the same
    # directory mints a new build_id, invalidating stale entries held
    # by long-lived workers (ADVICE r3 medium)
    key = (graph.graph_dir, graph.build_id, part)
    hit = _ADJ_CACHE.get(key)
    if hit is not None:
        _ADJ_CACHE.move_to_end(key)
        return hit
    csr = load_csr(graph, part)
    vids = csr.get("vids", np.empty(0, np.int64))
    src_pos = np.asarray(csr.get("src_pos", np.empty(0, np.int64)))
    dst = np.asarray(csr.get("dst", np.empty(0, np.int64)))
    wts = np.asarray(csr.get("w", np.ones(len(dst))), np.float64)
    order = np.lexsort((dst, src_pos))
    src_sorted = src_pos[order]
    nbr = dst[order]
    w = wts[order] if len(wts) == len(dst) else np.ones(len(nbr))
    indptr = np.searchsorted(src_sorted, np.arange(len(vids) + 1))
    out = (vids, indptr, nbr, w)
    _ADJ_CACHE[key] = out
    while len(_ADJ_CACHE) > _ADJ_CACHE_MAX:
        _ADJ_CACHE.popitem(last=False)
    return out


def walk_choice(
    walk_id: np.ndarray, step: int, seed: int, degree: np.ndarray
) -> np.ndarray:
    """The deterministic neighbour index: splitmix64 over
    (walk_id, step, seed), reduced mod degree (degree > 0)."""
    with np.errstate(over="ignore"):
        step_mix = np.uint64(
            (step * 0xBF58476D1CE4E5B9) % (1 << 64)
        )  # decorrelate id vs step
        mixed = hash_int64(
            walk_id.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ step_mix
            ^ np.uint64(seed)
        )
    return (mixed % degree.astype(np.uint64)).astype(np.int64)


def random_walks(
    graph: GraphMeta,
    starts: np.ndarray | list[int],
    length: int,
    seed: int = 0,
) -> ray.data.Dataset:
    """Rows ``(walk_id, p0..p{length})`` — one walk per start vertex
    (walk_id = index into ``starts``); steps after a dangling vertex
    are -1 (the walk retires there, igraph stuck="return" semantics).
    """
    starts = np.asarray(starts, np.int64)
    hot_v = np.asarray(graph.hot_vids, np.int64)
    hot_p = np.asarray(graph.hot_parts, np.int64)

    def init_part(v: np.ndarray) -> np.ndarray:
        return _part_with_overrides(v, graph.num_parts, hot_v, hot_p)

    cols: dict[str, pa.Array] = {
        "part": pa.array(init_part(starts).astype(np.int32)),
        "walk_id": pa.array(np.arange(len(starts), dtype=np.int64)),
        "cur": pa.array(starts),
        "p0": pa.array(starts),
    }
    for i in range(1, length + 1):
        cols[f"p{i}"] = pa.array(np.full(len(starts), -1, np.int64))
    walkers = ray.data.from_arrow(pa.table(cols)).repartition(
        num_blocks=max(1, graph.num_parts)
    )

    for step in range(1, length + 1):

        def advance(group: pa.Table, _step=step) -> pa.Table:
            part = int(group.column("part")[0].as_py())
            vids, indptr, nbr, _w = _adjacency(graph, part)
            cur = group.column("cur").to_numpy(zero_copy_only=False)
            wid = group.column("walk_id").to_numpy(zero_copy_only=False)
            nxt = np.full(len(cur), -1, np.int64)
            live = cur >= 0
            if live.any() and len(vids):
                pos = np.searchsorted(vids, cur[live])
                pos_c = np.clip(pos, 0, max(0, len(vids) - 1))
                owned = vids[pos_c] == cur[live]
                deg = indptr[pos_c + 1] - indptr[pos_c]
                ok = owned & (deg > 0)
                choice = np.zeros(len(pos_c), np.int64)
                if ok.any():
                    choice[ok] = walk_choice(
                        wid[live][ok], _step, seed, deg[ok]
                    )
                    picked = nbr[indptr[pos_c[ok]] + choice[ok]]
                    tmp = np.full(len(pos_c), -1, np.int64)
                    tmp[ok] = picked
                    nxt[live] = tmp
            out = {}
            for name in group.column_names:
                if name == "part":
                    moved = nxt >= 0
                    newpart = np.where(
                        moved,
                        init_part(np.where(moved, nxt, 0)),
                        group.column("part").to_numpy(
                            zero_copy_only=False
                        ),
                    ).astype(np.int32)
                    out["part"] = pa.array(newpart)
                elif name == "cur":
                    out["cur"] = pa.array(nxt)
                elif name == f"p{_step}":
                    out[name] = pa.array(nxt)
                else:
                    out[name] = group.column(name)
            return pa.table(out)

        walkers = (
            walkers.groupby("part")
            .map_groups(advance, batch_format="pyarrow")
            .materialize()
        )

    keep = ["walk_id"] + [f"p{i}" for i in range(length + 1)]
    return walkers.select_columns(keep)


def _u01_edge(
    walk_id: np.ndarray, cand: np.ndarray, step: int, seed: int
) -> np.ndarray:
    """Deterministic uniform draw in (0,1] per (walk_id, candidate,
    step, seed) — top 53 bits of a splitmix64 mix, +1 so ln() is
    finite."""
    with np.errstate(over="ignore"):
        step_mix = np.uint64((step * 0xBF58476D1CE4E5B9) % (1 << 64))
        mixed = hash_int64(
            walk_id.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ cand.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
            ^ step_mix
            ^ np.uint64(seed)
        )
    return ((mixed >> np.uint64(11)) + np.uint64(1)).astype(
        np.float64
    ) / float(1 << 53)


def _member_fused(vids, indptr, nbr):
    """Sorted uint64 fused (local_row << 32 | nbr) membership keys for
    one adjacency view (cached by _adjacency callers via closure reuse;
    cheap: one shift+or over the arc array)."""
    rows = np.repeat(
        np.arange(len(vids), dtype=np.uint64), np.diff(indptr)
    )
    return (rows << np.uint64(32)) | nbr.astype(np.uint64)


def node2vec_walks(
    graph: GraphMeta,
    starts: np.ndarray | list[int],
    length: int,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 0,
    weighted: bool = False,
) -> ray.data.Dataset:
    """Second-order biased walks — node2vec (Grover–Leskovec, KDD
    2016), deterministic variant: step 1 is uniform
    (``walk_choice``); every later step weights each candidate x of
    cur (walk ... prev → cur → x) by 1/p if x == prev, 1 if
    x ∈ N(prev), else 1/q, and selects by the Efraimidis–Spirakis
    weighted-max rule (per-candidate splitmix64 draw u ∈ (0,1],
    key = ln(u)/w, argmax) — exact weighted sampling whose pick
    depends only on (walk_id, step, candidate, seed), hence bitwise
    reproducible across cluster shapes, retries and resumes (same
    determinism contract as ``random_walks``).

    Distribution shape (3 supersteps per hop):
    (A) walkers route to cur's partition and expand one row per
    neighbour of cur — the Σdeg(cur) fan-out every node2vec
    implementation pays (alias tables pay it in preprocessing);
    (B) candidate rows route to PREV's partition where
    x ∈ N(prev) resolves vectorized against sorted fused
    (local_row << 32 | nbr) keys — exact under a documented
    vid < 2^32 bound (raises beyond);
    (C) rows route to the walker's fixed home partition for the
    weighted pick and the walk-matrix merge — the walk matrix itself
    only ever travels through this one shuffle.
    ``weighted=False`` (default) ignores arc weights (igraph
    ``random_walk`` surface — step 1 via ``walk_choice``);
    ``weighted=True`` multiplies every candidate's bias by its arc
    weight (the full node2vec transition) and samples step 1
    weight-proportionally through the same Efraimidis–Spirakis pick.
    Dangling vertices retire the walk in place (-1 tail).
    """
    starts = np.asarray(starts, np.int64)
    hot_v = np.asarray(graph.hot_vids, np.int64)
    hot_p = np.asarray(graph.hot_parts, np.int64)
    num_parts = graph.num_parts
    inv_p, inv_q = 1.0 / p, 1.0 / q

    def vpart(v: np.ndarray) -> np.ndarray:
        return _part_with_overrides(v, num_parts, hot_v, hot_p)

    def wpart(wid: np.ndarray) -> np.ndarray:
        return (hash_int64(wid) % np.uint64(num_parts)).astype(np.int32)

    n_walks = len(starts)
    cols: dict[str, pa.Array] = {
        "home": pa.array(wpart(np.arange(n_walks, dtype=np.int64))),
        "walk_id": pa.array(np.arange(n_walks, dtype=np.int64)),
        "prev": pa.array(np.full(n_walks, -1, np.int64)),
        "cur": pa.array(starts),
        "p0": pa.array(starts),
    }
    for i in range(1, length + 1):
        cols[f"p{i}"] = pa.array(np.full(n_walks, -1, np.int64))
    walkers = ray.data.from_arrow(pa.table(cols)).repartition(
        num_blocks=max(1, num_parts)
    )

    for step in range(1, length + 1):

        def probe_rows(batch: pa.Table) -> pa.Table:
            cur = batch.column("cur").to_numpy(zero_copy_only=False)
            live = cur >= 0
            return pa.table(
                {
                    "gpart": pa.array(
                        vpart(np.where(live, cur, 0))[live].astype(np.int32)
                    ),
                    "walk_id": pa.array(
                        batch.column("walk_id").to_numpy(
                            zero_copy_only=False
                        )[live]
                    ),
                    "prev": pa.array(
                        batch.column("prev").to_numpy(
                            zero_copy_only=False
                        )[live]
                    ),
                    "cand": pa.array(cur[live]),  # cur rides in "cand"
                    "bias": pa.array(np.zeros(int(live.sum()))),
                }
            )

        probes = walkers.map_batches(
            probe_rows, batch_format="pyarrow", zero_copy_batch=True
        )

        def expand(group: pa.Table, _step=step) -> pa.Table:
            part = int(group.column("gpart")[0].as_py())
            vids, indptr, nbr, warc = _adjacency(graph, part)
            if len(vids) and int(vids.max()) >= (1 << 32):
                raise NotImplementedError(
                    "node2vec membership fuse requires vid < 2^32"
                )
            cur = group.column("cand").to_numpy(zero_copy_only=False)
            wid = group.column("walk_id").to_numpy(zero_copy_only=False)
            prev = group.column("prev").to_numpy(zero_copy_only=False)
            n = len(cur)
            deg = np.zeros(n, np.int64)
            base = np.zeros(n, np.int64)
            if len(vids):
                pos = np.searchsorted(vids, cur)
                pos_c = np.clip(pos, 0, max(0, len(vids) - 1))
                owned = vids[pos_c] == cur
                deg = np.where(
                    owned, indptr[pos_c + 1] - indptr[pos_c], 0
                ).astype(np.int64)
                base = indptr[pos_c].astype(np.int64)
            ok = deg > 0
            if _step == 1 and not weighted:
                picked = np.full(n, -1, np.int64)
                if ok.any():
                    choice = walk_choice(wid[ok], _step, seed, deg[ok])
                    picked[ok] = nbr[base[ok] + choice]
                m = picked >= 0
                return pa.table(
                    {
                        "gpart": pa.array(wpart(wid[m])),
                        "walk_id": pa.array(wid[m]),
                        "prev": pa.array(prev[m]),
                        "cand": pa.array(picked[m]),
                        "bias": pa.array(np.ones(int(m.sum()))),
                    }
                )
            reps = deg[ok]
            widr = np.repeat(wid[ok], reps)
            prevr = np.repeat(prev[ok], reps)
            total = int(reps.sum())
            offs = np.repeat(base[ok], reps) + (
                np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
            )
            cand = nbr[offs]
            wcol = warc[offs] if weighted else np.full(total, np.nan)
            if _step == 1:
                # weighted first hop: every candidate straight to the
                # walker's home with bias = arc weight (ES pick there)
                return pa.table(
                    {
                        "gpart": pa.array(wpart(widr)),
                        "walk_id": pa.array(widr),
                        "prev": pa.array(prevr),
                        "cand": pa.array(cand),
                        "bias": pa.array(wcol),
                    }
                )
            return pa.table(
                {
                    "gpart": pa.array(vpart(prevr).astype(np.int32)),
                    "walk_id": pa.array(widr),
                    "prev": pa.array(prevr),
                    "cand": pa.array(cand),
                    "bias": pa.array(wcol),
                }
            )

        staged = probes.groupby("gpart").map_groups(
            expand, batch_format="pyarrow"
        )

        if step > 1:

            def membership(group: pa.Table) -> pa.Table:
                part = int(group.column("gpart")[0].as_py())
                vids, indptr, nbr, _w = _adjacency(graph, part)
                wid = group.column("walk_id").to_numpy(zero_copy_only=False)
                cand = group.column("cand").to_numpy(zero_copy_only=False)
                prev = group.column("prev").to_numpy(zero_copy_only=False)
                warc_in = group.column("bias").to_numpy(
                    zero_copy_only=False
                )
                bias = np.full(len(wid), inv_q)
                if len(vids):
                    fused = _member_fused(vids, indptr, nbr)
                    pos = np.searchsorted(vids, prev)
                    pos_c = np.clip(pos, 0, max(0, len(vids) - 1))
                    owned = vids[pos_c] == prev
                    qk = (pos_c.astype(np.uint64) << np.uint64(32)) | (
                        cand.astype(np.uint64)
                    )
                    at = np.searchsorted(fused, qk)
                    at_c = np.clip(at, 0, max(0, len(fused) - 1))
                    member = owned & (len(fused) > 0) & (
                        fused[at_c] == qk
                    )
                    bias = np.where(member, 1.0, bias)
                bias = np.where(cand == prev, inv_p, bias)
                if weighted:
                    bias = bias * warc_in
                return pa.table(
                    {
                        "gpart": pa.array(wpart(wid)),
                        "walk_id": pa.array(wid),
                        "prev": pa.array(prev),
                        "cand": pa.array(cand),
                        "bias": pa.array(bias),
                    }
                )

            staged = staged.groupby("gpart").map_groups(
                membership, batch_format="pyarrow"
            )

        # --- C: weighted pick at the walker's home, then a
        # broadcast merge (picks are O(#walkers) rows — the start set is
        # a user-chosen sample, same bound as the betweenness pivots;
        # for full-graph corpora swap in the hash-join merge)
        choice = staged

        def select(group: pa.Table, _step=step) -> pa.Table:
            wid = group.column("walk_id").to_numpy(zero_copy_only=False)
            cand = group.column("cand").to_numpy(zero_copy_only=False)
            bias = group.column("bias").to_numpy(zero_copy_only=False)
            # Efraimidis–Spirakis weighted pick: per-candidate
            # independent draw u ∈ (0,1], key = ln(u)/w, take the max
            # key (ties → smallest cand).  Each key depends only on
            # (walk_id, step, cand, seed), so the pick is invariant to
            # grouping/partitioning — a shared-cumsum rule would not be
            # (float comparisons shift with the segment base).
            key = np.log(_u01_edge(wid, cand, _step, seed)) / bias
            order = np.lexsort((-cand, key, wid))
            wid, cand, key = wid[order], cand[order], key[order]
            boundary = np.empty(len(wid), dtype=bool)
            if len(wid):
                boundary[0] = True
                boundary[1:] = wid[1:] != wid[:-1]
            seg = np.flatnonzero(boundary)
            seg_end = np.append(seg[1:], len(wid)) - 1  # max-key row
            return pa.table(
                {
                    "walk_id": pa.array(wid[seg_end]),
                    "nxt": pa.array(cand[seg_end]),
                }
            )

        picks = choice.groupby("gpart").map_groups(
            select, batch_format="pyarrow"
        )
        ptbl = pa.concat_tables(
            picks.iter_batches(batch_format="pyarrow", batch_size=None)
        )
        pwid = ptbl.column("walk_id").to_numpy(zero_copy_only=False)
        pnxt = ptbl.column("nxt").to_numpy(zero_copy_only=False)
        porder = np.argsort(pwid)
        pwid, pnxt = pwid[porder], pnxt[porder]
        pref = ray.put((pwid, pnxt))

        def merge(batch: pa.Table, _step=step, _ref=pref) -> pa.Table:
            mw, mn = ray.get(_ref)
            wid = batch.column("walk_id").to_numpy(zero_copy_only=False)
            cur = batch.column("cur").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(mw, wid)
            pos_c = np.clip(pos, 0, max(0, len(mw) - 1))
            hit = (len(mw) > 0) & (mw[pos_c] == wid)
            nxt = np.where(hit, mn[pos_c], -1)
            out = {}
            for name in batch.column_names:
                if name == "prev":
                    out[name] = pa.array(np.where(nxt >= 0, cur, -1))
                elif name == "cur":
                    out[name] = pa.array(nxt)
                elif name == f"p{_step}":
                    out[name] = pa.array(nxt)
                else:
                    out[name] = batch.column(name)
            return pa.table(out)

        walkers = walkers.map_batches(
            merge, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    keep = ["walk_id"] + [f"p{i}" for i in range(length + 1)]
    return walkers.select_columns(keep)
