"""Range joins: time-band self-join and point-in-interval join — the
two non-equi join shapes (band join / interval join) a data-processing
engine needs beyond equi/as-of joins (reference scope: the SQL surface
``a JOIN b ON a.key=b.key AND b.ts BETWEEN a.ts AND a.ts+Δ`` and
``point.ts BETWEEN iv.start AND iv.end``; oracles in
``__ray_entry__.oracle_sql()['event_pairs_band' /
'orders_events_interval']``).

Ray-Data shape (scale notes):

* Both joins bucket event time into fixed-width bins of the band /
  max-interval width.  A matching pair can then only meet in ONE bin:
  the *right* (later / point) row goes to exactly its own bin, while
  the *left* (earlier / interval) row is replicated into the bounded
  set of bins it can reach (2 for a band join; ``ceil(len/width)+1``
  for intervals).  One ``groupby`` on ``hash(key, bin)`` co-locates
  all candidates — never an all-pairs product, and the shuffle volume
  is ≤ 2× (band) / small-constant× (interval) the input.
* Inside each group everything is a numpy lexsort + ``searchsorted``
  range probe + ``repeat``/``arange`` pair expansion — no per-row
  Python.  Candidate windows are exact for the band join; the
  interval join post-filters candidates on the end bound (vectorized).
* Skew: a hot (key, bin) pair is bounded by the events one key emits
  within one band width; the bin id participates in the hash so a hot
  key's history still spreads over time bins.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.utils import hash_int64


def _np_parts(n_rows: int) -> int:
    return int(max(2, min(256, math.ceil(max(1, n_rows) / 500_000))))


def _ts_int64(col: pa.ChunkedArray) -> np.ndarray:
    arr = col.to_numpy(zero_copy_only=False)
    return arr.astype("datetime64[us]").astype(np.int64) if np.issubdtype(
        arr.dtype, np.datetime64
    ) else arr.astype(np.int64)


def _hpart(key: np.ndarray, bin_: np.ndarray, num_parts: int) -> pa.Array:
    mix = hash_int64(key.astype(np.int64)) ^ hash_int64(
        bin_.astype(np.int64) + np.int64(0x51ED)
    )
    return pa.array((mix % np.uint64(num_parts)).astype(np.int32))


def band_join(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    band_us: int,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Self band join: all ordered pairs of rows sharing ``key_col``
    with ``0 < ts_r - ts_l <= band_us``.

    Output one row per pair: ``(key, l_<id>, r_<id>, dt_us)`` with
    ``l_<id>``/``r_<id>`` the earlier/later row's ``id_col`` and
    ``dt_us = ts_r - ts_l``.  Ties in time still pair when ids differ
    and ``ts_r > ts_l`` fails — i.e. equal timestamps do NOT pair
    (strict band, matching the SQL twin ``b.ts > a.ts``).
    """
    if band_us <= 0:
        raise ValueError("band_us must be positive")
    if num_parts is None:
        num_parts = _np_parts(ds.count())
    band = np.int64(band_us)

    def tag(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        t = _ts_int64(batch.column(ts_col))
        i = batch.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        b = t // band  # bin id (floor; timestamps are non-negative)
        # role 0 = left copy in own bin, 1 = left copy in next bin,
        # 2 = right copy in own bin.  Lefts replicate into bins
        # {b, b+1}; rights stay in bin b — each valid pair meets in
        # exactly the right row's bin.
        n = len(k)
        k3 = np.concatenate([k, k, k])
        t3 = np.concatenate([t, t, t])
        i3 = np.concatenate([i, i, i])
        b3 = np.concatenate([b, b + 1, b])
        role = np.concatenate(
            [
                np.zeros(n, np.int8),
                np.zeros(n, np.int8),
                np.full(n, 2, np.int8),
            ]
        )
        return pa.table(
            {
                "hpart": _hpart(k3, b3, num_parts),
                "k": pa.array(k3),
                "b": pa.array(b3),
                "t": pa.array(t3),
                "i": pa.array(i3),
                "role": pa.array(role),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                f"l_{id_col}": pa.array([], pa.int64()),
                f"r_{id_col}": pa.array([], pa.int64()),
                "dt_us": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        i = group.column("i").to_numpy(zero_copy_only=False)
        role = group.column("role").to_numpy(zero_copy_only=False)
        is_r = role == 2
        # sort lefts and rights by (key, bin, ts, id); pairs only form
        # within an identical (key, bin) run, so probe right runs with
        # searchsorted over fused (key, bin) codes + time bounds.
        lm = ~is_r
        if not lm.any() or not is_r.any():
            return empty
        lo_ = np.lexsort((i[lm], t[lm], b[lm], k[lm]))
        ro_ = np.lexsort((i[is_r], t[is_r], b[is_r], k[is_r]))
        lk, lb, lt, li = (
            k[lm][lo_],
            b[lm][lo_],
            t[lm][lo_],
            i[lm][lo_],
        )
        rk, rb, rt, ri = (
            k[is_r][ro_],
            b[is_r][ro_],
            t[is_r][ro_],
            i[is_r][ro_],
        )
        # fuse (key, bin) into one sortable code via rank over the
        # union so 64-bit fusion never overflows
        both = np.stack(
            [np.concatenate([lk, rk]), np.concatenate([lb, rb])]
        )
        _, inv = np.unique(both.T, axis=0, return_inverse=True)
        lg, rg = inv[: len(lk)], inv[len(lk):]
        # right rows sorted by (group, ts): per-left probe windows via
        # the vectorized per-segment searchsorted below —
        # lower bound = first right with ts > lt (strict),
        # upper bound = last right with ts <= lt + band
        lo = _seg_searchsorted(rt, rg, lt, lg, "right")
        hi = _seg_searchsorted(rt, rg, lt + band, lg, "right")
        cnt = hi - lo
        pos = cnt > 0
        if not pos.any():
            return empty
        reps = cnt[pos]
        l_idx = np.repeat(np.flatnonzero(pos), reps)
        r_idx = (
            np.repeat(lo[pos], reps)
            + np.arange(reps.sum())
            - np.repeat(np.cumsum(reps) - reps, reps)
        )
        out_k = lk[l_idx]
        out_l = li[l_idx]
        out_r = ri[r_idx]
        out_dt = rt[r_idx] - lt[l_idx]
        keep = out_l != out_r  # a row never pairs with itself
        return pa.table(
            {
                key_col: pa.array(out_k[keep]),
                f"l_{id_col}": pa.array(out_l[keep]),
                f"r_{id_col}": pa.array(out_r[keep]),
                "dt_us": pa.array(out_dt[keep]),
            }
        )

    return tagged.groupby("hpart").map_groups(merge, batch_format="pyarrow")


def _seg_searchsorted(
    sorted_vals: np.ndarray,
    val_seg: np.ndarray,
    probes: np.ndarray,
    probe_seg: np.ndarray,
    side: str,
) -> np.ndarray:
    """Vectorized per-segment searchsorted: position of ``probes[i]``
    within the run of ``sorted_vals`` whose segment id equals
    ``probe_seg[i]`` (absolute index).  ``(val_seg, sorted_vals)``
    must be lexicographically sorted.  One global searchsorted over
    ``(segment, value)`` record pairs — no Python loop; probes whose
    segment has no values land on an empty window (lo == hi).
    """
    if len(probes) == 0:
        return np.zeros(0, dtype=np.int64)
    enc_vals = np.rec.fromarrays(
        [val_seg.astype(np.int64), sorted_vals.astype(np.int64)]
    )
    enc_probe = np.rec.fromarrays(
        [probe_seg.astype(np.int64), probes.astype(np.int64)]
    )
    return np.searchsorted(enc_vals, enc_probe, side=side).astype(np.int64)


def interval_join(
    points: ray.data.Dataset,
    intervals: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    point_id_col: str,
    iv_key_col: str,
    iv_start_col: str,
    iv_len_us: int,
    iv_id_col: str,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Point-in-interval join: pair each point row with every interval
    row of the same key whose ``[start, start + iv_len_us)`` window
    contains the point's timestamp (inclusive start, exclusive end).

    All intervals share one fixed length ``iv_len_us`` (the common
    "orders + N days" shape); variable-length intervals bucket by the
    max length with the same replication rule.  Output one row per
    match: ``(key, <point_id>, <iv_id>, offset_us = ts - start)``.
    """
    if iv_len_us <= 0:
        raise ValueError("iv_len_us must be positive")
    if num_parts is None:
        num_parts = _np_parts(points.count() + intervals.count())
    width = np.int64(iv_len_us)

    def tag_points(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        t = _ts_int64(batch.column(ts_col))
        i = batch.column(point_id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        b = t // width
        return pa.table(
            {
                "hpart": _hpart(k, b, num_parts),
                "k": pa.array(k),
                "b": pa.array(b),
                "t": pa.array(t),
                "i": pa.array(i),
                "role": pa.array(np.full(len(k), 2, np.int8)),
            }
        )

    def tag_intervals(batch: pa.Table) -> pa.Table:
        k = batch.column(iv_key_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        s = _ts_int64(batch.column(iv_start_col))
        i = batch.column(iv_id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        # interval [s, s+width) overlaps bins floor(s/width) and
        # floor(s/width)+1 (end exclusive: if s is bin-aligned the
        # second copy can never match, harmless)
        b = s // width
        k2 = np.concatenate([k, k])
        s2 = np.concatenate([s, s])
        i2 = np.concatenate([i, i])
        b2 = np.concatenate([b, b + 1])
        return pa.table(
            {
                "hpart": _hpart(k2, b2, num_parts),
                "k": pa.array(k2),
                "b": pa.array(b2),
                "t": pa.array(s2),
                "i": pa.array(i2),
                "role": pa.array(np.zeros(len(k2), np.int8)),
            }
        )

    tagged = points.map_batches(
        tag_points, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        intervals.map_batches(
            tag_intervals, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def merge(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                point_id_col: pa.array([], pa.int64()),
                iv_id_col: pa.array([], pa.int64()),
                "offset_us": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        i = group.column("i").to_numpy(zero_copy_only=False)
        role = group.column("role").to_numpy(zero_copy_only=False)
        is_p = role == 2
        lm = ~is_p
        if not lm.any() or not is_p.any():
            return empty
        lo_ = np.lexsort((i[lm], t[lm], b[lm], k[lm]))
        po_ = np.lexsort((i[is_p], t[is_p], b[is_p], k[is_p]))
        ik, ib, it, ii = k[lm][lo_], b[lm][lo_], t[lm][lo_], i[lm][lo_]
        pk, pb, pt, pi = (
            k[is_p][po_],
            b[is_p][po_],
            t[is_p][po_],
            i[is_p][po_],
        )
        both = np.stack(
            [np.concatenate([ik, pk]), np.concatenate([ib, pb])]
        )
        _, inv = np.unique(both.T, axis=0, return_inverse=True)
        ig, pg = inv[: len(ik)], inv[len(ik):]
        # intervals with start in (t - width, t] contain t (given end
        # = start + width exclusive): start > t - width AND start <= t
        lo = _seg_searchsorted(it, ig, pt - width, pg, "right")
        hi = _seg_searchsorted(it, ig, pt, pg, "right")
        cnt = hi - lo
        pos = cnt > 0
        if not pos.any():
            return empty
        reps = cnt[pos]
        p_idx = np.repeat(np.flatnonzero(pos), reps)
        v_idx = (
            np.repeat(lo[pos], reps)
            + np.arange(reps.sum())
            - np.repeat(np.cumsum(reps) - reps, reps)
        )
        return pa.table(
            {
                key_col: pa.array(pk[p_idx]),
                point_id_col: pa.array(pi[p_idx]),
                iv_id_col: pa.array(ii[v_idx]),
                "offset_us": pa.array(pt[p_idx] - it[v_idx]),
            }
        )

    return tagged.groupby("hpart").map_groups(merge, batch_format="pyarrow")
