"""Event-sequence analytics: ordered funnels and cohort retention —
the two classic event-stream reports a data-processing engine serves
(SQL twins in ``__ray_entry__.oracle_sql()['funnel_counts' /
'cohort_retention']``).

Ray-Data shape (scale notes):

* Both operators are ONE hash shuffle on the user key
  (``groupby(hpart).map_groups``); a user's whole history must
  co-locate (inherent to per-user sequences).
* ``funnel_counts`` computes the greedy earliest completion chain —
  optimal for existence — with one vectorized per-segment
  searchsorted per funnel step (k tiny passes over the sorted event
  matrix, no per-user Python).
* ``cohort_retention`` derives each user's cohort (first-event
  bucket) and distinct active buckets in one numpy pass, emits one
  row per (user, bucket), and lets a small grouped aggregate produce
  the (cohort, offset) matrix; Ray pre-combines the Sum per block.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from igraph_ray.stages.interval import _seg_searchsorted
from igraph_ray.utils import hash_int64


def _np_parts(n_rows: int) -> int:
    return int(max(2, min(256, math.ceil(max(1, n_rows) / 500_000))))


def _ts_int64(col: pa.ChunkedArray) -> np.ndarray:
    arr = col.to_numpy(zero_copy_only=False)
    return arr.astype("datetime64[us]").astype(np.int64) if np.issubdtype(
        arr.dtype, np.datetime64
    ) else arr.astype(np.int64)


def funnel_counts(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    tie_col: str,
    type_col: str,
    steps: tuple[str, ...],
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Ordered funnel completion: one row per step — ``(step [1-based],
    step_name, n_users)`` where ``n_users`` counts users having events
    ``steps[0] .. steps[i-1]`` in strictly increasing (ts, tie) order
    (the greedy earliest chain decides existence — it is optimal)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if num_parts is None:
        num_parts = _np_parts(ds.count())
    np_parts = np.uint64(num_parts)

    def tag(batch: pa.Table) -> pa.Table:
        k = (
            batch.column(key_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "hpart": pa.array(
                    (hash_int64(k) % np_parts).astype(np.int32)
                ),
                "k": pa.array(k),
                "t": pa.array(_ts_int64(batch.column(ts_col))),
                "tie": pa.array(
                    batch.column(tie_col)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                "typ": batch.column(type_col),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    step_list = list(steps)

    def merge(group: pa.Table) -> pa.Table:
        counts = np.zeros(len(step_list), np.int64)
        n = group.num_rows
        if n:
            k = group.column("k").to_numpy(zero_copy_only=False)
            t = group.column("t").to_numpy(zero_copy_only=False)
            tie = group.column("tie").to_numpy(zero_copy_only=False)
            typ = np.asarray(group.column("typ").to_pylist())
            order = np.lexsort((tie, t, k))
            k, typ = k[order], typ[order]
            # user segment codes 0..U-1 in sorted order
            boundary = np.empty(n, dtype=bool)
            boundary[0] = True
            boundary[1:] = k[1:] != k[:-1]
            seg = np.cumsum(boundary) - 1
            n_users = int(seg[-1]) + 1
            pos = np.arange(n)  # global sorted position = strict order
            # cur[u] = sorted position of the user's chosen event for
            # the previous step (-1 before step 1); alive = still in
            # the funnel
            cur = np.full(n_users, -1, np.int64)
            alive = np.ones(n_users, dtype=bool)
            users = np.arange(n_users)
            for i, s in enumerate(step_list):
                m = typ == s
                vals = pos[m]  # ascending overall
                vseg = seg[m]  # ascending (sorted by user first)
                # first type-s position strictly after cur, per user;
                # lo lands inside [start_u, end_u], so lo < end_u
                # already implies the hit belongs to user u
                lo = _seg_searchsorted(vals, vseg, cur, users, "right")
                hi = np.searchsorted(vseg, users, side="right")
                found = alive & (lo < hi)
                safe = np.clip(lo, 0, max(len(vals) - 1, 0))
                cur = np.where(
                    found, vals[safe] if len(vals) else cur, cur
                )
                alive = found
                counts[i] = int(alive.sum())
                if not alive.any():
                    break
        return pa.table(
            {
                "step": pa.array(
                    np.arange(1, len(step_list) + 1, dtype=np.int64)
                ),
                "step_name": pa.array(step_list, pa.string()),
                "n_users": pa.array(counts),
            }
        )

    partials = tagged.groupby("hpart").map_groups(
        merge, batch_format="pyarrow"
    )
    return partials.groupby(["step", "step_name"]).aggregate(
        Sum("n_users", alias_name="n_users")
    )


def cohort_retention(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    bucket_us: int,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Cohort retention matrix: ``(cohort, offset, n_users)`` — cohort
    = each user's first-event time bucket (``ts // bucket_us``),
    offset = active bucket − cohort; a user counts once per distinct
    active bucket (offset 0 row = cohort size)."""
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    if num_parts is None:
        num_parts = _np_parts(ds.count())
    np_parts = np.uint64(num_parts)
    bus = np.int64(bucket_us)

    def tag(batch: pa.Table) -> pa.Table:
        k = (
            batch.column(key_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "hpart": pa.array(
                    (hash_int64(k) % np_parts).astype(np.int32)
                ),
                "k": pa.array(k),
                "b": pa.array(_ts_int64(batch.column(ts_col)) // bus),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cohort": pa.array([], pa.int64()),
                "offset": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        n = group.num_rows
        if n == 0:
            return empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, k))
        k, b = k[order], b[order]
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = (k[1:] != k[:-1]) | (b[1:] != b[:-1])
        k, b = k[first], b[first]  # distinct (user, bucket), sorted
        boundary = np.empty(len(k), dtype=bool)
        boundary[0] = True
        boundary[1:] = k[1:] != k[:-1]
        seg_start = np.maximum.accumulate(
            np.where(boundary, np.arange(len(k)), 0)
        )
        cohort = b[seg_start]  # each user's min bucket
        return pa.table(
            {
                "cohort": pa.array(cohort),
                "offset": pa.array(b - cohort),
                "n": pa.array(np.ones(len(k), np.int64)),
            }
        )

    return (
        tagged.groupby("hpart")
        .map_groups(merge, batch_format="pyarrow")
        .groupby(["cohort", "offset"])
        .aggregate(Sum("n", alias_name="n_users"))
    )
