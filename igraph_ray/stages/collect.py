"""Ordered per-key collection — the ``string_agg(x, sep ORDER BY ...)``
/ ``collect_list`` surface (event journeys, per-doc token sequences).

Ray-Data shape: ONE hash shuffle on the key
(``groupby(hpart).map_groups``); inside each partition a numpy lexsort
by (key, ts, tie) orders every key's rows, per-key ``ListArray``
re-offsetting + ``pc.binary_join`` concatenates — no per-key Python
call (the same segmented-join pattern as paragraph reassembly).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.utils import hash_int64


def _np_parts(n_rows: int) -> int:
    return int(max(2, min(256, math.ceil(max(1, n_rows) / 500_000))))


def collect_ordered(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    tie_col: str,
    val_col: str,
    sep: str = ">",
    limit: int | None = None,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """One row per key: ``(key, journey [vals joined by sep in
    (ts, tie) order], n_events)``.  ``limit`` keeps only each key's
    first ``limit`` values (the SQL twin filters by a ROW_NUMBER
    bound); ``n_events`` counts ALL the key's rows either way.
    Timestamps may be Arrow timestamp[us] or int64."""
    if num_parts is None:
        num_parts = _np_parts(ds.count())
    np_parts = np.uint64(num_parts)

    def tag(batch: pa.Table) -> pa.Table:
        k = (
            batch.column(key_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        t = batch.column(ts_col).to_numpy(zero_copy_only=False)
        t = t.astype("datetime64[us]").astype(np.int64) if np.issubdtype(
            t.dtype, np.datetime64
        ) else t.astype(np.int64)
        return pa.table(
            {
                "hpart": pa.array(
                    (hash_int64(k) % np_parts).astype(np.int32)
                ),
                "k": pa.array(k),
                "t": pa.array(t),
                "tie": pa.array(
                    batch.column(tie_col)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                "v": batch.column(val_col),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                "journey": pa.array([], pa.string()),
                "n_events": pa.array([], pa.int64()),
            }
        )
        n = group.num_rows
        if n == 0:
            return empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        tie = group.column("tie").to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, t, k))
        k_s = k[order]
        v_s = group.column("v").combine_chunks().take(
            pa.array(order.astype(np.int64))
        )
        boundary = np.empty(n, dtype=bool)
        boundary[0] = True
        boundary[1:] = k_s[1:] != k_s[:-1]
        seg = np.cumsum(boundary) - 1
        n_keys = int(seg[-1]) + 1
        totals = np.bincount(seg, minlength=n_keys)
        if limit is not None:
            idx = np.arange(n)
            seg_start = np.maximum.accumulate(
                np.where(boundary, idx, 0)
            )
            keep = (idx - seg_start) < limit
            v_s = v_s.filter(pa.array(keep))
            counts = np.bincount(seg[keep], minlength=n_keys)
        else:
            counts = totals
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), v_s
        )
        return pa.table(
            {
                key_col: pa.array(k_s[np.flatnonzero(boundary)]),
                "journey": pc.binary_join(lists, sep),
                "n_events": pa.array(totals.astype(np.int64)),
            }
        )

    return tagged.groupby("hpart").map_groups(merge, batch_format="pyarrow")
