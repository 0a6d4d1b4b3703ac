"""Grouped top-k: the per-group ROW_NUMBER ≤ k window surface.

Two-level shape that never sorts the full table: each batch keeps at
most k rows per group map-side (a lexsort over just the batch), so the
single groupby shuffle carries O(groups × k × batches_touching_group)
rows; the per-group merge then re-ranks the ≤ k·B survivors.  At 100 TB
the shuffle volume is bounded by k × groups, not the input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _rank_within(
    key: np.ndarray, val: np.ndarray, tie: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Sort by (key asc, val desc, tie asc); return (order, 1-based rank
    within each key segment)."""
    order = np.lexsort((tie, -val, key))
    k_s = key[order]
    n = len(k_s)
    new = np.empty(n, dtype=bool)
    if n:
        new[0] = True
        new[1:] = k_s[1:] != k_s[:-1]
    idx = np.arange(n)
    seg = np.maximum.accumulate(np.where(new, idx, 0))
    return order, idx - seg + 1


def topk_per_group(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    tie_col: str,
    k: int,
    keep_cols: tuple[str, ...] = (),
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(group, rank, value, tie, *keep) — the k rows with the greatest
    ``value_col`` per ``group_col`` (ties toward the smallest
    ``tie_col``; the (value desc, tie asc) order must be unique per
    group for a deterministic result).  ``rank`` is 1-based.

    Int64 group/value/tie columns; ``keep_cols`` pass through.
    """
    from igraph_ray.utils import hash_int64

    cols = [group_col, value_col, tie_col, *keep_cols]
    if num_parts is None:
        # size by the input row count — an upper bound on survivors
        num_parts = int(
            max(2, min(256, -(-max(1, ds.count()) // 500_000)))
        )
    np_parts = np.uint64(num_parts)

    def local(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        t = batch.column(tie_col).to_numpy(zero_copy_only=False)
        order, rank = _rank_within(
            g.astype(np.int64), v.astype(np.int64), t.astype(np.int64)
        )
        keep = order[rank <= k]
        out = batch.select(cols).take(pa.array(keep.astype(np.int64)))
        hp = (
            hash_int64(
                out.column(group_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            % np_parts
        ).astype(np.int32)
        return out.append_column("hpart", pa.array(hp))

    pruned = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        g = group.column(group_col).to_numpy(zero_copy_only=False)
        v = group.column(value_col).to_numpy(zero_copy_only=False)
        t = group.column(tie_col).to_numpy(zero_copy_only=False)
        order, rank = _rank_within(
            g.astype(np.int64), v.astype(np.int64), t.astype(np.int64)
        )
        keep = rank <= k
        out = group.take(pa.array(order[keep].astype(np.int64)))
        out = out.append_column("rank", pa.array(rank[keep].astype(np.int64)))
        return out.drop_columns(["hpart"])

    return pruned.groupby("hpart").map_groups(merge, batch_format="pyarrow")
