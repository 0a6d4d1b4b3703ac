"""Global ordered prefix sum (exclusive scan) — the
``SUM(x) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING AND 1
PRECEDING)`` window surface over a TOTAL order (unlike
``window.running_agg``, which scans per key).

Ray-Data shape — the classic two-phase distributed scan:

1. ``Dataset.sort(order_cols)`` range-partitions the data into blocks
   of disjoint (order-cols) ranges.
2. Pass A (map-only over the materialized sorted blocks): each block
   emits ONE row — its first order-key (the block's identity; the
   tiebreaker column makes it unique even when equal keys straddle a
   block boundary) and its value sum.
3. The driver orders those P rows and computes each block's exclusive
   base offset (a P-element cumsum — trivially small).
4. Pass B (map-only over the same blocks): per-row scan = block base
   + within-block exclusive cumsum.  No shuffle beyond the sort.

``val_col`` must be int64 (exact, order-insensitive partial sums).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def exclusive_scan(
    ds: ray.data.Dataset,
    order_cols: tuple[str, str],
    val_col: str,
) -> ray.data.Dataset:
    """Append ``scan`` = sum of ``val_col`` over all rows strictly
    before this row in ``order_cols`` order (the pair must be a unique
    total order: (key, tiebreaker))."""
    key_col, tie_col = order_cols
    sorted_ds = ds.sort(list(order_cols)).materialize()

    def block_stat(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "k0": pa.array([], pa.int64()),
                    "t0": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        t = batch.column(tie_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        v = batch.column(val_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "k0": pa.array([int(k[0])]),
                "t0": pa.array([int(t[0])]),
                "s": pa.array([int(v.sum())]),
            }
        )

    stats = sorted_ds.map_batches(
        block_stat,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    ).take_all()
    stats.sort(key=lambda r: (r["k0"], r["t0"]))
    bases = {}
    acc = 0
    for r in stats:
        bases[(r["k0"], r["t0"])] = acc
        acc += r["s"]

    def add_scan(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("scan", pa.array([], pa.int64()))
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        t = batch.column(tie_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        v = batch.column(val_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        base = bases[(int(k[0]), int(t[0]))]
        local = np.concatenate([[0], np.cumsum(v)[:-1]])
        return batch.append_column(
            "scan", pa.array((base + local).astype(np.int64))
        )

    return sorted_ds.map_batches(
        add_scan,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
