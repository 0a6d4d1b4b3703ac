"""General equi-join surface: broadcast join for a small build side,
hash-shuffle join for two large sides.

Scale policy (the same small-side/large-side decision the kernels make
for vid maps, ``stages/vertex_ids.py``):

* ``broadcast_join`` — build side is materialized ONCE, sorted by key,
  put in the object store with ``ray.put``, and probed inside a
  stateful actor pool via ``np.searchsorted`` — zero shuffle of the
  probe stream; the build table is fetched once per actor (plasma
  shared-memory on each node), never per batch.  Correct choice
  whenever the build side fits a worker heap (dimension tables,
  vertex maps).
* ``hash_join`` — both sides hash-partitioned on the key by Ray Data's
  native shuffle join (``Dataset.join``), partition count sized by row
  count.  Correct choice for fact⋈fact joins where neither side can
  be broadcast.

Both produce inner or left joins with int64 keys (the engine's join
keys are always dense ids or TPC-H-style integer keys).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _np_parts(n_rows: int) -> int:
    return int(max(2, min(256, math.ceil(max(1, n_rows) / 500_000))))


def broadcast_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset | pa.Table,
    on: str,
    right_on: str | None = None,
    right_cols: list[str] | None = None,
    how: str = "inner",
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """Join ``left`` to a SMALL ``right`` side broadcast to every actor.

    ``right`` keys must be unique (dimension-table semantics); probe is
    a vectorized binary search.  ``how`` is ``inner`` (drop unmatched
    left rows) or ``left`` (null-fill the right columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r}: only inner/left supported")
    rkey = right_on or on
    if isinstance(right, ray.data.Dataset):
        batches = list(
            right.iter_batches(batch_format="pyarrow", batch_size=None)
        )
        right = (
            pa.concat_tables(batches)
            if batches
            else pa.table({rkey: pa.array([], pa.int64())})
        )
    if right_cols is None:
        right_cols = [c for c in right.column_names if c != rkey]
    right = right.select([rkey, *right_cols]).sort_by(rkey)
    ref = ray.put(right.combine_chunks())

    class Probe:
        def __init__(self):
            t = ray.get(ref)
            self.keys = t.column(rkey).to_numpy(zero_copy_only=False)
            self.tbl = t

        def __call__(self, batch: pa.Table) -> pa.Table:
            k = (
                batch.column(on)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            pos = np.searchsorted(self.keys, k)
            pos_c = np.clip(pos, 0, max(len(self.keys) - 1, 0))
            hit = (
                (self.keys[pos_c] == k)
                if len(self.keys)
                else np.zeros(len(k), dtype=bool)
            )
            if how == "inner":
                keep = np.flatnonzero(hit)
                out = batch.take(pa.array(keep.astype(np.int64)))
                idx = pa.array(pos_c[keep].astype(np.int64))
            else:
                out = batch
                idx = pa.array(pos_c.astype(np.int64), mask=~hit)
            for c in right_cols:
                out = out.append_column(c, self.tbl.column(c).take(idx))
            return out

    return left.map_batches(
        Probe,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def semi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset | pa.Table,
    on: str,
    right_on: str | None = None,
    anti: bool = False,
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """Semi join (keep left rows whose key exists in ``right``) or anti
    join (``anti=True``: keep rows whose key does NOT exist).

    The right side is reduced map-side to its DISTINCT keys before the
    broadcast — the probe set is O(distinct keys), never the right
    table — then each probe batch is one vectorized ``np.isin``-style
    binary search.  For a right key set too big to broadcast, use
    ``hash_join`` + filter (the co-partitioned path); this operator is
    the dimension-filter fast path.
    """
    rkey = right_on or on
    if isinstance(right, ray.data.Dataset):

        def distinct_keys(batch: pa.Table) -> pa.Table:
            k = pc.unique(batch.column(rkey))
            return pa.table({rkey: k})

        right = pa.concat_tables(
            right.map_batches(
                distinct_keys, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        )
    keys = np.unique(
        right.column(rkey).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    ref = ray.put(keys)

    class Filter:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            k = (
                batch.column(on)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            pos = np.searchsorted(self.keys, k)
            pos_c = np.clip(pos, 0, max(len(self.keys) - 1, 0))
            hit = (
                (self.keys[pos_c] == k)
                if len(self.keys)
                else np.zeros(len(k), dtype=bool)
            )
            keep = ~hit if anti else hit
            return batch.filter(pa.array(keep))

    return left.map_batches(
        Filter,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Shuffle equi-join of two large sides via Ray Data's native hash
    join (both sides hash-partitioned on the key; streaming aggregator
    actors merge co-partitioned blocks)."""
    if num_partitions is None:
        num_partitions = _np_parts(left.count())
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,) if right_on else None,
    )
