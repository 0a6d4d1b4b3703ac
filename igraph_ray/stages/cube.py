"""GROUPING SETS / CUBE / pivot — multi-level grouped aggregation from
ONE scan (reference scope: the SQL ``GROUP BY CUBE / GROUPING SETS``
and pivot/conditional-aggregation surface; oracles in
``__ray_entry__.oracle_sql()['lineitem_cube' / 'segment_status_pivot']``).

Ray-Data shape (scale notes):

* ``grouping_sets`` aggregates the FACT table exactly once (the
  finest-grained detail groupby — the only shuffle that sees O(rows)
  data); every coarser set then re-aggregates the tiny detail result
  (O(distinct detail groups) rows), so adding sets costs no extra
  passes over the input.  Requires every requested set to be a subset
  of ``dims`` and the aggregates to be decomposable (count/sum —
  exact int64 chains, order-insensitive, hash-stable vs a SQL twin).
* ``pivot_counts`` is conditional aggregation: a map-only pass turns
  the pivot column into int64 indicator columns, and ONE
  ``groupby(group)`` (whose Sum aggregates Ray Data pre-combines per
  block before the shuffle) lays the pivot values out as wide
  ``n_<value>`` columns.  The pivot domain must be known and small
  (it becomes the column set).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

ALL = "ALL"  # subtotal sentinel in rolled-up dimension columns


def grouping_sets(
    ds: ray.data.Dataset,
    dims: tuple[str, ...],
    sum_cols: tuple[str, ...],
    sets: tuple[tuple[str, ...], ...],
) -> ray.data.Dataset:
    """Aggregate ``ds`` once at ``dims`` grain, then emit one result
    row-group per requested grouping set, rolled-up dimensions replaced
    by the ``'ALL'`` sentinel.

    Output columns: every dim (string), ``n`` (row count), and
    ``sum_<c>`` per sum column (int64).  ``cube_sets(dims)`` builds
    the full power set for a CUBE.
    """
    for s in sets:
        if not set(s) <= set(dims):
            raise ValueError(f"set {s} not a subset of dims {dims}")

    def detail_rows(batch: pa.Table) -> pa.Table:
        cols = {d: batch.column(d) for d in dims}
        cols["n"] = pa.array(np.ones(batch.num_rows, np.int64))
        for c in sum_cols:
            cols[f"sum_{c}"] = pa.array(
                batch.column(c)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        return pa.table(cols)

    aggs = [Sum("n", alias_name="n")] + [
        Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in sum_cols
    ]
    detail = (
        ds.map_batches(
            detail_rows, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(list(dims))
        .aggregate(*aggs)
    )

    metric_cols = ["n"] + [f"sum_{c}" for c in sum_cols]
    out: ray.data.Dataset | None = None
    for s in sets:
        keep = tuple(s)

        def mask(batch: pa.Table, _keep=keep) -> pa.Table:
            cols = {}
            for d in dims:
                cols[d] = (
                    batch.column(d)
                    if d in _keep
                    else pa.array([ALL] * batch.num_rows, pa.string())
                )
            for m in metric_cols:
                cols[m] = batch.column(m)
            return pa.table(cols)

        masked = detail.map_batches(
            mask, batch_format="pyarrow", zero_copy_batch=True
        )
        if len(keep) == len(dims):
            level = masked  # detail grain: already aggregated
        else:
            level = masked.groupby(list(dims)).aggregate(
                *[Sum(m, alias_name=m) for m in metric_cols]
            )
        out = level if out is None else out.union(level)
    assert out is not None, "need at least one grouping set"
    return out


def cube_sets(dims: tuple[str, ...]) -> tuple[tuple[str, ...], ...]:
    """All 2^d subsets of ``dims`` — the CUBE grouping-set list."""
    sets: list[tuple[str, ...]] = []
    for m in range(1 << len(dims)):
        sets.append(tuple(d for i, d in enumerate(dims) if m >> i & 1))
    return tuple(sets)


def pivot_counts(
    ds: ray.data.Dataset,
    group_col: str,
    pivot_col: str,
    pivot_values: tuple[str, ...],
) -> ray.data.Dataset:
    """Wide conditional aggregation: one output row per group with an
    int64 ``n_<value>`` column per pivot value plus ``total`` (all
    rows of the group, including pivot values outside the domain).
    """

    def partial(batch: pa.Table) -> pa.Table:
        pv = batch.column(pivot_col).to_numpy(zero_copy_only=False)
        cols = {group_col: batch.column(group_col)}
        for v in pivot_values:
            cols[f"n_{v}"] = pa.array((pv == v).astype(np.int64))
        cols["total"] = pa.array(np.ones(batch.num_rows, np.int64))
        return pa.table(cols)

    metric_cols = [f"n_{v}" for v in pivot_values] + ["total"]
    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .aggregate(*[Sum(m, alias_name=m) for m in metric_cols])
    )
