"""T2 — sampling (SURVEY.md §2.2 T2).

Two flavors:

- :func:`hash_sample` — **deterministic** splitmix64 hash sampling on a
  key column: the same row set is kept on every run, across resumes,
  and on any cluster size, and the DuckDB oracle can reproduce it
  exactly (the SQL twin replays splitmix64 with HUGEINT arithmetic).
  This is the sampling you want in a reproducible data pipeline.
- :func:`random_sample` — thin wrapper over
  ``Dataset.random_sample`` (seeded pseudo-random, per-block) for
  quick debug/bench subsets where determinism across block layouts
  does not matter.

Both are map-only (no shuffle) and vectorized per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.utils import hash_int64


def hash_sample(
    ds: ray.data.Dataset,
    col: str,
    num: int = 1,
    denom: int = 10,
) -> ray.data.Dataset:
    """Keep rows where ``splitmix64(col) % denom < num`` — an exact,
    deterministic ``num/denom`` sample keyed on an int64 column."""
    if not (0 < num <= denom):
        raise ValueError("need 0 < num <= denom")

    def _f(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (hash_int64(v) % np.uint64(denom)) < np.uint64(num)
        return batch.filter(pa.array(keep))

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def random_sample(
    ds: ray.data.Dataset, fraction: float, seed: int | None = None
) -> ray.data.Dataset:
    """Seeded pseudo-random sample (``Dataset.random_sample``)."""
    return ds.random_sample(fraction, seed=seed)


def stratified_sample(
    ds: ray.data.Dataset,
    group_col: str,
    key_col: str,
    k: int,
) -> ray.data.Dataset:
    """Deterministic per-group quota sample: the ``k`` rows of each
    group with the smallest ``(splitmix64(key), key)`` — reproducible
    across runs, resumes and cluster sizes, and exactly replayable by a
    ROW_NUMBER() SQL twin (unlike seeded per-block sampling).

    Scale shape: a map-side per-batch top-k per group first, so the
    final ``groupby(group)`` shuffle moves at most ``k`` rows per group
    per input block, never the full table.
    """
    if k <= 0:
        raise ValueError("k must be positive")

    def _rank_select(batch: pa.Table) -> pa.Table:
        g_raw = batch.column(group_col).to_numpy(zero_copy_only=False)
        # factorize to int codes — np.lexsort rejects object (string)
        # arrays; np.unique codes preserve the grouping
        _, g = np.unique(g_raw, return_inverse=True)
        key = batch.column(key_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        z = hash_int64(key)
        order = np.lexsort((key, z, g))
        gs = g[order]
        boundary = np.empty(len(gs), dtype=bool)
        if len(gs):
            boundary[0] = True
            boundary[1:] = gs[1:] != gs[:-1]
        seg_start = np.maximum.accumulate(
            np.where(boundary, np.arange(len(gs)), 0)
        )
        rank = np.arange(len(gs)) - seg_start
        keep_sorted = order[rank < k]
        return batch.take(pa.array(np.sort(keep_sorted)))

    partial = ds.map_batches(
        _rank_select, batch_format="pyarrow", zero_copy_batch=True
    )
    return partial.groupby(group_col).map_groups(
        _rank_select, batch_format="pyarrow"
    )


def mixture_sample(
    ds: ray.data.Dataset,
    category_col: str,
    key_col: str,
    rates: dict[str, tuple[int, int]],
    default: tuple[int, int] = (0, 1),
) -> ray.data.Dataset:
    """Deterministic per-category downsampling — the data-mixture
    rebalancing step of a training pipeline: keep a row of category
    ``c`` iff ``splitmix64(key) % denom_c < num_c``.  Categories not in
    ``rates`` use ``default`` ((0, 1) = drop).

    Like :func:`hash_sample` this is map-only, exact, independent of
    block layout / cluster size, and replayable in SQL (CASE over the
    same splitmix64 chain), so the resulting mixture is reproducible
    and resumable at any scale.
    """
    for c, (num, denom) in rates.items():
        if not (0 <= num <= denom and denom > 0):
            raise ValueError(f"bad rate for {c!r}: {num}/{denom}")

    def _f(batch: pa.Table) -> pa.Table:
        cat = batch.column(category_col).to_numpy(zero_copy_only=False)
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        z = hash_int64(k)
        # per-unique-category rate lookup (tiny), broadcast by codes
        uniq, inv = np.unique(cat, return_inverse=True)
        num_u = np.array(
            [rates.get(c, default)[0] for c in uniq], np.uint64
        )
        den_u = np.array(
            [rates.get(c, default)[1] for c in uniq], np.uint64
        )
        keep = (z % den_u[inv]) < num_u[inv]
        return batch.filter(pa.array(keep))

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def weighted_sample(
    ds: ray.data.Dataset,
    key_col: str,
    weight_col: str,
) -> ray.data.Dataset:
    """Deterministic importance sampling: keep a row iff
    ``splitmix64(key)/2^64 < weight`` (weight in [0, 1] — e.g. a
    quality score), so acceptance probability equals the weight while
    staying exactly reproducible across runs, resumes and cluster
    sizes (and SQL-replayable: the uint64→double rounding is IEEE
    round-to-nearest on both sides).  Map-only."""

    def _f(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        w = batch.column(weight_col).to_numpy(zero_copy_only=False)
        u = hash_int64(k).astype(np.float64) / 2.0**64
        return batch.filter(pa.array(u < w))

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def hash_split(
    ds: ray.data.Dataset,
    col: str,
    boundaries: tuple[int, ...] = (90, 95),
    denom: int = 100,
    names: tuple[str, ...] = ("train", "val", "test"),
    out: str = "split",
) -> ray.data.Dataset:
    """Deterministic train/val/test assignment: bucket =
    splitmix64(col) % denom, split i covers [boundaries[i-1],
    boundaries[i]) (the standard hash-based dataset split — stable
    across runs, cluster shapes and resumes, and rows never migrate
    between splits when the corpus grows).  Map-only; the SQL twin
    replays splitmix64 in HUGEINT."""
    if len(names) != len(boundaries) + 1:
        raise ValueError("need len(names) == len(boundaries) + 1")

    def _f(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        z = (hash_int64(v) % np.uint64(denom)).astype(np.int64)
        lab = np.empty(len(v), dtype=object)
        lo = 0
        bounds = list(boundaries) + [denom]
        for name, hi in zip(names, bounds):
            lab[(z >= lo) & (z < hi)] = name
            lo = hi
        return batch.append_column(out, pa.array(lab.tolist(), pa.string()))

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)
