"""Parquet source/sink helpers (SURVEY.md §2.2 S1/S2).

Reads always prune columns at the source (``columns=[...]``) so a
2-column transform never ships the wide ``content`` column off storage.
"""

from __future__ import annotations

from typing import Sequence

import ray.data


def read_files(path: str, columns: Sequence[str] | None = None) -> ray.data.Dataset:
    """Read a ``files``-shaped Parquet table with column pruning."""
    return ray.data.read_parquet(path, columns=list(columns) if columns else None)


def write_table(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    """Write a Dataset as Parquet (one file per block).  For genuine
    partial-progress resume use :func:`write_partitioned`."""
    ds.write_parquet(path, **kwargs)


def write_partitioned(
    ds: ray.data.Dataset,
    path: str,
    key_col: str,
    num_shards: int = 16,
    resume: bool = True,
) -> list[int]:
    """Resumable sharded Parquet sink: shard ``s = splitmix64(key) %
    num_shards`` writes to ``path/shard=<s>/`` as its OWN job, with a
    ``_SUCCESS`` marker committed only after the shard's write
    finishes.  With ``resume=True`` a rerun skips every markered shard
    — a killed job loses at most one shard of work, never the run.

    Returns the shard ids written by THIS call.  Cost model: each
    shard is a separate pass over ``ds`` (filter is a vectorized
    map-side predicate), so reads cost ``num_shards×``; at scale point
    the input at storage partitioned by the same key so predicate
    pushdown prunes each pass to ~1 shard of IO.  Iterative-kernel
    state uses the finer-grained per-iteration checkpoints in
    ``state/checkpoint.py`` instead.
    """
    import os

    import numpy as np
    import pyarrow as pa

    from igraph_ray.utils import hash_int64

    os.makedirs(path, exist_ok=True)
    written: list[int] = []
    for s in range(num_shards):
        shard_dir = os.path.join(path, f"shard={s}")
        marker = os.path.join(shard_dir, "_SUCCESS")
        if resume and os.path.exists(marker):
            continue
        # A previous attempt may have died mid-write: parquet files
        # present but no _SUCCESS.  write_parquet APPENDS uniquely-named
        # files next to existing ones, so rewriting without clearing
        # would silently duplicate the shard's rows.
        if os.path.isdir(shard_dir):
            import shutil

            shutil.rmtree(shard_dir)

        def keep(batch: pa.Table, _s=s) -> pa.Table:
            k = (
                batch.column(key_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            m = (hash_int64(k) % np.uint64(num_shards)) == np.uint64(_s)
            return batch.filter(pa.array(m))

        sub = ds.map_batches(
            keep, batch_format="pyarrow", zero_copy_batch=True
        )
        sub.write_parquet(shard_dir)
        with open(marker, "w") as f:
            f.write("ok\n")
        written.append(s)
    return written
