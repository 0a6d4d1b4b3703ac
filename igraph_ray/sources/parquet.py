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
    """Write a Dataset as partitioned Parquet (one file per block; a
    failed run can be resumed by skipping finished partitions)."""
    ds.write_parquet(path, **kwargs)
