"""Persisted SSSP parent trees — vid-range-bucketed Parquet.

Retires ``trace_path``'s past-bound per-hop dataset-filter fallback
(round-3 verdict "What's wrong #4"): the ``(vid, parent)`` tree is
written ONCE in a single distributed pass as vid-bucketed Parquet
(``bucket = vid // rows_per_bucket`` — RANGE bucketing, so each
bucket is a contiguous vid slab stored sorted), and every subsequent
path hop is a binary search inside a lazily-loaded, LRU-cached bucket
table.  Tracing a path therefore costs ONE dataset execution (the
persist) plus O(path length / locality) small file reads — never a
per-hop ``filter().take_all()`` re-execution.

Buckets are rows-sized (default 1M rows ≈ 16 MB of two int64
columns), so worker/driver heap stays bounded no matter the vertex
count, and the write is one ``groupby(bucket).map_groups`` over the
state — the same partitioned-write shape as the CSR block store.
Like ``graph_dir`` CSR blocks, the tree directory is assumed visible
to every node (shared filesystem / object storage at cluster scale).
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

ROWS_PER_BUCKET = 1_000_000
CACHE_BUCKETS = 8


def tree_fingerprint(state: ray.data.Dataset) -> str:
    """Order-independent content fingerprint of a ``(vid, parent)``
    state: XOR over rows of a splitmix-style 64-bit hash of the pair.
    One cheap distributed pass (one partial row per block); used to
    tie a persisted tree store to the state it was built from, so
    ``trace_path`` never silently reuses a stale tree from a
    different SSSP run on the same ``tree_dir``."""

    def part(batch: pa.Table) -> pa.Table:
        vid = batch.column("vid").to_numpy(zero_copy_only=False)
        parent = batch.column("parent").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            x = (
                vid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ) ^ (
                parent.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
            )
            x ^= x >> np.uint64(31)
            x *= np.uint64(0x94D049BB133111EB)
        fp = (
            int(np.bitwise_xor.reduce(x)) if len(x) else 0
        )
        return pa.table({"fp": pa.array([fp], pa.uint64())})

    acc = 0
    for t in (
        state.select_columns(["vid", "parent"])
        .map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ):
        for v in t.column("fp").to_pylist():
            acc ^= int(v)
    return f"{acc:016x}"


def persist_parent_tree(
    state: ray.data.Dataset,
    tree_dir: str,
    rows_per_bucket: int = ROWS_PER_BUCKET,
    identity: dict | None = None,
) -> "ParentTree":
    """Write an SSSP state dataset (rows ``vid, parent, ...``) as a
    vid-bucketed parent-tree store under ``tree_dir`` and return the
    opened :class:`ParentTree`.  One distributed pass; one Parquet
    file per vid-range bucket, rows sorted by vid.  ``identity``
    (e.g. source vid + state fingerprint) is stamped into meta.json
    so later opens can verify they reuse the right tree."""
    os.makedirs(tree_dir, exist_ok=True)
    # a re-persist over an existing store must not leave stale
    # buckets behind (the new tree may span fewer vid ranges)
    for f in os.listdir(tree_dir):
        if f.startswith("bucket_") and f.endswith(".parquet"):
            os.unlink(os.path.join(tree_dir, f))

    def add_bucket(batch: pa.Table) -> pa.Table:
        vid = batch.column("vid").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(
                    (vid // rows_per_bucket).astype(np.int64)
                ),
                "vid": batch.column("vid"),
                "parent": batch.column("parent"),
            }
        )

    def write_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64())})
        b = int(group.column("bucket")[0].as_py())
        tbl = group.select(["vid", "parent"]).sort_by("vid")
        pq.write_table(tbl, os.path.join(tree_dir, f"bucket_{b}.parquet"))
        return pa.table({"bucket": pa.array([b], pa.int64())})

    (
        state.select_columns(["vid", "parent"])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
        .materialize()
    )
    with open(os.path.join(tree_dir, "meta.json"), "w") as f:
        json.dump(
            {
                "rows_per_bucket": rows_per_bucket,
                "identity": identity or {},
            },
            f,
        )
    return ParentTree(tree_dir)


class ParentTree:
    """Reader over a persisted parent tree: ``parent_of`` /
    ``trace`` via binary search in LRU-cached vid-range buckets."""

    def __init__(self, tree_dir: str, cache_buckets: int = CACHE_BUCKETS):
        with open(os.path.join(tree_dir, "meta.json")) as f:
            meta = json.load(f)
        self.rows_per_bucket = int(meta["rows_per_bucket"])
        self.identity: dict = meta.get("identity", {})
        self.tree_dir = tree_dir
        self.cache_buckets = cache_buckets
        self._cache: OrderedDict[int, tuple[np.ndarray, np.ndarray]] = (
            OrderedDict()
        )

    def _bucket_arrays(
        self, b: int
    ) -> tuple[np.ndarray, np.ndarray] | None:
        if b in self._cache:
            self._cache.move_to_end(b)
            return self._cache[b]
        path = os.path.join(self.tree_dir, f"bucket_{b}.parquet")
        if not os.path.exists(path):
            return None
        tbl = pq.read_table(path, columns=["vid", "parent"])
        arrs = (
            tbl.column("vid").to_numpy(zero_copy_only=False),
            tbl.column("parent").to_numpy(zero_copy_only=False),
        )
        self._cache[b] = arrs
        if len(self._cache) > self.cache_buckets:
            self._cache.popitem(last=False)
        return arrs

    def parent_of(self, v: int) -> int | None:
        arrs = self._bucket_arrays(int(v) // self.rows_per_bucket)
        if arrs is None:
            return None
        vids, parents = arrs
        i = int(np.searchsorted(vids, v))
        if i >= len(vids) or vids[i] != v:
            return None
        return int(parents[i])

    def trace(
        self, source: int, target: int, max_hops: int = 100_000
    ) -> list[int]:
        """Walk parent pointers target→source; ``[]`` if unreachable."""
        path = [int(target)]
        cur = int(target)
        for _ in range(max_hops):
            if cur == source:
                return list(reversed(path))
            p = self.parent_of(cur)
            if p is None or p < 0:
                return []
            path.append(p)
            cur = p
        raise RuntimeError("path trace exceeded max_hops (cycle?)")
