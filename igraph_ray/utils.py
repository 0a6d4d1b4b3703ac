"""Shared helpers: deterministic hashing, partition assignment.

Everything here must be deterministic across processes and runs (no
Python ``hash()``, which is salted per process) so that resumed or
retried tasks agree on partition assignment.
"""

from __future__ import annotations

import numpy as np

_SPLITMIX_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def hash_int64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over an int64/uint64 array.

    A cheap, well-mixed stateless hash — used for partition assignment
    and salting so that consecutive vertex ids do not land in the same
    partition.
    """
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += _SPLITMIX_GAMMA
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def part_of(vids: np.ndarray, num_parts: int) -> np.ndarray:
    """Partition id (int32) for each vertex id: splitmix64(vid) % P."""
    return (hash_int64(np.asarray(vids)) % np.uint64(num_parts)).astype(np.int32)


def num_parts_for(num_edges: int, num_vertices: int, target_edges_per_part: int = 2_000_000) -> int:
    """Pick a partition count so a per-partition CSR block (edges +
    per-vertex state) stays well under a worker heap.

    At 10^9 edges / 2M edges-per-part this yields ~500 partitions; on
    the tiny local test graphs it bottoms out at a handful so per-task
    overhead stays low.
    """
    p = max(1, num_edges // target_edges_per_part)
    # Never more parts than vertices; at least 2 when the graph is
    # non-trivial so the multi-partition code path is always exercised.
    if num_vertices > 64:
        p = max(p, 2)
    return int(min(p, max(1, num_vertices)))


def drop_empty_blocks(ds):
    """Strip zero-row blocks from a MATERIALIZED dataset.

    Ray Data's sort machinery (every ``groupby`` rides on it) emits
    zero-COLUMN blocks for empty sort partitions; pyarrow's hash join
    then fails with "No match for key field on left side" when such a
    block reaches a join input.  The filter is metadata-only on the
    driver (no block fetch) and keeps the surviving block refs as-is,
    so it is O(#blocks) regardless of data size.
    """
    import ray.data

    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)
    if not refs:
        return None
    return ray.data.from_arrow_refs(refs)


def drop_empty_blocks(ds):
    """Strip SCHEMA-LESS empty blocks from a materialized Dataset.

    Ray Data's groupby ``aggregate``/``map_groups`` never call the
    group fn on an empty partition and emit a zero-column empty block
    for it; a native hash-join partition that receives only such a
    block then fails with ``No match ... for key field reference ...``
    (pyarrow can't find the key column).  Filtering the block refs by
    metadata row-count removes them without touching any data.
    ``repartition`` is NOT a fix: repartitioning to more blocks than
    rows re-creates schema-less empties.

    The input must be materialized; the returned dataset pins the
    input as an attribute so the underlying blocks cannot be freed
    while the filtered view is alive.
    """
    import ray.data

    refs = []
    total = 0
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            total += 1
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)
    if not refs or len(refs) == total:
        return ds  # fully empty, or nothing to strip
    out = ray.data.from_arrow_refs(refs)
    out._igr_pinned_parent = ds
    return out
