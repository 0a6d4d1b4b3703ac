"""E4 — symmetrize + dedup the edge table (SURVEY.md §2.2 E4).

Undirected kernels consume both arcs with no multi-edges: parallel
edges collapse with summed weight (the reference's multigraph-collapse
rule, ``pagerank_alg.py:228-229``), and an undirected graph is modeled
as two directed arcs (``pagerank_alg.py:128`` ``G.to_directed()``).

One shuffle: canonicalize pairs to (min, max), ``groupby`` sum, then
emit both arcs per pair.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def symmetrize_dedup(
    edges: ray.data.Dataset,
    keep_self_loops: bool = True,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Return a simple symmetric edge table: for every undirected pair
    one arc in each direction, weight = sum of all parallel arcs.

    ``num_parts`` (the hash-partition key space for the collapse
    shuffle) defaults to ``n_edges / 250k`` so one group ≈ one block —
    a fixed count would make per-group size O(E) and blow a worker
    heap at scale (``map_groups`` materializes one group at a time).
    """

    def canon(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        w = batch.column("weight").to_numpy(zero_copy_only=False)
        if not keep_self_loops:
            keep = src != dst
            src, dst, w = src[keep], dst[keep], w[keep]
        return pa.table(
            {
                "src": pa.array(np.minimum(src, dst)),
                "dst": pa.array(np.maximum(src, dst)),
                "weight": pa.array(w.astype(np.float64)),
            }
        )

    from igraph_ray.utils import hash_int64

    canonical = edges.map_batches(
        canon, batch_format="pyarrow", zero_copy_batch=True
    )
    if num_parts is None:
        # one cheap map-only pass; materialized so the collapse groupby
        # reads these blocks instead of recomputing the lineage
        canonical = canonical.materialize()
        num_parts = int(max(2, min(65536, canonical.count() // 250_000 + 2)))

    def add_hpart(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        if src.dtype.kind in "iu":
            with np.errstate(over="ignore"):
                hp = (
                    (
                        hash_int64(src) * np.uint64(0x9E3779B97F4A7C15)
                        + hash_int64(dst)
                    )
                    % np.uint64(num_parts)
                ).astype(np.int32)
        else:
            # string keys (pre-vid pipelines): cheap deterministic hash
            import zlib

            hp = np.fromiter(
                (
                    zlib.crc32(f"{a}\x00{b}".encode()) % num_parts
                    for a, b in zip(src, dst)
                ),
                dtype=np.int32,
                count=len(src),
            )
        return batch.append_column("hpart", pa.array(hp))

    def collapse(group: pa.Table) -> pa.Table:
        src = group.column("src").to_numpy(zero_copy_only=False)
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        w = group.column("weight").to_numpy(zero_copy_only=False)
        if len(src) == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "weight": pa.array([], pa.float64()),
                }
            )
        order = np.lexsort((w, dst, src))  # weight in key → deterministic sums
        src, dst, w = src[order], dst[order], w[order]
        first = np.empty(len(src), dtype=bool)
        first[0] = True
        first[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
        seg = np.flatnonzero(first)
        return pa.table(
            {
                "src": pa.array(src[seg]),
                "dst": pa.array(dst[seg]),
                "weight": pa.array(np.add.reduceat(w, seg)),
            }
        )

    # hash-partition on one int32 key + vectorized per-partition
    # collapse — ~10× cheaper than a two-column sort-shuffle groupby
    collapsed = (
        canonical.map_batches(
            add_hpart, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("hpart")
        .map_groups(collapse, batch_format="pyarrow")
    )

    def both_arcs(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        w = batch.column("weight").to_numpy(zero_copy_only=False)
        rev = src != dst  # do not duplicate self-loops
        return pa.table(
            {
                "src": pa.array(np.concatenate([src, dst[rev]])),
                "dst": pa.array(np.concatenate([dst, src[rev]])),
                "weight": pa.array(np.concatenate([w, w[rev]])),
            }
        )

    return collapsed.map_batches(
        both_arcs, batch_format="pyarrow", zero_copy_batch=True
    )
