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
from ray.data.aggregate import Sum


def symmetrize_dedup(
    edges: ray.data.Dataset, keep_self_loops: bool = True
) -> ray.data.Dataset:
    """Return a simple symmetric edge table: for every undirected pair
    one arc in each direction, weight = sum of all parallel arcs."""

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

    canonical = edges.map_batches(
        canon, batch_format="pyarrow", zero_copy_batch=True
    )
    collapsed = canonical.groupby(["src", "dst"]).aggregate(
        Sum("weight", alias_name="weight")
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
