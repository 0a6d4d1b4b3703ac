"""K5 — degree / weighted degree (SURVEY.md §2.1 K5).

Used by PageRank normalization (local in the CSR build), triangle
orientation, and dangling detection; exposed standalone as a grouped
aggregate.  One hash/sort shuffle: ``groupby(vid).aggregate(Count,
Sum(weight))``.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum


def out_degrees(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Per-source out-degree and weighted out-degree:
    rows ``(vid, degree, weighted_degree)``."""
    agg = edges.groupby("src").aggregate(
        Count("src", alias_name="degree"),
        Sum("weight", alias_name="weighted_degree"),
    )
    return agg.rename_columns({"src": "vid"})


def undirected_degrees(
    edges: ray.data.Dataset, num_parts: int = 32
) -> ray.data.Dataset:
    """Degree over both endpoints (for a canonical one-arc-per-pair
    edge table): rows ``(vid, degree)``.

    Pre-combined per block (np.unique counts) before a single int32
    hash-partition shuffle; final combine is a vectorized per-partition
    reduceat — the partial/combiner pattern of SURVEY.md §4."""
    import numpy as np

    from igraph_ray.utils import part_of

    def partial_counts(batch: pa.Table) -> pa.Table:
        v = np.concatenate(
            [
                batch.column("src").to_numpy(zero_copy_only=False),
                batch.column("dst").to_numpy(zero_copy_only=False),
            ]
        )
        uv, counts = np.unique(v, return_counts=True)
        return pa.table(
            {
                "vid": pa.array(uv),
                "n": pa.array(counts.astype(np.int64)),
                "hpart": pa.array(part_of(uv, num_parts)),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        v = group.column("vid").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v, n = v[order], n[order]
        if len(v) == 0:
            return pa.table(
                {"vid": pa.array([], pa.int64()), "degree": pa.array([], pa.int64())}
            )
        first = np.empty(len(v), dtype=bool)
        first[0] = True
        first[1:] = v[1:] != v[:-1]
        seg = np.flatnonzero(first)
        return pa.table(
            {
                "vid": pa.array(v[seg]),
                "degree": pa.array(np.add.reduceat(n, seg)),
            }
        )

    partials = edges.map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("hpart").map_groups(
        combine, batch_format="pyarrow"
    )
