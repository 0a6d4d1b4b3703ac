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


def undirected_degrees(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Degree over both endpoints (for a canonical one-arc-per-pair
    edge table): rows ``(vid, degree)``."""

    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": pa.concat_arrays(
                    [
                        batch.column("src").combine_chunks(),
                        batch.column("dst").combine_chunks(),
                    ]
                )
            }
        )

    both = edges.map_batches(
        endpoints, batch_format="pyarrow", zero_copy_batch=True
    )
    return both.groupby("vid").aggregate(Count("vid", alias_name="degree"))
