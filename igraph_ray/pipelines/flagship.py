"""The flagship pipeline: files parquet → link graph → PageRank top-k.

This is the end-to-end path the driver smoke-checks (``entry()``): read
the source-code files table, infer the link graph (E1/E2/E3), partition
it, run PageRank to convergence, and join ranks back to file keys.
"""

from __future__ import annotations

import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from igraph_ray.kernels.pagerank import pagerank
from igraph_ray.pipelines.graph_build import build_file_graph


def flagship(
    files: ray.data.Dataset,
    graph_dir: str | None = None,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    top_k: int | None = None,
) -> ray.data.Dataset:
    """Return ``(key, vid, rank)`` for every file vertex (or the top-k
    by rank when ``top_k`` is set)."""
    if graph_dir is None:
        graph_dir = tempfile.mkdtemp(prefix="igraph_ray_flagship_")
    built = build_file_graph(files, graph_dir)
    run = pagerank(
        built.graph,
        alpha=alpha,
        tol=tol,
        max_iter=max_iter,
        raise_on_nonconvergence=False,
    )
    ranks = run.state.select_columns(["vid", "rank"])

    # V2 reverse join: vid → key.  Vertices are the small side here —
    # broadcast once via ray.put, probe with vectorized take.
    vtbl = pa.concat_tables(
        built.vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    vtbl = vtbl.sort_by("vid")
    ref = ray.put(vtbl)

    class KeyLookup:
        def __init__(self):
            t: pa.Table = ray.get(ref)
            self.keys = t.column("key").combine_chunks()

        def __call__(self, batch: pa.Table) -> pa.Table:
            vids = batch.column("vid")
            keys = pc.take(self.keys, vids)  # vid == position (dense ids)
            return pa.table(
                {
                    "key": keys,
                    "vid": vids,
                    "rank": batch.column("rank"),
                }
            )

    out = ranks.map_batches(
        KeyLookup,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    )
    if top_k is not None:
        out = out.sort("rank", descending=True).limit(top_k)
    return out
