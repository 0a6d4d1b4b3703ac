"""The flagship pipeline: files parquet → link graph → PageRank top-k.

This is the end-to-end path the driver smoke-checks (``entry()``): read
the source-code files table, infer the link graph (E1/E2/E3), partition
it, run PageRank to convergence, and join ranks back to file keys.
"""

from __future__ import annotations

import tempfile

import ray.data

from igraph_ray.kernels.pagerank import pagerank
from igraph_ray.pipelines.graph_build import build_file_graph
from igraph_ray.stages.vertex_ids import attach_keys


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

    # V2 reverse join: vid → key, through the same broadcast-bound /
    # co-partitioned-join fallback as the forward path — never an
    # unconditional driver gather of the vertex table (VERDICT r3)
    out = attach_keys(
        ranks,
        built.vertices,
        value_cols=("rank",),
        num_vertices=built.graph.num_vertices,
    )
    if top_k is not None:
        out = out.sort("rank", descending=True).limit(top_k)
    return out
