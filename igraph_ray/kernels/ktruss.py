"""k-truss decomposition — iterative support peeling.

``networkx.k_truss(G, k)`` semantics: the maximal subgraph in which
every edge participates in at least ``k − 2`` triangles *of that
subgraph*.  Computed by peeling: list triangles of the current edge
set, count per-edge support, drop edges below ``k − 2``, repeat until
a fixed point (each round only shrinks the edge set, so the loop
terminates; the surviving set is the unique maximal one).

Distribution shape: each round reuses the degree-ordered wedge
pipeline of :func:`igraph_ray.kernels.triangles.triangle_list` (wedge
volume O(E^1.5) bounded by orientation), a ``flat_map``-style 3-edges-
per-triangle expansion, and ONE pair-keyed groupby merging supports
onto the edge set.  Rounds re-list triangles from scratch — at truss
scale the peeled set shrinks geometrically, so the first round
dominates; incremental support maintenance (the production
refinement) would reuse the same pipeline per delta.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from igraph_ray.kernels.triangles import canonical_edges, triangle_list


def _edge_support(simple: ray.data.Dataset) -> ray.data.Dataset:
    """(src, dst, support) for every canonical edge (0 when the edge
    is in no triangle)."""
    tris = triangle_list(simple)

    def expand(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        c = batch.column("c").to_numpy(zero_copy_only=False)
        # a < b < c, so all three edges are already canonical
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, a, b])),
                "dst": pa.array(np.concatenate([b, c, c])),
                "support": pa.array(np.ones(3 * len(a), np.int64)),
                "is_edge": pa.array(np.zeros(3 * len(a), np.int64)),
            }
        )

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "support": pa.array(np.zeros(n, np.int64)),
                "is_edge": pa.array(np.ones(n, np.int64)),
            }
        )

    tagged = tris.map_batches(
        expand, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        simple.map_batches(
            edge_rows, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    merged = tagged.groupby(["src", "dst"]).aggregate(
        Sum("support", alias_name="support"),
        Sum("is_edge", alias_name="is_edge"),
    )

    def keep_edges(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.greater(batch.column("is_edge"), 0))
        return out.select(["src", "dst", "support"])

    return merged.map_batches(
        keep_edges, batch_format="pyarrow", zero_copy_batch=True
    )


def k_truss(
    edges: ray.data.Dataset, k: int, max_rounds: int = 200
) -> ray.data.Dataset:
    """Surviving canonical edges ``(src < dst)`` of the k-truss
    (``nx.k_truss`` edge set; vertices follow implicitly as the
    endpoints).  ``k >= 2``; ``k = 2`` returns all non-loop edges."""
    if k < 2:
        raise ValueError("k_truss requires k >= 2")
    cur = canonical_edges(edges).materialize()
    if k == 2:
        return cur
    need = k - 2
    n_edges = cur.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        supported = _edge_support(cur)

        def keep(batch: pa.Table, _need=need) -> pa.Table:
            out = batch.filter(
                pc.greater_equal(batch.column("support"), _need)
            )
            return out.select(["src", "dst"])

        cur = supported.map_batches(
            keep, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        n_new = cur.count()
        if n_new == n_edges:
            break
        n_edges = n_new
    else:  # pragma: no cover
        raise RuntimeError(f"k_truss did not stabilize in {max_rounds} rounds")
    return cur
