"""Binary graph set operators over edge tables.

igraph surface: ``igraph_union`` / ``igraph_intersection`` /
``igraph_difference`` (networkx twins ``nx.compose`` edge set,
``nx.intersection``, ``nx.difference``) re-expressed relationally:
both operand edge tables are tagged with a presence flag, unioned,
and reduced by ONE groupby on the canonical endpoint pair — a single
all-to-all regardless of operator, no driver-side edge state.

Edges are unordered pairs on arbitrary key columns (string or int).
Self-loops pass through untouched; parallel edges collapse (the
operators are set semantics, matching igraph's simple-graph result).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data.aggregate import Max


def _tag(ds: ray.data.Dataset, a: int, b: int, src: str, dst: str) -> ray.data.Dataset:
    def f(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "src": batch.column(src),
                "dst": batch.column(dst),
                "in_a": pa.array([a] * n, pa.int64()),
                "in_b": pa.array([b] * n, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _flagged(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    src: str,
    dst: str,
) -> ray.data.Dataset:
    """(src, dst, in_a, in_b) per distinct canonical pair."""
    both = _tag(left, 1, 0, src, dst).union(_tag(right, 0, 1, src, dst))

    def canon(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s, d = batch.column("src"), batch.column("dst")
        lo = pc.min_element_wise(s, d)
        hi = pc.max_element_wise(s, d)
        return pa.table(
            {
                "src": lo,
                "dst": hi,
                "in_a": batch.column("in_a"),
                "in_b": batch.column("in_b"),
            }
        )

    return (
        both.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"])
        .aggregate(Max("in_a", alias_name="in_a"), Max("in_b", alias_name="in_b"))
    )


def _filtered(flagged: ray.data.Dataset, expr) -> ray.data.Dataset:
    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = expr(batch.column("in_a"), batch.column("in_b"), pc)
        return batch.filter(keep).select(["src", "dst"])

    return flagged.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def graph_union(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
) -> ray.data.Dataset:
    """Distinct canonical pairs present in either graph
    (``igraph_union`` edge set)."""
    return _filtered(
        _flagged(left, right, src, dst),
        lambda a, b, pc: pc.or_(pc.greater(a, 0), pc.greater(b, 0)),
    )


def graph_intersection(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
) -> ray.data.Dataset:
    """Distinct canonical pairs present in both graphs
    (``igraph_intersection`` / ``nx.intersection`` edge set)."""
    return _filtered(
        _flagged(left, right, src, dst),
        lambda a, b, pc: pc.and_(pc.greater(a, 0), pc.greater(b, 0)),
    )


def graph_difference(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
) -> ray.data.Dataset:
    """Distinct canonical pairs of ``left`` absent from ``right``
    (``igraph_difference`` / ``nx.difference`` edge set)."""
    return _filtered(
        _flagged(left, right, src, dst),
        lambda a, b, pc: pc.and_(pc.greater(a, 0), pc.equal(b, 0)),
    )
