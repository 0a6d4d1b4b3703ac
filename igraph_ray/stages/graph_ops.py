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

import numpy as np
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


def quotient_graph(
    edges: ray.data.Dataset,
    assignment: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    vid_col: str = "vid",
    comm_col: str = "comm",
    mode: str = "broadcast",
) -> ray.data.Dataset:
    """Community-contracted (quotient) graph — igraph
    ``contract_vertices`` + ``simplify(combine_edges=sum)`` /
    ``nx.quotient_graph`` surface, and the coarsen step of Louvain-type
    pipelines exposed as a public operator.

    Every edge maps through the vid→community ``assignment``; output
    one row per community pair: ``(c_src, c_dst, weight [summed],
    n_edges)``.  Self-pairs (intra-community edges) are KEPT — their
    weight is the community's internal weight.

    ``mode="broadcast"`` ships the assignment once via ``ray.put`` and
    probes with a vectorized binary search (right choice while the
    vertex table fits a worker heap); ``mode="join"`` keeps the map
    distributed with two co-partitioned hash joins (the past-broadcast
    scale path, same pattern as Louvain's join mode).
    """
    from ray.data.aggregate import Count, Sum

    if mode == "broadcast":
        import ray as _ray

        amap = pa.concat_tables(
            assignment.select_columns([vid_col, comm_col]).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        ).sort_by(vid_col)
        ref = _ray.put(
            (
                amap.column(vid_col).to_numpy(zero_copy_only=False),
                amap.column(comm_col).to_numpy(zero_copy_only=False),
            )
        )

        class Contract:
            def __init__(self):
                self.vids, self.comms = _ray.get(ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                s = batch.column(src).to_numpy(zero_copy_only=False)
                d = batch.column(dst).to_numpy(zero_copy_only=False)
                w = batch.column(weight).to_numpy(zero_copy_only=False)
                cs = self.comms[np.searchsorted(self.vids, s)]
                cd = self.comms[np.searchsorted(self.vids, d)]
                return pa.table(
                    {
                        "c_src": pa.array(cs.astype(np.int64)),
                        "c_dst": pa.array(cd.astype(np.int64)),
                        weight: pa.array(w.astype(np.float64)),
                    }
                )

        contracted = edges.map_batches(
            Contract,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        )
    elif mode == "join":
        from igraph_ray.stages.join import hash_join

        def _alias(ds, frm, to):
            def f(batch: pa.Table) -> pa.Table:
                return batch.rename_columns(
                    [to if c == frm else c for c in batch.column_names]
                )

            return ds.map_batches(
                f, batch_format="pyarrow", zero_copy_batch=True
            )

        a_src = _alias(
            _alias(assignment.select_columns([vid_col, comm_col]),
                   comm_col, "c_src"),
            vid_col, "__vs",
        )
        a_dst = _alias(
            _alias(assignment.select_columns([vid_col, comm_col]),
                   comm_col, "c_dst"),
            vid_col, "__vd",
        )
        j = hash_join(edges, a_src, on=src, right_on="__vs")
        j = hash_join(j, a_dst, on=dst, right_on="__vd")

        def project(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "c_src": batch.column("c_src"),
                    "c_dst": batch.column("c_dst"),
                    weight: pa.array(
                        batch.column(weight)
                        .to_numpy(zero_copy_only=False)
                        .astype(np.float64)
                    ),
                }
            )

        contracted = j.map_batches(
            project, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")

    return contracted.groupby(["c_src", "c_dst"]).aggregate(
        Sum(weight, alias_name="weight"), Count(alias_name="n_edges")
    )
