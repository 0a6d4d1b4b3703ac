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


def line_graph(
    pairs: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Line graph L(G) of the simple undirected graph given as
    canonical unordered pairs — igraph ``linegraph`` / nx.line_graph
    semantics: one L(G)-vertex per edge of G, an L(G)-edge between two
    G-edges iff they share an endpoint.

    Construction is one incidence self-join expressed as the standard
    per-endpoint wedge expansion (each vertex emits all C(d, 2) pairs
    of its incident edges — Σ d(v)² work, the triangle-counting
    bound), hash-partitioned into a rows-sized key-space.  Output rows
    ``(a_src, a_dst, b_src, b_dst)`` with the edge pair canonically
    ordered ((a_src,a_dst) < (b_src,b_dst) lexicographically), distinct
    — two edges sharing BOTH endpoints cannot occur in a simple graph,
    and sharing one endpoint yields exactly one row emitted at that
    endpoint.
    """
    import math

    from igraph_ray.utils import hash_int64

    n_edges = pairs.count()
    if num_parts is None:
        num_parts = int(max(2, min(256, math.ceil(max(1, n_edges) / 250_000))))

    def incidence(batch: pa.Table) -> pa.Table:
        s = batch.column(src).to_numpy(zero_copy_only=False)
        d = batch.column(dst).to_numpy(zero_copy_only=False)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        # one incidence row per endpoint: (endpoint, edge-lo, edge-hi)
        v = np.concatenate([lo, hi])
        el = np.concatenate([lo, lo])
        eh = np.concatenate([hi, hi])
        part = (hash_int64(v) % np.uint64(num_parts)).astype(np.int32)
        return pa.table(
            {
                "hpart": pa.array(part),
                "v": pa.array(v),
                "el": pa.array(el),
                "eh": pa.array(eh),
            }
        )

    inc = pairs.map_batches(
        incidence, batch_format="pyarrow", zero_copy_batch=True
    )

    def edge_pairs(group: pa.Table) -> pa.Table:
        v = group.column("v").to_numpy(zero_copy_only=False)
        el = group.column("el").to_numpy(zero_copy_only=False)
        eh = group.column("eh").to_numpy(zero_copy_only=False)
        # sort by (v, el, eh) so each vertex's incident edges are a
        # contiguous, canonically ordered run
        order = np.lexsort((eh, el, v))
        v, el, eh = v[order], el[order], eh[order]
        boundary = np.empty(len(v), dtype=bool)
        if len(v):
            boundary[0] = True
            boundary[1:] = v[1:] != v[:-1]
        starts = np.flatnonzero(boundary)
        ends = np.append(starts[1:], len(v))
        out = []
        for s0, e0 in zip(starts, ends):
            deg = e0 - s0
            if deg < 2:
                continue
            ii, jj = np.triu_indices(deg, k=1)
            out.append(
                (
                    el[s0:e0][ii],
                    eh[s0:e0][ii],
                    el[s0:e0][jj],
                    eh[s0:e0][jj],
                )
            )
        if out:
            a_s = np.concatenate([o[0] for o in out])
            a_d = np.concatenate([o[1] for o in out])
            b_s = np.concatenate([o[2] for o in out])
            b_d = np.concatenate([o[3] for o in out])
        else:
            a_s = a_d = b_s = b_d = np.empty(0, np.int64)
        return pa.table(
            {
                "a_src": pa.array(a_s),
                "a_dst": pa.array(a_d),
                "b_src": pa.array(b_s),
                "b_dst": pa.array(b_d),
            }
        )

    return inc.groupby("hpart").map_groups(
        edge_pairs, batch_format="pyarrow"
    )


def bipartite_projection(
    edges: ray.data.Dataset,
    u_col: str = "u",
    v_col: str = "v",
    onto: str = "u",
    fanout_cap: int | None = None,
) -> ray.data.Dataset:
    """Weighted one-mode projection of a bipartite graph — igraph
    ``bipartite_projection`` (with ``multiplicity`` weights) /
    nx ``bipartite.weighted_projected_graph`` semantics.

    Two same-mode vertices are linked iff they share an opposite-mode
    neighbour; ``weight`` = number of distinct shared neighbours.
    Rows: ``(src_key, dst_key, weight)`` with ``src_key < dst_key``.

    Shape: one distinct-incidence groupby, one per-opposite-key pair
    expansion (vectorized triu), one pair-count groupby.  A key of
    opposite-mode degree g emits C(g, 2) pairs — the projection is
    inherently quadratic in hub degree (igraph's is too), so
    ``fanout_cap`` is the documented skew guard: keys with more than
    ``fanout_cap`` distinct members are dropped entirely (NOT starred —
    a star would fabricate multiplicity).  Default ``None`` keeps
    exact igraph semantics; SQL twins apply the same HAVING filter.
    """
    from ray.data.aggregate import Sum

    member, key = (u_col, v_col) if onto == "u" else (v_col, u_col)
    incidence = (
        edges.select_columns([key, member])
        .groupby([key, member])
        .count()
        .select_columns([key, member])
    )

    def emit(group: pa.Table) -> pa.Table:
        # key type follows the member column (int vertex keys project
        # as ints, strings as strings — ADVICE r3: was hard-coded
        # pa.string(), which raised ArrowTypeError on int members)
        mcol = group.column(member).combine_chunks()
        mtype = mcol.type
        members = np.sort(np.asarray(mcol.to_pylist(), dtype=object))
        k = len(members)
        if k < 2 or (fanout_cap is not None and k > fanout_cap):
            return pa.table(
                {
                    "src_key": pa.array([], mtype),
                    "dst_key": pa.array([], mtype),
                    "weight": pa.array([], pa.int64()),
                }
            )
        iu, ju = np.triu_indices(k, 1)
        return pa.table(
            {
                "src_key": pa.array(members[iu].tolist(), mtype),
                "dst_key": pa.array(members[ju].tolist(), mtype),
                "weight": pa.array(np.ones(len(iu), np.int64)),
            }
        )

    pairs = incidence.groupby(key).map_groups(
        emit, batch_format="pyarrow"
    )
    return pairs.groupby(["src_key", "dst_key"]).aggregate(
        Sum("weight", alias_name="weight")
    )
