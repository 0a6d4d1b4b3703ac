"""4-clique (K4) counting over the degree-ordered oriented DAG.

In the (degree, vid) total order every 4-clique {a<b<c<d} is counted
exactly once: the oriented triangle (a,b,c) plus the unique apex d with
(a,d), (b,d), (c,d) all oriented edges.  The kernel therefore extends
the triangle close (``kernels/triangles.py``): inside each u-partition
block, enumerate the block's oriented triangles against the broadcast
fused-key edge set, then test every remaining out-neighbor d of the
triangle's base vertex a for membership of (b,d) AND (c,d) — two more
vectorized ``searchsorted`` probes, candidates never leave the task.

Work bound: Σ_triangles deg⁺(a) ≤ O(E^1.5 · max-deg⁺); the
degree-ordering caps deg⁺ at O(√E) so this is the standard oriented
K4-listing bound.  Broadcast-only path (fused int32-pair keys, same
policy and ``_fits_int32`` guard as ``triangle_list``); a join-based
close for graphs whose oriented edge set exceeds the broadcast bound
would ship (triangle, candidate) keys through one more co-partitioned
join — declared boundary, raises until needed.

Semantics oracle: 6-way self-join over the canonical undirected edge
table (see ``__ray_entry__.oracle_sql()['four_cliques']``) and
``nx.enumerate_all_cliques`` on small fixtures (tests/test_cliques.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from igraph_ray.kernels.degree import undirected_degrees
from igraph_ray.kernels.triangles import (
    BROADCAST_MAX_VERTICES,
    _DegreeLookup,
    _fits_int32,
    _orient,
    canonical_edges,
)


def four_clique_counts(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset | None = None,
    broadcast_max_edges: int = BROADCAST_MAX_VERTICES,
) -> ray.data.Dataset:
    """Per-vertex K4 counts: rows ``(vid, c4)``.

    ``edges`` may be directed/multi/self-looped (canonicalized first);
    ``vertices`` (column ``vid``) optionally supplies the full vertex
    universe so K4-free vertices appear with count 0.
    """
    simple = canonical_edges(edges).materialize()
    degrees = undirected_degrees(simple).materialize()

    deg_table = pa.concat_tables(
        degrees.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    ref = ray.put(deg_table)
    with_deg = simple.map_batches(
        _DegreeLookup,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    oriented = with_deg.map_batches(
        _orient, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_edges = oriented.count()
    if n_edges > broadcast_max_edges or not _fits_int32(oriented):
        raise NotImplementedError(
            "four_clique_counts: oriented edge set exceeds the broadcast "
            "bound; the join-based close is a declared boundary "
            "(see module docstring)"
        )
    num_partitions = int(max(2, min(64, n_edges // 250_000 + 2)))

    pair_tbl = pa.concat_tables(
        oriented.select_columns(["u", "v"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    fused = (
        pair_tbl.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        << 32
    ) | pair_tbl.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
    fused.sort()
    pairs_ref = ray.put(fused)

    def add_upart(batch: pa.Table) -> pa.Table:
        from igraph_ray.utils import part_of

        u = batch.column("u").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "upart", pa.array(part_of(u, num_partitions))
        )

    by_u = oriented.map_batches(
        add_upart, batch_format="pyarrow", zero_copy_batch=True
    )

    def close_block(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"vid": pa.array([], pa.int64()), "c4": pa.array([], pa.int64())}
        )
        if group.num_rows == 0:
            return empty
        pairs = ray.get(pairs_ref)

        def member(x: np.ndarray, y: np.ndarray) -> np.ndarray:
            key = (x << 32) | y
            pos = np.searchsorted(pairs, key)
            pos[pos >= len(pairs)] = len(pairs) - 1
            return pairs[pos] == key

        u = group.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = group.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        vd = group.column("v_deg").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, vd, u))
        u, v = u[order], v[order]
        boundary = np.empty(len(u), dtype=bool)
        boundary[0] = True
        boundary[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(boundary)
        sizes = np.diff(np.append(starts, len(u)))
        keep = sizes >= 3  # a K4 needs deg⁺(a) >= 3
        starts, sizes = starts[keep], sizes[keep]
        if len(starts) == 0:
            return empty
        corners: list[np.ndarray] = []
        for k in np.unique(sizes):
            iu, ju = np.triu_indices(int(k), 1)
            seg = starts[sizes == k]
            xi = (seg[:, None] + iu[None, :]).reshape(-1)
            yi = (seg[:, None] + ju[None, :]).reshape(-1)
            b, c = v[xi], v[yi]
            tri = member(b, c)
            if not tri.any():
                continue
            # expand each triangle's base segment as apex candidates
            s_t = np.repeat(seg, len(iu))[tri]  # segment start per tri
            a_t, b_t, c_t = u[s_t], b[tri], c[tri]
            kk = int(k)
            cand_idx = (s_t[:, None] + np.arange(kk)[None, :]).reshape(-1)
            d = v[cand_idx]
            bb = np.repeat(b_t, kk)
            cc = np.repeat(c_t, kk)
            hit = member(bb, d) & member(cc, d)
            if not hit.any():
                continue
            aa = np.repeat(a_t, kk)
            corners.append(
                np.concatenate([aa[hit], bb[hit], cc[hit], d[hit]])
            )
        if not corners:
            return empty
        uv, counts = np.unique(np.concatenate(corners), return_counts=True)
        return pa.table(
            {"vid": pa.array(uv), "c4": pa.array(counts.astype(np.int64))}
        )

    partials = by_u.groupby("upart").map_groups(
        close_block, batch_format="pyarrow"
    )

    def zero_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "c4": pa.array(np.zeros(len(batch), np.int64)),
            }
        )

    zeros = degrees.map_batches(
        zero_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    if vertices is not None:
        zeros = zeros.union(
            vertices.select_columns(["vid"]).map_batches(
                zero_rows, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    return (
        partials.union(zeros)
        .groupby("vid")
        .aggregate(Sum("c4", alias_name="c4"))
    )


def total_four_cliques(per_vertex: ray.data.Dataset) -> int:
    """Σ per-vertex counts / 4 (each K4 credits its four corners)."""
    s = per_vertex.sum("c4") or 0
    return int(s) // 4


def four_cycle_count(arcs: ray.data.Dataset) -> int:
    """Global number of (simple, chordless-or-not) 4-cycles — the
    rectangle count (igraph motif surface; nx has no direct twin, the
    pytest oracle uses the same codegree identity computed densely).

    Identity: every C4 has two diagonal pairs, and a pair (u, w) with
    codegree m spans C(m, 2) rectangles through its common neighbors,
    so ``#C4 = Σ_{u<w} C(codeg(u, w), 2) / 2``.  Codegrees come from
    the existing cocitation pipeline over the SYMMETRIC arc table (one
    per-center wedge expansion + one grouped sum — O(Σ deg²) wedges,
    same cost class as triangle counting); the final reduction is
    per-block partial sums, exact ints throughout.
    """
    from igraph_ray.kernels.triads import cocitation_counts

    co = cocitation_counts(arcs, mode="cocitation")

    def partial(batch: pa.Table) -> pa.Table:
        m = batch.column("common").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {"s": pa.array([int((m * (m - 1) // 2).sum())], pa.int64())}
        )

    rows = co.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    total = sum(r["s"] for r in rows)
    if total % 2:
        raise AssertionError("codegree identity violated (odd total)")
    return total // 2
