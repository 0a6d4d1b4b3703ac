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


def _closed_wedges(
    pairs: ray.data.Dataset,
    num_parts: int | None = None,
    max_degree: int | None = None,
) -> ray.data.Dataset:
    """Shared centre-retaining wedge close: rows
    ``(centre, a, b, cod, theta)`` — one per wedge (a < b neighbours
    of centre), with the pair's codegree and edge membership resolved
    inside ONE pair-keyed hash co-partition (no separate join).
    Substrate of ``square_clustering`` and ``local_efficiency``."""
    import math as _math

    from igraph_ray.utils import hash_int64

    n_edges = pairs.count()
    if num_parts is None:
        num_parts = int(
            max(2, min(256, _math.ceil(max(1, n_edges) / 250_000)))
        )

    def arcs_with_part(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        u = np.concatenate([s, d])
        v = np.concatenate([d, s])
        part = (hash_int64(u) % np.uint64(num_parts)).astype(np.int32)
        return pa.table(
            {"hpart": pa.array(part), "u": pa.array(u), "v": pa.array(v)}
        )

    arcs = pairs.map_batches(
        arcs_with_part, batch_format="pyarrow", zero_copy_batch=True
    )

    def centre_wedges(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        u, v = u[order], v[order]
        boundary = np.empty(len(u), dtype=bool)
        if len(u):
            boundary[0] = True
            boundary[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(boundary)
        ends = np.append(starts[1:], len(u))
        out_c, out_a, out_b = [], [], []
        for s0, e0 in zip(starts, ends):
            d = e0 - s0
            if d < 2 or (max_degree is not None and d > max_degree):
                continue
            nb = np.sort(v[s0:e0])
            ii, jj = np.triu_indices(d, k=1)
            out_c.append(np.full(len(ii), u[s0]))
            out_a.append(nb[ii])
            out_b.append(nb[jj])
        if out_c:
            c = np.concatenate(out_c)
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
        else:
            c = a = b = np.empty(0, np.int64)
        return pa.table(
            {
                "centre": pa.array(c),
                "a": pa.array(a),
                "b": pa.array(b),
                "kind": pa.array(np.zeros(len(c), np.int8)),
            }
        )

    wedges = arcs.groupby("hpart").map_groups(
        centre_wedges, batch_format="pyarrow"
    )

    def edge_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "centre": pa.array(np.full(len(s), -1, np.int64)),
                "a": pa.array(np.minimum(s, d)),
                "b": pa.array(np.maximum(s, d)),
                "kind": pa.array(np.ones(len(s), np.int8)),
            }
        )

    tagged = wedges.union(
        pairs.map_batches(
            edge_rows, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def with_pair_part(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        hp = (
            hash_int64(a * np.int64(1_000_003) + b) % np.uint64(num_parts)
        ).astype(np.int32)
        return batch.append_column("hp", pa.array(hp))

    tagged = tagged.map_batches(
        with_pair_part, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_pair(group: pa.Table) -> pa.Table:
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        c = group.column("centre").to_numpy(zero_copy_only=False)
        k = group.column("kind").to_numpy(zero_copy_only=False)
        order = np.lexsort((k, b, a))
        a, b, c, k = a[order], b[order], c[order], k[order]
        boundary = np.empty(len(a), dtype=bool)
        if len(a):
            boundary[0] = True
            boundary[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(boundary)
        run = np.cumsum(boundary) - 1  # run id per row
        n_wedge = np.bincount(run, weights=(k == 0), minlength=len(starts))
        has_edge = np.bincount(run, weights=(k == 1), minlength=len(starts))
        m = k == 0
        return pa.table(
            {
                "centre": pa.array(c[m]),
                "a": pa.array(a[m]),
                "b": pa.array(b[m]),
                "cod": pa.array(n_wedge[run[m]].astype(np.int64)),
                "theta": pa.array(
                    (has_edge[run[m]] > 0).astype(np.int64)
                ),
            }
        )

    return tagged.groupby("hp").map_groups(per_pair, batch_format="pyarrow")


def square_clustering(
    pairs: ray.data.Dataset,
    vertices: ray.data.Dataset | None = None,
    num_parts: int | None = None,
    max_degree: int | None = None,
) -> ray.data.Dataset:
    """Per-vertex squares (4-cycle) clustering coefficient —
    ``nx.square_clustering`` (Lind–González–Herrmann 2005, as amended
    by Zhang et al. 2008):

        C4(v) = Σ_{u<w ∈ N(v)} q_v(u,w) / Σ_{u<w} [a_v(u,w) + q_v(u,w)]

    with q_v(u,w) = |N(u)∩N(w)| − 1 (common neighbours besides v) and
    a_v(u,w) + q_v(u,w) = deg(u) + deg(w) − 1 − 2·θ_uw − |N(u)∩N(w)|
    (θ_uw = 1 iff u~w).  Both per-vertex sums are exact integers; the
    final value is ONE IEEE division — bitwise SQL-twinnable.

    Shape: the shared ``_closed_wedges`` close (Σ deg² rows — the
    triangle-counting bound, hub-cappable via ``max_degree``), degree
    broadcast, one per-vertex sum shuffle.  Rows: ``(vid, squares)``
    zero-filled over ``vertices`` when given.
    """
    from igraph_ray.kernels.metrics import _degree_map, attach_degrees

    closed = _closed_wedges(pairs, num_parts=num_parts, max_degree=max_degree)
    degrees = _degree_map(pairs)
    with_deg = attach_degrees(closed, degrees, cols=("a", "b"))

    def partial(batch: pa.Table) -> pa.Table:
        cod = batch.column("cod").to_numpy(zero_copy_only=False)
        th = batch.column("theta").to_numpy(zero_copy_only=False)
        da = batch.column("deg_a").to_numpy(zero_copy_only=False)
        db = batch.column("deg_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": batch.column("centre"),
                "num": pa.array(cod - 1),
                "den": pa.array(da + db - 1 - 2 * th - cod),
            }
        )

    sums = (
        with_deg.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("vid")
        .aggregate(Sum("num", alias_name="num"), Sum("den", alias_name="den"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        num = batch.column("num").to_numpy(zero_copy_only=False)
        den = batch.column("den").to_numpy(zero_copy_only=False)
        sq = np.where(den > 0, num / np.maximum(den, 1), 0.0)
        return pa.table(
            {"vid": batch.column("vid"), "squares": pa.array(sq)}
        )

    out = sums.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )
    if vertices is None:
        return out

    def zero_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "squares": pa.array(
                    np.zeros(batch.num_rows, np.float64)
                ),
            }
        )

    zeros = vertices.select_columns(["vid"]).map_batches(
        zero_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    from ray.data.aggregate import Max

    return (
        out.union(zeros)
        .groupby("vid")
        .aggregate(Max("squares", alias_name="squares"))
    )


def local_efficiency(
    pairs: ray.data.Dataset,
    num_vertices: int,
    num_parts: int | None = None,
    max_degree: int | None = None,
) -> float:
    """Average local efficiency — ``nx.local_efficiency``: the mean
    over all vertices v of the global efficiency of the subgraph
    induced by N(v) (vertices with deg < 2 contribute 0; Latora &
    Marchiori 2001).

    Shape: the shared ``_closed_wedges`` close already delivers, per
    centre v, every unordered pair of its neighbours WITH the edge
    flag — exactly the induced subgraph's node pairs and edge set.
    One ``groupby(centre)`` then runs the all-pairs BFS inside each
    neighbourhood (k = deg(v) nodes, the same per-group bound the
    maximal-cliques kernel carries); a final tree aggregate averages
    over ``num_vertices``.  Per-vertex efficiency is a rational
    Σ 1/d / (k(k−1)) — parity vs nx to 1e-12 (pytest oracle).
    """
    from ray.data.aggregate import Sum

    closed = _closed_wedges(pairs, num_parts=num_parts, max_degree=max_degree)

    def neighborhood_eff(group: pa.Table) -> pa.Table:
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        th = group.column("theta").to_numpy(zero_copy_only=False)
        nodes = np.unique(np.concatenate([a, b]))
        k = len(nodes)
        if k < 2:
            return pa.table({"eff": pa.array([], pa.float64())})
        ia = np.searchsorted(nodes, a)
        ib = np.searchsorted(nodes, b)
        # adjacency of the induced subgraph (only theta==1 pairs)
        m = th == 1
        adj = [[] for _ in range(k)]
        for x, y in zip(ia[m], ib[m]):
            adj[x].append(y)
            adj[y].append(x)
        inv_sum = 0.0
        for s in range(k):
            # BFS within the neighbourhood
            dist = np.full(k, -1, np.int64)
            dist[s] = 0
            frontier = [s]
            d = 0
            while frontier:
                d += 1
                nxt = []
                for u in frontier:
                    for w in adj[u]:
                        if dist[w] < 0:
                            dist[w] = d
                            nxt.append(w)
                frontier = nxt
            reach = dist > 0
            if reach.any():
                inv_sum += float(np.sum(1.0 / dist[reach]))
        return pa.table(
            {"eff": pa.array([inv_sum / (k * (k - 1))], pa.float64())}
        )

    effs = closed.groupby("centre").map_groups(
        neighborhood_eff, batch_format="pyarrow"
    )
    total = effs.aggregate(Sum("eff", alias_name="s"))["s"] or 0.0
    return float(total) / float(num_vertices)
