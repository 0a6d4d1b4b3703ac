"""K4 — triangle counting by degree-ordered wedge enumeration.

Reference semantics: ``networkx.triangles``
(``algorithms/cluster.py:22-95``) — per-vertex incident triangle
counts over a **simple undirected** graph; self-loops ignored
(``cluster.py:62,82``); total triangles = Σ/3 (``cluster.py:53-58``).
The reference uses forward/orientation counting (``later_nbrs``,
``cluster.py:78-93``); we use the equivalent degree-ordered orientation
(BASELINE.json: "degree-ordered wedge enumeration"), which bounds each
vertex's oriented out-degree by O(√E) so wedge volume is
O(E^{3/2}) worst-case instead of Σd².

Pure shuffle pipeline — no iteration, no actor state:

1. canonicalize: ``(a,b) = (min,max)``, drop self-loops, global dedup
   (``groupby(a,b)``) — the simple-graph requirement
   (``cluster.py:98`` rejects multigraphs);
2. degrees via ``groupby`` (K5);
3. attach degrees to both endpoints — **broadcast** the degree table
   via ``ray.put`` into a map_batches lookup when it fits (one object
   read per task, never re-shipped per batch), hash-``join`` otherwise;
4. orient each edge from lower (degree, vid) to higher;
5. wedges: partition oriented edges by hash(u) (one ``groupby(part)``
   shuffle, a handful of Python calls), then emit neighbor pairs with
   fully vectorized size-class triu expansion — no per-vertex Python;
   pairs are ordered by (degree, vid) so the closing edge is oriented;
6. close: when the oriented edge set fits a broadcast, each
   wedge-emitting task probes a fused-key (x<<32|y) sorted array with
   ``searchsorted`` and emits per-task pre-aggregated (vid, count)
   partials — candidate wedges never leave the task; beyond the
   broadcast threshold, a hash-``join`` of wedges against the edge set
   on the pair key is the scale fallback;
7. per-vertex counts: ``groupby(vid).sum`` unioned with zero rows for
   triangle-free vertices.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from igraph_ray.kernels.degree import undirected_degrees

# Degree tables smaller than this are broadcast via ray.put instead of
# a second hash join (SURVEY.md §4: broadcast small sides).
BROADCAST_MAX_VERTICES = 5_000_000

# Per-step cap on expanded candidate-wedge rows inside a close task —
# bounds transient heap (~5 arrays × 8 B × chunk ≈ 160 MB) no matter
# how large one u-partition's wedge volume gets.
_WEDGE_CHUNK = 4_000_000


def canonical_edges(
    edges: ray.data.Dataset, num_parts: int | None = None
) -> ray.data.Dataset:
    """Distinct undirected pairs ``(a < b)``, self-loops dropped.

    Dedup = hash-partition on the pair (one int32 shuffle key — ~10×
    cheaper than a two-int64-column sort shuffle) + vectorized
    per-partition ``lexsort`` dedup, with a per-block partial dedup
    before the shuffle (pre-aggregation, SURVEY.md §4).

    ``num_parts`` defaults to ``n_edges / 250k`` (group ≈ block) — a
    fixed key-space count would make per-group size O(E) at scale."""
    from igraph_ray.utils import hash_int64

    if num_parts is None:
        edges = edges.materialize()
        num_parts = int(max(2, min(65536, edges.count() // 250_000 + 2)))

    def canon(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = src != dst  # self-loops ignored (cluster.py:62)
        src, dst = src[keep], dst[keep]
        a = np.minimum(src, dst)
        b = np.maximum(src, dst)
        # partial dedup within the block before shuffling
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        if len(a):
            first = np.empty(len(a), dtype=bool)
            first[0] = True
            first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            a, b = a[first], b[first]
        with np.errstate(over="ignore"):
            hp = (
                (hash_int64(a) * np.uint64(0x9E3779B97F4A7C15) + hash_int64(b))
                % np.uint64(num_parts)
            ).astype(np.int32)
        return pa.table(
            {"src": pa.array(a), "dst": pa.array(b), "hpart": pa.array(hp)}
        )

    def dedup_group(group: pa.Table) -> pa.Table:
        a = group.column("src").to_numpy(zero_copy_only=False)
        b = group.column("dst").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        if len(a) == 0:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        first = np.empty(len(a), dtype=bool)
        first[0] = True
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return pa.table({"src": pa.array(a[first]), "dst": pa.array(b[first])})

    canon_ds = edges.map_batches(
        canon, batch_format="pyarrow", zero_copy_batch=True
    )
    return canon_ds.groupby("hpart").map_groups(
        dedup_group, batch_format="pyarrow"
    )


class _DegreeLookup:
    """Actor-pool stage: holds the broadcast degree table (fetched once
    per actor from the object store) and attaches (deg_src, deg_dst)."""

    def __init__(self, degrees_ref):
        tbl: pa.Table = ray.get(degrees_ref)
        vids = tbl.column("vid").to_numpy(zero_copy_only=False)
        degs = tbl.column("degree").to_numpy(zero_copy_only=False)
        order = np.argsort(vids)
        self.vids = vids[order]
        self.degs = degs[order]

    def _deg(self, v: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(self.vids, v)
        return self.degs[pos]

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "deg_src": pa.array(self._deg(src).astype(np.int64)),
                "deg_dst": pa.array(self._deg(dst).astype(np.int64)),
            }
        )


def _orient(batch: pa.Table) -> pa.Table:
    """Orient each edge from lower (degree, vid) to higher."""
    src = batch.column("src").to_numpy(zero_copy_only=False)
    dst = batch.column("dst").to_numpy(zero_copy_only=False)
    ds_ = batch.column("deg_src").to_numpy(zero_copy_only=False)
    dd = batch.column("deg_dst").to_numpy(zero_copy_only=False)
    fwd = (ds_ < dd) | ((ds_ == dd) & (src < dst))
    lo = np.where(fwd, src, dst)
    hi = np.where(fwd, dst, src)
    lo_deg = np.where(fwd, ds_, dd)
    hi_deg = np.where(fwd, dd, ds_)
    return pa.table(
        {
            "u": pa.array(lo),
            "v": pa.array(hi),
            "u_deg": pa.array(lo_deg),
            "v_deg": pa.array(hi_deg),
        }
    )


def _emit_wedges_block(group: pa.Table) -> pa.Table:
    """One group = all oriented out-edges of one hash partition of u's.

    Emits every candidate closing pair (x, y) (ordered by (degree,
    vid)) with the wedge corner u.  Fully vectorized: segments per u,
    then per out-degree size class a cached ``triu_indices`` expansion
    over all segments of that size at once.
    """
    empty = pa.table(
        {
            "x": pa.array([], pa.int64()),
            "y": pa.array([], pa.int64()),
            "corner": pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0:
        return empty
    u = group.column("u").to_numpy(zero_copy_only=False)
    v = group.column("v").to_numpy(zero_copy_only=False)
    vd = group.column("v_deg").to_numpy(zero_copy_only=False)
    # sort by (u, (deg, vid) of v) so each u-segment's neighbors are in
    # orientation order
    order = np.lexsort((v, vd, u))
    u, v = u[order], v[order]
    boundary = np.empty(len(u), dtype=bool)
    boundary[0] = True
    boundary[1:] = u[1:] != u[:-1]
    starts = np.flatnonzero(boundary)
    sizes = np.diff(np.append(starts, len(u)))
    keep = sizes >= 2
    starts, sizes = starts[keep], sizes[keep]
    if len(starts) == 0:
        return empty
    xs, ys, cs = [], [], []
    for k in np.unique(sizes):
        iu, ju = np.triu_indices(int(k), 1)
        seg = starts[sizes == k]  # (s,)
        # (s, k(k-1)/2) index matrices, flattened
        xi = (seg[:, None] + iu[None, :]).reshape(-1)
        yi = (seg[:, None] + ju[None, :]).reshape(-1)
        xs.append(v[xi])
        ys.append(v[yi])
        cs.append(np.repeat(u[seg], len(iu)))
    return pa.table(
        {
            "x": pa.array(np.concatenate(xs)),
            "y": pa.array(np.concatenate(ys)),
            "corner": pa.array(np.concatenate(cs)),
        }
    )


def _fits_int32(oriented: ray.data.Dataset) -> bool:
    """True if all vids fit in 31 bits (fused-key broadcast path)."""
    mx = oriented.max(["u", "v"])
    top = max(mx["max(u)"], mx["max(v)"])
    return top < 2**31


def triangle_counts(
    edges: ray.data.Dataset,
    broadcast_max_vertices: int = BROADCAST_MAX_VERTICES,
    vertices: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Per-vertex triangle counts: rows ``(vid, triangles)``.

    ``edges`` may be directed/multi/self-looped — it is canonicalized
    first (direction ignored, like ``igraph_count_adjacent_triangles``
    on an undirected view).

    ``vertices`` (optional, column ``vid``) supplies the full vertex
    set so isolated / self-loop-only vertices appear with count 0,
    matching ``nx.triangles`` returning 0 for every node; without it
    only edge endpoints are emitted.
    """
    simple = canonical_edges(edges).materialize()
    degrees = undirected_degrees(simple).materialize()

    n_vertices = degrees.count()
    if n_vertices <= broadcast_max_vertices:
        deg_table = pa.concat_tables(
            degrees.iter_batches(batch_format="pyarrow", batch_size=None)
        )
        ref = ray.put(deg_table)
        with_deg = simple.map_batches(
            _DegreeLookup,
            fn_constructor_args=(ref,),
            batch_format="pyarrow",
            zero_copy_batch=True,
            # pool sized to the cluster: an 8-actor cap throttled the
            # 500M-row degree attach to 1/4 of the host
            concurrency=(1, max(8, int(ray.cluster_resources().get("CPU", 8)))),
        )
    else:
        # join partition count must not exceed what the cluster can
        # schedule as aggregator actors, or the join deadlocks
        join_parts = int(
            max(2, min(32, ray.cluster_resources().get("CPU", 4) // 2))
        )

        def as_src(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": batch.column("vid"),
                    "deg_src": batch.column("degree"),
                }
            )

        def as_dst(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "dst": batch.column("vid"),
                    "deg_dst": batch.column("degree"),
                }
            )

        d1 = degrees.map_batches(
            as_src, batch_format="pyarrow", zero_copy_batch=True
        )
        d2 = degrees.map_batches(
            as_dst, batch_format="pyarrow", zero_copy_batch=True
        )
        with_deg = simple.join(d1, "inner", join_parts, on=("src",)).join(
            d2, "inner", join_parts, on=("dst",)
        )

    oriented = with_deg.map_batches(
        _orient, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_edges = oriented.count()
    # rows-sized key-space (repo convention, cf. kernels/louvain.py):
    # ~250k oriented edges per close group keeps per-task wedge volume
    # bounded regardless of graph size — a CPU-sized cap would make it
    # O(E·d̄ / cap) at scale.
    num_partitions = int(max(2, min(65536, n_edges // 250_000 + 2)))

    def add_upart(batch: pa.Table) -> pa.Table:
        from igraph_ray.utils import part_of

        u = batch.column("u").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "upart", pa.array(part_of(u, num_partitions))
        )

    # map_groups parallelism follows the sorted BLOCK count, which for
    # a ~32 B/row oriented table is one task per ~4M edges — far too
    # coarse for the wedge-heavy close (CPU per byte is ~100× a normal
    # map).  Split to ~one block per close partition so task count
    # tracks num_partitions, not bytes.
    by_u = oriented.repartition(num_blocks=num_partitions).map_batches(
        add_upart, batch_format="pyarrow", zero_copy_batch=True
    )

    # Close strategy.  Candidate wedges outnumber edges by the average
    # oriented degree (often 10-30×); shipping them through a join is
    # the scale fallback.  When the oriented edge set fits a broadcast
    # (fused (x<<32|y) int64 keys, 8B/edge), each wedge-emitting task
    # instead probes the broadcast set with searchsorted and emits
    # per-task pre-aggregated (vid, tri) partials — candidate wedges
    # never leave the task.
    can_broadcast = n_edges <= broadcast_max_vertices and _fits_int32(
        oriented
    )
    if can_broadcast:
        # build the fused key array with a CONSTANT driver footprint:
        # fuse per block in tasks, stream block columns into one
        # preallocated array, sort in place (introsort, O(1) extra) —
        # the previous concat_tables gather held the full (u, v)
        # table plus fuse temporaries (~6x the array) on the driver,
        # which at 500M edges starved a 128 GB host beside a 64 GiB
        # object store.
        def fuse(batch: pa.Table) -> pa.Table:
            fk = (
                batch.column("u").to_numpy(zero_copy_only=False)
                .astype(np.int64)
                << 32
            ) | batch.column("v").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            return pa.table({"fk": pa.array(fk)})

        fused = np.empty(n_edges, np.int64)
        off = 0
        for blk in oriented.select_columns(["u", "v"]).map_batches(
            fuse, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None):
            arr = blk.column("fk").to_numpy(zero_copy_only=False)
            fused[off : off + len(arr)] = arr
            off += len(arr)
        fused = fused[:off]
        fused.sort()
        pairs_ref = ray.put(fused)
        del fused

        def close_block(group: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "vid": pa.array([], pa.int64()),
                    "tri": pa.array([], pa.int64()),
                }
            )
            if group.num_rows == 0:
                return empty
            pairs = ray.get(pairs_ref)
            u = group.column("u").to_numpy(zero_copy_only=False)
            v = group.column("v").to_numpy(zero_copy_only=False)
            vd = group.column("v_deg").to_numpy(zero_copy_only=False)
            order = np.lexsort((v, vd, u))
            u, v = u[order], v[order]
            boundary = np.empty(len(u), dtype=bool)
            boundary[0] = True
            boundary[1:] = u[1:] != u[:-1]
            starts = np.flatnonzero(boundary)
            sizes = np.diff(np.append(starts, len(u)))
            keep = sizes >= 2
            starts, sizes = starts[keep], sizes[keep]
            if len(starts) == 0:
                return empty
            hits: list[np.ndarray] = []
            for k in np.unique(sizes):
                iu, ju = np.triu_indices(int(k), 1)
                seg_all = starts[sizes == k]
                # chunk the expansion so transient wedge arrays stay
                # ~_WEDGE_CHUNK rows per step regardless of group size
                step = max(1, _WEDGE_CHUNK // len(iu))
                for s0 in range(0, len(seg_all), step):
                    seg = seg_all[s0 : s0 + step]
                    xi = (seg[:, None] + iu[None, :]).reshape(-1)
                    yi = (seg[:, None] + ju[None, :]).reshape(-1)
                    x, y = v[xi], v[yi]
                    key = (x << 32) | y
                    pos = np.searchsorted(pairs, key)
                    pos[pos >= len(pairs)] = len(pairs) - 1
                    hit = pairs[pos] == key
                    if hit.any():
                        c = np.repeat(u[seg], len(iu))[hit]
                        hits.append(
                            np.concatenate([c, x[hit], y[hit]])
                        )
            if not hits:
                return empty
            uv, counts = np.unique(np.concatenate(hits), return_counts=True)
            return pa.table(
                {
                    "vid": pa.array(uv),
                    "tri": pa.array(counts.astype(np.int64)),
                }
            )

        corners = by_u.groupby("upart").map_groups(
            close_block, batch_format="pyarrow"
        )
    else:
        wedges = by_u.groupby("upart").map_groups(
            _emit_wedges_block, batch_format="pyarrow"
        )

        def as_pair(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"x": batch.column("u"), "y": batch.column("v")}
            )

        pair_keys = oriented.map_batches(
            as_pair, batch_format="pyarrow", zero_copy_batch=True
        )
        join_parts = int(
            max(2, min(num_partitions, ray.cluster_resources().get("CPU", 4) // 2))
        )
        matched = wedges.join(
            pair_keys, "inner", join_parts, on=("x", "y")
        )

        def corner_rows(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "vid": pa.concat_arrays(
                        [
                            batch.column("corner").combine_chunks(),
                            batch.column("x").combine_chunks(),
                            batch.column("y").combine_chunks(),
                        ]
                    ),
                    "tri": pa.array(np.ones(3 * len(batch), np.int64)),
                }
            )

        corners = matched.map_batches(
            corner_rows, batch_format="pyarrow", zero_copy_batch=True
        )

    # union zero rows so triangle-free vertices appear with count 0
    def zero_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "tri": pa.array(np.zeros(len(batch), np.int64)),
            }
        )

    zeros = degrees.map_batches(
        zero_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    if vertices is not None:
        # extra zero rows are harmless under Sum (0 contribution), so
        # no dedup against the endpoint-derived zeros is needed
        zeros = zeros.union(
            vertices.select_columns(["vid"]).map_batches(
                zero_rows, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    return _sum_tri_by_vid(corners.union(zeros))


def _sum_tri_by_vid(partials: ray.data.Dataset) -> ray.data.Dataset:
    """Grouped sum of (vid, tri) partials → (vid, triangles).

    The close tasks pre-aggregate, so partials hold only a few rows
    per vertex; the generic sort-based ``groupby(vid).aggregate(Sum)``
    still cost ~35 s at 12M edges (64-bit key sort + python combine).
    Same partial/hpart/reduceat pattern as ``undirected_degrees``:
    per-block np.unique pre-combine, one int32-key shuffle, vectorized
    reduceat — measured ~20× faster on the same input.
    """
    from igraph_ray.utils import part_of

    num_parts = 32

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("vid").to_numpy(zero_copy_only=False)
        t = batch.column("tri").to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v, t = v[order], t[order]
        if len(v) == 0:
            return pa.table(
                {
                    "vid": pa.array([], pa.int64()),
                    "tri": pa.array([], pa.int64()),
                    "hpart": pa.array([], pa.int32()),
                }
            )
        first = np.empty(len(v), dtype=bool)
        first[0] = True
        first[1:] = v[1:] != v[:-1]
        seg = np.flatnonzero(first)
        uv = v[seg]
        return pa.table(
            {
                "vid": pa.array(uv),
                "tri": pa.array(np.add.reduceat(t, seg)),
                "hpart": pa.array(part_of(uv, num_parts)),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        v = group.column("vid").to_numpy(zero_copy_only=False)
        t = group.column("tri").to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v, t = v[order], t[order]
        if len(v) == 0:
            return pa.table(
                {
                    "vid": pa.array([], pa.int64()),
                    "triangles": pa.array([], pa.int64()),
                }
            )
        first = np.empty(len(v), dtype=bool)
        first[0] = True
        first[1:] = v[1:] != v[:-1]
        seg = np.flatnonzero(first)
        return pa.table(
            {
                "vid": pa.array(v[seg]),
                "triangles": pa.array(np.add.reduceat(t, seg)),
            }
        )

    return (
        partials.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("hpart")
        .map_groups(combine, batch_format="pyarrow")
    )


def triangle_list(
    edges: ray.data.Dataset,
    broadcast_max_vertices: int = BROADCAST_MAX_VERTICES,
) -> ray.data.Dataset:
    """Enumerate triangles as rows ``(a < b < c)`` — the
    ``igraph_list_triangles`` surface.  Same wedge pipeline as
    :func:`triangle_counts`, emitting the matched triples instead of
    per-corner counts."""
    simple = canonical_edges(edges).materialize()
    degrees = undirected_degrees(simple).materialize()
    n_vertices = degrees.count()
    if n_vertices > broadcast_max_vertices:  # pragma: no cover
        raise NotImplementedError(
            "triangle_list currently requires the broadcast close path"
        )
    deg_table = pa.concat_tables(
        degrees.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    ref = ray.put(deg_table)
    with_deg = simple.map_batches(
        _DegreeLookup,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, max(8, int(ray.cluster_resources().get("CPU", 8)))),
    )
    oriented = with_deg.map_batches(
        _orient, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if not _fits_int32(oriented):  # pragma: no cover
        # the fused (x<<32)|y key collides for vids >= 2^31; the counts
        # path falls back to the join close, this listing path has no
        # fallback yet
        raise NotImplementedError(
            "triangle_list requires vertex ids < 2^31 (fused-key close)"
        )
    n_edges = oriented.count()
    # rows-sized key-space (repo convention, cf. kernels/louvain.py):
    # ~250k oriented edges per close group keeps per-task wedge volume
    # bounded regardless of graph size — a CPU-sized cap would make it
    # O(E·d̄ / cap) at scale.
    num_partitions = int(max(2, min(65536, n_edges // 250_000 + 2)))

    # constant-footprint fused-key build (see triangle_counts)
    def _fuse(batch: pa.Table) -> pa.Table:
        fk = (
            batch.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
            << 32
        ) | batch.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"fk": pa.array(fk)})

    fused = np.empty(n_edges, np.int64)
    off = 0
    for blk in oriented.select_columns(["u", "v"]).map_batches(
        _fuse, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        arr = blk.column("fk").to_numpy(zero_copy_only=False)
        fused[off : off + len(arr)] = arr
        off += len(arr)
    fused = fused[:off]
    fused.sort()
    pairs_ref = ray.put(fused)
    del fused

    def add_upart(batch: pa.Table) -> pa.Table:
        from igraph_ray.utils import part_of

        u = batch.column("u").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "upart", pa.array(part_of(u, num_partitions))
        )

    def list_block(group: pa.Table) -> pa.Table:
        w = _emit_wedges_block(group)
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        if w.num_rows == 0:
            return empty
        pairs = ray.get(pairs_ref)
        x = w.column("x").to_numpy(zero_copy_only=False)
        y = w.column("y").to_numpy(zero_copy_only=False)
        corner = w.column("corner").to_numpy(zero_copy_only=False)
        key = (x << 32) | y
        pos = np.searchsorted(pairs, key)
        pos[pos >= len(pairs)] = len(pairs) - 1
        hit = pairs[pos] == key
        if not hit.any():
            return empty
        tri = np.stack([corner[hit], x[hit], y[hit]])
        tri.sort(axis=0)  # canonical a < b < c
        return pa.table(
            {
                "a": pa.array(tri[0]),
                "b": pa.array(tri[1]),
                "c": pa.array(tri[2]),
            }
        )

    return (
        oriented.map_batches(
            add_upart, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("upart")
        .map_groups(list_block, batch_format="pyarrow")
    )


def total_triangles(per_vertex: ray.data.Dataset) -> int:
    """Total triangle count = Σ per-vertex / 3 (cluster.py:53-58)."""
    s = per_vertex.sum("triangles") or 0
    return int(s) // 3


def local_clustering(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Per-vertex local clustering coefficient
    ``c(v) = triangles(v) / (d(v)·(d(v)−1)/2)`` (0 when d < 2) —
    igraph's ``transitivity_local_undirected`` / ``nx.clustering``."""
    simple = canonical_edges(edges).materialize()
    counts = triangle_counts(simple).materialize()
    degrees = undirected_degrees(simple)

    def tag_deg(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "triangles": pa.array(np.zeros(len(batch), np.int64)),
                "degree": batch.column("degree"),
            }
        )

    def tag_tri(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "triangles": batch.column("triangles"),
                "degree": pa.array(np.zeros(len(batch), np.int64)),
            }
        )

    merged = (
        counts.map_batches(tag_tri, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            degrees.map_batches(
                tag_deg, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby("vid")
        .aggregate(
            Sum("triangles", alias_name="triangles"),
            Sum("degree", alias_name="degree"),
        )
    )

    def coeff(batch: pa.Table) -> pa.Table:
        t = batch.column("triangles").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        d = batch.column("degree").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        denom = d * (d - 1) / 2.0
        c = np.where(denom > 0, t / np.maximum(denom, 1.0), 0.0)
        return pa.table(
            {"vid": batch.column("vid"), "clustering": pa.array(c)}
        )

    return merged.map_batches(
        coeff, batch_format="pyarrow", zero_copy_batch=True
    )


def transitivity(edges: ray.data.Dataset) -> float:
    """3·triangles / triads (``cluster.py:500,532-541``)."""
    simple = canonical_edges(edges).materialize()
    degrees = undirected_degrees(simple)
    per_vertex = triangle_counts(simple)
    tri_sum = float(per_vertex.sum("triangles") or 0.0)

    def triads(batch: pa.Table) -> pa.Table:
        d = batch.column("degree").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"triads": pa.array(d * (d - 1) / 2.0)})

    triad_sum = float(
        degrees.map_batches(
            triads, batch_format="pyarrow", zero_copy_batch=True
        ).sum("triads")
        or 0.0
    )
    if triad_sum == 0:
        return 0.0
    return tri_sum / triad_sum
