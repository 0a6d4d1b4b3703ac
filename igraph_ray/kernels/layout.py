"""Force-directed graph layout — igraph ``layout_fruchterman_reingold``
semantics (Fruchterman & Reingold 1991, "Graph Drawing by
Force-directed Placement"): attraction d²/k along edges, repulsion
k²/d between all vertex pairs, displacement capped by a cooling
temperature.

Distributed shape per iteration (driver-phased loop, like VoteRank):

1. positions are a Dataset ``(part, vid, x, y)`` aligned with the
   partitioned CSR; the iteration maps over CSR partitions (worker-
   global cache — the chassis' stateful-stage realization);
2. repulsion is grid-approximated: a ``g×g`` occupancy summary
   (cell count + centroid — O(g²) rows) is aggregated and broadcast;
   each vertex sees exact pairwise repulsion from its OWN cell's
   members (shipped via the same broadcast, bounded) and
   centroid-lumped repulsion from every other cell — the classic
   Barnes-Hut-style far-field approximation;
3. attraction uses the partition's own CSR arcs against the broadcast
   position table.

The position broadcast bounds this kernel to
``BROADCAST_MAX_VERTICES`` vertices (registered raise beyond) —
layouts are a visualization surface, inherently bounded by what can
be drawn; the documented scale path for bigger graphs is laying out
the quotient graph of a community partition.

Deterministic: splitmix64 initial positions, no RNG anywhere else.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.kernels.base import _cached_csr
from igraph_ray.stages.partition import GraphMeta
from igraph_ray.stages.vertex_ids import BROADCAST_MAX_VERTICES
from igraph_ray.utils import hash_int64


def _init_positions(vids: np.ndarray) -> np.ndarray:
    h1 = hash_int64(vids).astype(np.float64) / 2.0**64
    h2 = hash_int64(vids + np.int64(0x9E3779B9)).astype(np.float64) / 2.0**64
    return np.stack([h1, h2], axis=1)


def fruchterman_reingold(
    graph: GraphMeta,
    iterations: int = 50,
    grid: int = 16,
    broadcast_max_vertices: int = BROADCAST_MAX_VERTICES,
) -> ray.data.Dataset:
    """Rows ``(vid, x, y)`` — final layout in the unit square."""
    # gather the vid universe once from the CSR blocks (bounded)
    parts_ds = ray.data.from_arrow(
        pa.table({"part": pa.array(graph.parts, pa.int32())})
    ).repartition(num_blocks=max(1, len(graph.parts)))

    def vid_rows(batch: pa.Table) -> pa.Table:
        out = []
        for part in batch.column("part").to_pylist():
            csr = _cached_csr(graph, int(part))
            vids = csr.get("vids", np.empty(0, np.int64))
            out.append(
                pa.table(
                    {
                        "part": pa.array(
                            np.full(len(vids), part, np.int32)
                        ),
                        "vid": pa.array(vids.astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(out)

    vid_tbl = pa.concat_tables(
        parts_ds.map_batches(
            vid_rows, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("vid")
    all_vids = vid_tbl.column("vid").to_numpy(zero_copy_only=False)
    n = len(all_vids)
    if n > broadcast_max_vertices:
        raise NotImplementedError(
            f"fruchterman_reingold broadcasts the position table; "
            f"{n} vertices exceeds {broadcast_max_vertices} — lay out "
            f"the community quotient graph instead"
        )
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "vid": pa.array([], pa.int64()),
                    "x": pa.array([], pa.float64()),
                    "y": pa.array([], pa.float64()),
                }
            )
        )
    pos = _init_positions(all_vids)
    k = np.sqrt(1.0 / n)  # ideal edge length in the unit square

    for it in range(iterations):
        temp = 0.1 * (1.0 - it / iterations) + 1e-4
        pref = ray.put((all_vids, pos))

        def step(batch: pa.Table, _pref=pref, _temp=temp) -> pa.Table:
            vids_sorted, p = ray.get(_pref)
            outs = []
            for part in batch.column("part").to_pylist():
                csr = _cached_csr(graph, int(part))
                vids = csr.get("vids", np.empty(0, np.int64))
                if len(vids) == 0:
                    continue
                my = np.searchsorted(vids_sorted, vids)
                mp = p[my]  # (m, 2) positions of owned vertices
                disp = np.zeros_like(mp)
                # --- repulsion: grid summary over ALL vertices ---
                cells = np.minimum(
                    (p * grid).astype(np.int64), grid - 1
                )
                cell_id = cells[:, 0] * grid + cells[:, 1]
                order = np.argsort(cell_id, kind="stable")
                cid_s = cell_id[order]
                first = np.empty(len(cid_s), dtype=bool)
                first[0] = True
                first[1:] = cid_s[1:] != cid_s[:-1]
                starts = np.flatnonzero(first)
                counts = np.diff(np.append(starts, len(cid_s)))
                cents = (
                    np.add.reduceat(p[order], starts, axis=0)
                    / counts[:, None]
                )
                ucells = cid_s[starts]
                my_cell = cell_id[my]
                # far-field: centroid-lumped repulsion from every cell
                for ci, cnt, cen in zip(ucells, counts, cents):
                    d = mp - cen[None, :]
                    same = my_cell == ci
                    dist2 = (d * d).sum(axis=1) + 1e-9
                    f = (k * k) / dist2
                    contrib = d * (f * cnt)[:, None]
                    # own cell handled exactly below
                    contrib[same] = 0.0
                    disp += contrib
                    if same.any():
                        members = p[order[
                            np.searchsorted(cid_s, ci, side="left"):
                            np.searchsorted(cid_s, ci, side="right")
                        ]]
                        mine = mp[same]
                        dd = mine[:, None, :] - members[None, :, :]
                        dist2l = (dd * dd).sum(axis=2) + 1e-9
                        fl = (k * k) / dist2l
                        disp[same] += (dd * fl[:, :, None]).sum(axis=1)
                # --- attraction along this partition's arcs ---
                src_pos = csr.get("src_pos", np.empty(0, np.int64))
                if len(src_pos):
                    seg_start = csr["seg_start"]
                    seg_id = (
                        np.searchsorted(
                            seg_start, np.arange(len(src_pos)), "right"
                        )
                        - 1
                    )
                    dst = csr["seg_dst"][seg_id]
                    dpos = p[np.searchsorted(vids_sorted, dst)]
                    spos = mp[src_pos]
                    d = spos - dpos
                    dist = np.sqrt((d * d).sum(axis=1)) + 1e-9
                    f = dist / k  # attraction magnitude d/k (×d later)
                    pull = d * (f / 1.0)[:, None]
                    np.subtract.at(disp, src_pos, pull * 1.0)
                # --- apply with temperature cap ---
                dlen = np.sqrt((disp * disp).sum(axis=1)) + 1e-12
                scale = np.minimum(dlen, _temp) / dlen
                newp = np.clip(mp + disp * scale[:, None], 0.0, 1.0)
                outs.append(
                    pa.table(
                        {
                            "vid": pa.array(vids.astype(np.int64)),
                            "x": pa.array(newp[:, 0]),
                            "y": pa.array(newp[:, 1]),
                        }
                    )
                )
            if not outs:
                return pa.table(
                    {
                        "vid": pa.array([], pa.int64()),
                        "x": pa.array([], pa.float64()),
                        "y": pa.array([], pa.float64()),
                    }
                )
            return pa.concat_tables(outs)

        upd = pa.concat_tables(
            parts_ds.map_batches(
                step, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        ).sort_by("vid")
        pos = np.stack(
            [
                upd.column("x").to_numpy(zero_copy_only=False),
                upd.column("y").to_numpy(zero_copy_only=False),
            ],
            axis=1,
        )

    return ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(all_vids),
                "x": pa.array(pos[:, 0]),
                "y": pa.array(pos[:, 1]),
            }
        )
    )


# ---------------------------------------------------------------------------
# Kamada-Kawai (stress majorization over pivot distances)
# ---------------------------------------------------------------------------
def kamada_kawai(
    graph: GraphMeta,
    vids: np.ndarray,
    iterations: int = 50,
    n_pivots: int = 64,
) -> tuple[ray.data.Dataset, list[float]]:
    """Rows ``(vid, x, y)`` plus the per-iteration stress trace —
    igraph ``layout_kamada_kawai`` semantics (energy = weighted
    squared mismatch between layout and graph-theoretic distances,
    Kamada & Kawai 1989) optimized by STRESS MAJORIZATION (SMACOF;
    Gansner, Koren & North 2004) — the modern optimizer for the same
    objective, guaranteed monotone non-increasing stress.

    Distributed shape: k <= 64 deterministic pivots (splitmix-ordered
    vids, so they spread hash-uniformly) anchor the stress — exactly
    the sparse/pivot stress model of Ortmann et al. 2017, which
    coincides with full Kamada-Kawai when the graph has <= k
    vertices.  One multi-BFS chassis run computes every vertex's
    pivot-distance vector ONCE; each majorization iteration is a
    single map over the state with the k pivot positions broadcast
    (k rows — never the position table), so per-iteration cost is
    O(V*k / cluster) with no shuffle.  Unreachable (inf) pivot
    distances get zero stress weight; vertices unreachable from every
    pivot keep their deterministic initial positions.

    Determinism: splitmix init, fixed iteration count, hash-derived
    tie directions for coincident points — POSITIONS are bitwise
    partition-invariant (each vertex computes only against the
    broadcast pivot table).  The returned stress trace is a
    diagnostic whose float addition order follows the block layout;
    compare it with allclose, not equality."""
    from igraph_ray.kernels.multibfs import pivot_distances

    vids = np.unique(np.asarray(vids, np.int64))
    order = np.argsort(hash_int64(vids), kind="stable")
    pivots = vids[order[: min(n_pivots, len(vids))]]
    pivots = np.sort(pivots)
    run = pivot_distances(graph, pivots)
    k = len(pivots)

    state = run.state.materialize()
    dcols = [f"d{i}" for i in range(k)]

    def init_xy(batch: pa.Table) -> pa.Table:
        v = batch.column("vid").to_numpy(zero_copy_only=False)
        pos = _init_positions(v)
        keep = {
            "vid": batch.column("vid"),
            **{c: batch.column(c) for c in dcols},
        }
        keep["x"] = pa.array(pos[:, 0])
        keep["y"] = pa.array(pos[:, 1])
        return pa.table(keep)

    state = state.map_batches(
        init_xy, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def pivot_rows(tbl_state) -> np.ndarray:
        """(k, 2) pivot positions, in pivot order (bounded gather)."""
        def keep(batch: pa.Table) -> pa.Table:
            v = batch.column("vid").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(pivots, v)
            pos_c = np.clip(pos, 0, k - 1)
            m = pivots[pos_c] == v
            return batch.filter(pa.array(m))

        rows = pa.concat_tables(
            tbl_state.map_batches(
                keep, batch_format="pyarrow", zero_copy_batch=True
            )
            .select_columns(["vid", "x", "y"])
            .iter_batches(batch_format="pyarrow", batch_size=None)
        ).sort_by("vid")
        out = np.stack(
            [
                rows.column("x").to_numpy(zero_copy_only=False),
                rows.column("y").to_numpy(zero_copy_only=False),
            ],
            axis=1,
        )
        if len(out) != k:
            raise AssertionError("pivot positions incomplete")
        return out

    stress_trace: list[float] = []
    for _it in range(iterations):
        ppos = pivot_rows(state)
        ref = ray.put(ppos)

        def step(batch: pa.Table, _ref=ref) -> pa.Table:
            P = ray.get(_ref)  # (k, 2)
            v = batch.column("vid").to_numpy(zero_copy_only=False)
            x = batch.column("x").to_numpy(zero_copy_only=False)
            y = batch.column("y").to_numpy(zero_copy_only=False)
            D = np.stack(
                [
                    batch.column(c).to_numpy(zero_copy_only=False)
                    for c in dcols
                ],
                axis=1,
            )  # (n, k) hop distances, inf if unreachable
            finite = np.isfinite(D) & (D > 0)
            W = np.where(finite, 1.0 / np.maximum(D, 1e-12) ** 2, 0.0)
            dx = x[:, None] - P[None, :, 0]
            dy = y[:, None] - P[None, :, 1]
            norm = np.sqrt(dx * dx + dy * dy)
            # coincident points: deterministic hash direction
            zero = norm < 1e-12
            if zero.any():
                ang = (
                    hash_int64(
                        (v[:, None] * np.int64(k) + np.arange(k))[zero]
                    ).astype(np.float64)
                    / 2.0**64
                    * 2.0
                    * np.pi
                )
                dx[zero] = np.cos(ang) * 1e-9
                dy[zero] = np.sin(ang) * 1e-9
                norm[zero] = 1e-9
            # SMACOF update: weighted mean of pivot + d * unit(x - p);
            # inf distances must be masked BEFORE the product — W is 0
            # there, but 0 * inf is NaN
            Dm = np.where(finite, D, 0.0)
            tx = P[None, :, 0] + Dm * dx / norm
            ty = P[None, :, 1] + Dm * dy / norm
            wsum = W.sum(axis=1)
            live = wsum > 0
            nx_ = np.where(live, (W * tx).sum(axis=1) / np.maximum(wsum, 1e-300), x)
            ny_ = np.where(live, (W * ty).sum(axis=1) / np.maximum(wsum, 1e-300), y)
            # stress of the CURRENT layout (pre-update) for the trace
            s = float((W * (norm - Dm) ** 2).sum())
            out = {
                "vid": batch.column("vid"),
                **{c: batch.column(c) for c in dcols},
                "x": pa.array(nx_),
                "y": pa.array(ny_),
                "stress": pa.array(
                    np.r_[s, np.zeros(max(0, len(v) - 1))]
                    if len(v)
                    else np.empty(0)
                ),
            }
            return pa.table(out)

        state = state.map_batches(
            step, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        stress_trace.append(float(state.sum("stress")))
        state = state.drop_columns(["stress"]).materialize()

    out = state.select_columns(["vid", "x", "y"])
    return out, stress_trace


# ---------------------------------------------------------------------------
# Closed-form / tree layouts (igraph layout_circle / layout_star /
# layout_grid / layout_reingold_tilford)
# ---------------------------------------------------------------------------
#
# circle/star/grid are per-vertex closed forms — pure distributed
# map_batches over the vertex table, no bound.  The Reingold–Tilford
# tree layout needs the whole parent forest (the classic algorithm is
# a sequential post-order sweep), so like FR/KK it is a
# BROADCAST-bounded visualization surface: the BFS parent forest
# comes from the distributed SSSP kernel, the sweep runs once on the
# gathered (bounded) forest.


def circle_layout(
    vertices: ray.data.Dataset, n: int
) -> ray.data.Dataset:
    """Rows ``(vid, x, y)`` — vertex vid at angle 2π·vid/n on the
    unit circle (igraph ``layout_circle``: vertices in id order)."""

    def place(batch: pa.Table) -> pa.Table:
        vid = batch.column("vid").to_numpy(zero_copy_only=False)
        ang = 2.0 * np.pi * vid.astype(np.float64) / max(1, n)
        return pa.table(
            {
                "vid": batch.column("vid"),
                "x": pa.array(np.cos(ang)),
                "y": pa.array(np.sin(ang)),
            }
        )

    return vertices.map_batches(
        place, batch_format="pyarrow", zero_copy_batch=True
    )


def star_layout(
    vertices: ray.data.Dataset, n: int, center: int = 0
) -> ray.data.Dataset:
    """Rows ``(vid, x, y)`` — ``center`` at the origin, every other
    vertex on the unit circle in id order (igraph ``layout_star``)."""

    def place(batch: pa.Table) -> pa.Table:
        vid = batch.column("vid").to_numpy(zero_copy_only=False)
        # rank among non-center vertices in id order
        rank = vid.astype(np.int64).copy()
        rank[vid > center] -= 1
        ang = 2.0 * np.pi * rank.astype(np.float64) / max(1, n - 1)
        x = np.where(vid == center, 0.0, np.cos(ang))
        y = np.where(vid == center, 0.0, np.sin(ang))
        return pa.table(
            {
                "vid": batch.column("vid"),
                "x": pa.array(x),
                "y": pa.array(y),
            }
        )

    return vertices.map_batches(
        place, batch_format="pyarrow", zero_copy_batch=True
    )


def grid_layout(
    vertices: ray.data.Dataset, n: int, width: int | None = None
) -> ray.data.Dataset:
    """Rows ``(vid, x, y)`` — row-major integer grid, default width
    ``ceil(sqrt(n))`` (igraph ``layout_grid``).  Exact integers —
    the driver's DuckDB twin replays it bitwise."""
    w = width or int(np.ceil(np.sqrt(max(1, n))))

    def place(batch: pa.Table) -> pa.Table:
        vid = batch.column("vid").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": batch.column("vid"),
                "x": pa.array((vid % w).astype(np.int64)),
                "y": pa.array((vid // w).astype(np.int64)),
            }
        )

    return vertices.map_batches(
        place, batch_format="pyarrow", zero_copy_batch=True
    )


def reingold_tilford(
    graph: GraphMeta,
    root: int = 0,
    broadcast_max_vertices: int = BROADCAST_MAX_VERTICES,
) -> pa.Table:
    """(vid, x, y) — simplified Reingold–Tilford tree layout over the
    BFS forest of the graph (igraph ``layout_reingold_tilford``
    semantics: y = BFS depth from the root, children ordered by vid,
    leaves at consecutive integer x in post-order, internal vertices
    centered over their children).  Vertices OUTSIDE the root's
    component have no parent in the BFS forest and are placed as
    depth-0 singleton roots to the right of the tree, in vid order
    (igraph lays out such vertices via additional roots; pass their
    vids as extra ``shortest_path_tree`` sources for full multi-root
    parity — future surface).  The parent forest comes from the
    distributed BFS-tree kernel; the post-order sweep runs on the
    gathered (BROADCAST-bounded) forest — a visualization surface,
    like FR/KK."""
    from igraph_ray.kernels.sssp import shortest_path_tree

    if graph.num_vertices > broadcast_max_vertices:
        raise NotImplementedError(
            f"reingold_tilford layout bound: {graph.num_vertices} "
            f"vertices > {broadcast_max_vertices}; lay out a quotient"
        )
    run = shortest_path_tree(graph, source=root, weighted=False)
    tbl = pa.concat_tables(
        run.state.select_columns(["vid", "dist", "parent"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    vids = tbl.column("vid").to_numpy(zero_copy_only=False)
    parent = tbl.column("parent").to_numpy(zero_copy_only=False).copy()
    dist = tbl.column("dist").to_numpy(zero_copy_only=False)

    pos = {int(v): i for i, v in enumerate(vids)}
    unreachable = ~np.isfinite(dist)
    # vertices outside the root's component carry no parent in the
    # BFS forest → depth-0 singleton roots (see docstring)
    depth = np.where(unreachable, 0.0, dist).astype(np.float64)
    parent[unreachable] = -1

    children: dict[int, list[int]] = {}
    roots: list[int] = []
    for i, v in enumerate(vids):
        p = int(parent[i])
        if p < 0:
            roots.append(int(v))
        else:
            children.setdefault(p, []).append(int(v))
    for c in children.values():
        c.sort()
    roots.sort()
    # make the SSSP root first (igraph convention)
    if root in roots:
        roots.remove(root)
        roots.insert(0, root)

    x = np.zeros(len(vids), np.float64)
    next_leaf = 0
    for r in roots:
        # iterative post-order
        stack: list[tuple[int, bool]] = [(r, False)]
        while stack:
            v, done = stack.pop()
            if done:
                ch = children.get(v, [])
                if ch:
                    x[pos[v]] = float(
                        np.mean([x[pos[c]] for c in ch])
                    )
                else:
                    x[pos[v]] = float(next_leaf)
                    next_leaf += 1
                continue
            stack.append((v, True))
            for c in reversed(children.get(v, [])):
                stack.append((c, False))

    return pa.table(
        {
            "vid": pa.array(vids),
            "x": pa.array(x),
            "y": pa.array(depth),
        }
    )
