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


def _layout_universe(
    graph: GraphMeta, kernel_name: str, broadcast_max_vertices: int
):
    """(parts_ds, all_vids) — the partition driver Dataset plus the
    sorted vid universe gathered once from the CSR blocks (bounded by
    the layout broadcast limit, loud raise beyond)."""
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
    if len(all_vids) > broadcast_max_vertices:
        raise NotImplementedError(
            f"{kernel_name} broadcasts the position table; "
            f"{len(all_vids)} vertices exceeds {broadcast_max_vertices}"
            f" — lay out the community quotient graph instead"
        )
    return parts_ds, all_vids


def _empty_layout() -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array([], pa.int64()),
                "x": pa.array([], pa.float64()),
                "y": pa.array([], pa.float64()),
            }
        )
    )


def fruchterman_reingold(
    graph: GraphMeta,
    iterations: int = 50,
    grid: int = 16,
    broadcast_max_vertices: int = BROADCAST_MAX_VERTICES,
) -> ray.data.Dataset:
    """Rows ``(vid, x, y)`` — final layout in the unit square."""
    parts_ds, all_vids = _layout_universe(
        graph, "fruchterman_reingold", broadcast_max_vertices
    )
    n = len(all_vids)
    if n == 0:
        return _empty_layout()
    pos = _init_positions(all_vids)
    k = np.sqrt(1.0 / n)  # ideal edge length in the unit square
    schedule = [
        (0.1 * (1.0 - it / iterations) + 1e-4, 1.0)
        for it in range(iterations)
    ]
    pos = _force_schedule_loop(
        graph, parts_ds, all_vids, pos, k, grid, schedule
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


def _force_schedule_loop(
    graph: GraphMeta,
    parts_ds: ray.data.Dataset,
    all_vids: np.ndarray,
    pos: np.ndarray,
    k: float,
    grid: int,
    schedule: list[tuple[float, float]],
) -> np.ndarray:
    """Run one grid-approximated force iteration per ``(temperature,
    attraction)`` entry of ``schedule`` (the FR machinery of the module
    docstring); returns the final (n, 2) position array.  Attraction
    1.0 reproduces classic FR bitwise; other multipliers realize DRL's
    phase schedule."""
    for temp, attract in schedule:
        pref = ray.put((all_vids, pos))

        def step(
            batch: pa.Table, _pref=pref, _temp=temp, _attract=attract
        ) -> pa.Table:
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
                    np.subtract.at(disp, src_pos, pull * _attract)
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

    return pos


def drl_layout(
    graph: GraphMeta,
    iterations: int = 60,
    grid: int = 16,
    broadcast_max_vertices: int = BROADCAST_MAX_VERTICES,
) -> ray.data.Dataset:
    """Rows ``(vid, x, y)`` — DRL / OpenOrd force-directed layout
    (igraph ``layout_drl`` surface; Martin, Brown, Boyack & Klavans,
    "OpenOrd: an open-source toolbox for large graph layout", 2011).

    DRL is the FR force model driven through a five-phase annealing
    schedule — liquid → expansion → cooldown → crunch → simmer — where
    each phase sets (temperature, attraction multiplier); strong
    attraction in the expansion phase pulls cluster structure together
    before the low-temperature phases freeze it.  The published phase
    proportions and attraction multipliers are used with temperatures
    rescaled to this module's unit-square coordinate system (the
    original operates on a ±2000 canvas); exact igraph parameter
    parity is not verifiable in this sandbox (no reference on disk —
    SURVEY.md §0).  Shares ``_force_schedule_loop`` with FR, so the
    distributed shape (grid-approximated repulsion, CSR-partition
    attraction, broadcast positions) and the ``broadcast_max_vertices``
    bound are identical.  Deterministic: splitmix64 init, no RNG.
    """
    parts_ds, all_vids = _layout_universe(
        graph, "drl_layout", broadcast_max_vertices
    )
    n = len(all_vids)
    if n == 0:
        return _empty_layout()
    pos = _init_positions(all_vids)
    k = np.sqrt(1.0 / n)
    # (fraction of iterations, start temp, end temp, attraction) —
    # OpenOrd's (200, 200, 200, 50, 100)-iteration phases normalized,
    # temperatures 2000/250 mapped to FR's 0.1 unit-square base.
    phases = [
        (0.27, 0.10, 0.10, 2.0),  # liquid
        (0.27, 0.10, 0.05, 10.0),  # expansion
        (0.27, 0.05, 0.01, 1.0),  # cooldown
        (0.06, 0.0125, 0.0125, 1.0),  # crunch
        (0.13, 0.0125, 0.001, 0.5),  # simmer
    ]
    schedule: list[tuple[float, float]] = []
    for frac, t0, t1, attract in phases:
        steps = max(1, int(round(frac * iterations)))
        for i in range(steps):
            t = t0 + (t1 - t0) * (i / max(1, steps - 1))
            schedule.append((t + 1e-4, attract))
    pos = _force_schedule_loop(
        graph, parts_ds, all_vids, pos, k, grid, schedule
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


def sugiyama_layout(
    arcs: ray.data.Dataset,
    sweeps: int = 4,
    max_edges: int = 2_000_000,
) -> pa.Table:
    """(vid, x, y) — Sugiyama-style layered DAG drawing (igraph
    ``layout_sugiyama`` surface; Sugiyama, Tagawa & Toda, "Methods for
    visual understanding of hierarchical system structures", 1981).

    Pipeline: (1) cycle removal via the Eades–Lin–Smyth ordering
    (``kernels/fas.py``) — back arcs are traversed reversed; (2)
    longest-path layering along the resulting topological order (y =
    layer); (3) dummy vertices subdivide arcs spanning more than one
    layer so crossing reduction sees unit-span arcs only; (4)
    ``sweeps`` alternating down/up barycenter passes order each layer
    (stable sort, vid tie-break — fully deterministic); (5) x =
    within-layer index centered on 0; dummies dropped from the output.

    Driver-gathered like FAS / Reingold–Tilford (a visualization
    surface): bounded by ``max_edges`` with a loud raise beyond —
    lay out the community quotient graph for larger inputs.
    """
    from igraph_ray.kernels.fas import _eades_order

    n_arcs = arcs.count()
    if n_arcs > max_edges:
        raise NotImplementedError(
            f"sugiyama_layout gathers the arc list on the driver; "
            f"{n_arcs} arcs exceeds the documented bound {max_edges}"
        )
    tbl = pa.concat_tables(
        arcs.select_columns(["src", "dst"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    src = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    keep = src != dst  # self-loops carry no layering information
    src, dst = src[keep], dst[keep]
    vids = np.unique(np.concatenate([src, dst]))
    n = len(vids)
    if n == 0:
        return pa.table(
            {
                "vid": pa.array([], pa.int64()),
                "x": pa.array([], pa.float64()),
                "y": pa.array([], pa.float64()),
            }
        )
    seq = _eades_order(src, dst, vids)
    topo_pos = np.empty(n, np.int64)
    topo_pos[np.searchsorted(vids, seq)] = np.arange(n)
    s = np.searchsorted(vids, src)
    d = np.searchsorted(vids, dst)
    # reverse back arcs so every arc goes forward in the ELS order
    back = topo_pos[s] > topo_pos[d]
    s2 = np.where(back, d, s)
    d2 = np.where(back, s, d)
    # dedup (multigraph collapse)
    key = s2 * n + d2
    key, uidx = np.unique(key, return_index=True)
    s2, d2 = s2[uidx], d2[uidx]

    # longest-path layering: process arcs by the head's topo position;
    # tails are final before any head that follows them
    layer = np.zeros(n, np.int64)
    for i in np.argsort(topo_pos[d2], kind="stable"):
        a, b = int(s2[i]), int(d2[i])
        if layer[b] < layer[a] + 1:
            layer[b] = layer[a] + 1

    # dummy chain nodes for long arcs: node ids 0..n-1 are real,
    # n.. are dummies
    unit_src: list[int] = []
    unit_dst: list[int] = []
    node_layer = list(layer)
    node_vid = list(vids)  # parallel; dummies get vid -1
    next_id = n
    for i in range(len(s2)):
        a, b = int(s2[i]), int(d2[i])
        la, lb = int(layer[a]), int(layer[b])
        prev = a
        for mid_layer in range(la + 1, lb):
            node_layer.append(mid_layer)
            node_vid.append(-1)
            unit_src.append(prev)
            unit_dst.append(next_id)
            prev = next_id
            next_id += 1
        unit_src.append(prev)
        unit_dst.append(b)

    node_layer_arr = np.asarray(node_layer, np.int64)
    node_vid_arr = np.asarray(node_vid, np.int64)
    us = np.asarray(unit_src, np.int64)
    ud = np.asarray(unit_dst, np.int64)
    n_layers = int(node_layer_arr.max()) + 1

    # per-layer ordered node lists; initial order: real vids first by
    # vid, dummies by creation order (deterministic)
    orders: list[np.ndarray] = []
    for L in range(n_layers):
        members = np.flatnonzero(node_layer_arr == L)
        mk = np.stack(
            [
                np.where(node_vid_arr[members] >= 0, 0, 1),
                np.where(
                    node_vid_arr[members] >= 0,
                    node_vid_arr[members],
                    members,
                ),
            ],
            axis=1,
        )
        orders.append(members[np.lexsort((mk[:, 1], mk[:, 0]))])

    # neighbor lists on the unit-span DAG
    down_of: dict[int, list[int]] = {}
    up_of: dict[int, list[int]] = {}
    for a, b in zip(us.tolist(), ud.tolist()):
        up_of.setdefault(b, []).append(a)
        down_of.setdefault(a, []).append(b)

    posn = np.zeros(len(node_layer_arr), np.float64)

    def reindex() -> None:
        for mem in orders:
            posn[mem] = np.arange(len(mem), dtype=np.float64)

    reindex()
    for sweep in range(sweeps):
        rng = (
            range(1, n_layers)
            if sweep % 2 == 0
            else range(n_layers - 2, -1, -1)
        )
        nbrs = up_of if sweep % 2 == 0 else down_of
        for L in rng:
            mem = orders[L]
            bary = np.array(
                [
                    (
                        float(np.mean(posn[nbrs[m]]))
                        if m in nbrs and nbrs[m]
                        else float(posn[m])
                    )
                    for m in mem
                ]
            )
            orders[L] = mem[np.argsort(bary, kind="stable")]
            reindex()

    real = node_vid_arr >= 0
    x = posn[real] - (np.array(
        [len(orders[L]) for L in node_layer_arr[real]]
    ) - 1) / 2.0
    return pa.table(
        {
            "vid": pa.array(node_vid_arr[real]),
            "x": pa.array(x),
            "y": pa.array(node_layer_arr[real].astype(np.float64)),
        }
    )
