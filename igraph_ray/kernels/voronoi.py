"""Graph Voronoi cells: nearest-generator assignment.

Covers igraph's ``igraph_voronoi`` / ``Graph.voronoi`` surface for a
given generator (seed) set: every vertex is assigned to the generator
with minimal shortest-path distance, ties broken by the SMALLEST
generator vid — deterministic across runs, resumes and partitionings
(igraph's tiebreaker parameter offers first/random; this engine pins
the deterministic "first by vid" choice).

Same chassis as SSSP (``kernels/sssp.py``): the state pair
``(dist, cell)`` is relaxed under the LEXICOGRAPHIC min-plus semiring —
``candidate(dst) = (dist(src) + w, cell(src))`` — so the fixed point is
exactly ``argmin over generators of (d(g, v), g)``.  Messages are
pre-combined per (source partition, dst) with ``np.minimum.reduceat``
over the CSR combine segments (value min, then label min among arcs
achieving it), and apply takes the lexicographic min per destination.
Unlike the shortest-path-tree kernel, an equal-distance SMALLER cell
label must still win and propagate, so ``changed`` fires on cell-only
improvements too.

Unreachable vertices keep ``dist = +inf`` and ``cell = -1``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from igraph_ray.kernels.base import KernelRun, run_kernel
from igraph_ray.kernels.sssp import SSSPKernel, _INF
from igraph_ray.stages.partition import GraphMeta

CELL_MSG_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("val", pa.float64()),
        ("cell", pa.int64()),
        ("old", pa.float64()),
        ("old_cell", pa.int64()),
    ]
)

_NO_CELL = np.int64(-1)
_BIG = np.int64(np.iinfo(np.int64).max)


@dataclass
class VoronoiKernel(SSSPKernel):
    message_schema: pa.Schema = CELL_MSG_SCHEMA

    def __post_init__(self):
        self.state_value_cols = {
            "dist": np.float64,
            "cell": np.int64,
            "changed": np.int64,
        }

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        base = super().init_state(csr, part)
        vids = csr.get("vids", np.empty(0, np.int64))
        cell = np.full(len(vids), _NO_CELL, np.int64)
        seeded = base["dist"] == 0.0
        cell[seeded] = vids[seeded]
        base["cell"] = cell
        return base

    def scatter(self, csr, sb) -> pa.Table:
        # absent rows have changed=0 (neutral fill) → contribute
        # nothing; lexicographic min is idempotent so partial batches
        # compose (partial-batch contract, kernels/base.py).
        dist = sb.aligned["dist"]
        cell = sb.aligned["cell"]
        changed = sb.aligned["changed"].astype(bool) & sb.present

        if len(csr.get("src_pos", ())):
            w = (
                np.ones(len(csr["src_pos"]), np.float64)
                if self.unit_weights
                else np.asarray(csr["w"], np.float64)
            )
            vals = np.where(
                changed[csr["src_pos"]], dist[csr["src_pos"]] + w, _INF
            )
            seg_min = np.minimum.reduceat(vals, csr["seg_start"])
            seg_lens = np.diff(np.r_[csr["seg_start"], len(vals)])
            seg_of_arc = np.repeat(
                np.arange(len(csr["seg_start"])), seg_lens
            )
            at_min = vals == seg_min[seg_of_arc]
            seg_cell = np.minimum.reduceat(
                np.where(at_min, cell[csr["src_pos"]], _BIG),
                csr["seg_start"],
            )
            live = np.isfinite(seg_min)
            m_part = csr["seg_dst_part"][live]
            m_dst = csr["seg_dst"][live]
            m_val = seg_min[live]
            m_cell = seg_cell[live]
        else:
            m_part = np.empty(0, np.int32)
            m_dst = np.empty(0, np.int64)
            m_val = np.empty(0, np.float64)
            m_cell = np.empty(0, np.int64)

        n_self = len(sb.vids)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate(
                        [m_part, np.full(n_self, sb.part, np.int32)]
                    )
                ),
                "dst": pa.array(np.concatenate([m_dst, sb.vids])),
                "val": pa.array(
                    np.concatenate([m_val, sb.values["dist"]])
                ),
                "cell": pa.array(
                    np.concatenate([m_cell, sb.values["cell"]])
                ),
                "old": pa.array(
                    np.concatenate(
                        [
                            np.full(len(m_dst), _INF, np.float64),
                            sb.values["dist"],
                        ]
                    )
                ),
                "old_cell": pa.array(
                    np.concatenate(
                        [np.full(len(m_dst), _BIG), sb.values["cell"]]
                    )
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        val = group.column("val").to_numpy(zero_copy_only=False)
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        old = group.column("old").to_numpy(zero_copy_only=False)
        old_cell = group.column("old_cell").to_numpy(
            zero_copy_only=False
        )

        # first row per dst after this sort = lexicographic min
        # (val, cell); message cells are always finite-distance so a
        # -1 unreachable self cell can only "win" when every row is
        # the +inf self row (no change).
        order = np.lexsort((cell, val, dst))
        dst, val, cell, old, old_cell = (
            dst[order],
            val[order],
            cell[order],
            old[order],
            old_cell[order],
        )
        if len(dst):
            boundary = np.empty(len(dst), dtype=bool)
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
            seg = np.flatnonzero(boundary)
            vids = dst[seg]
            new = val[seg]
            new_cell = cell[seg]
            old_min = np.minimum.reduceat(old, seg)
            # exactly one self row per dst carries the incumbent pair
            # (message rows carry old=+inf / old_cell=BIG sentinels)
            inc_cell = np.minimum.reduceat(old_cell, seg)
        else:
            vids = np.empty(0, np.int64)
            new = np.empty(0, np.float64)
            new_cell = np.empty(0, np.int64)
            old_min = np.empty(0, np.float64)
            inc_cell = np.empty(0, np.int64)

        improved = (new < old_min) | (
            (new == old_min) & (new_cell < inc_cell)
        )
        out_dist = np.where(improved, new, old_min)
        out_cell = np.where(improved, new_cell, inc_cell)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "dist": pa.array(out_dist),
                "cell": pa.array(out_cell),
                "changed": pa.array(improved.astype(np.int64)),
            }
        )


def voronoi_cells(
    graph: GraphMeta,
    generators: list[int] | np.ndarray,
    weighted: bool = False,
    max_iter: int = 10_000,
) -> KernelRun:
    """Nearest-generator assignment (igraph ``voronoi``): final state
    rows are ``(part, vid, dist, cell, changed)`` with ``cell`` the
    vid of the closest generator (smallest vid on distance ties) and
    ``dist = +inf`` / ``cell = -1`` for vertices unreachable from
    every generator."""
    gen = np.unique(np.asarray(generators, np.int64))
    if len(gen) == 0:
        raise ValueError("voronoi_cells requires at least one generator")
    kernel = VoronoiKernel(
        num_parts=graph.num_parts, sources=gen, unit_weights=not weighted
    )
    run = run_kernel(kernel, graph, max_iter=max_iter)
    if not run.converged:
        raise RuntimeError(
            f"voronoi_cells did not converge in {max_iter} iterations"
        )
    return run
