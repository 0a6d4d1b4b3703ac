"""Widest (maximum-bottleneck) paths — max-min on the SSSP chassis.

igraph's widest-path surface (``igraph_widest_path_widths_*``): the
width of a path is its minimum edge weight; the widest-path width from
a source set to ``v`` is the maximum width over all paths.  The
fixed-point recurrence swaps (min, +) for (max, min):
``width(v) = max(width(v), max over in-edges (u,v) of
min(width(u), w(u,v)))`` — a bounded semiring iteration that converges
in O(hop depth of the optimal paths) rounds because widths only grow
and take values from the finite edge-weight set.

Same chassis as :mod:`igraph_ray.kernels.sssp` (frontier scatter with
per-(source-partition, dst) pre-combine via ``np.maximum.reduceat``,
apply takes the max per destination).  Sources start at ``+inf``
(an empty path has unbounded capacity, the igraph/classic convention);
unreachable vertices keep ``-inf`` and are filtered by callers.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from igraph_ray.kernels.base import KernelRun, run_kernel
from igraph_ray.stages.partition import GraphMeta

MSG_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("val", pa.float64()),
        ("old", pa.float64()),
    ]
)

_NINF = -np.inf


@dataclass
class WidestKernel:
    num_parts: int
    #: sorted source vids (multi-source: width = max over sources)
    sources: np.ndarray

    state_value_cols: dict = field(
        default_factory=lambda: {"width": np.float64, "changed": np.int64}
    )
    metric_cols: tuple = ("changed",)
    message_schema: pa.Schema = MSG_SCHEMA

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        vids = csr.get("vids", np.empty(0, np.int64))
        width = np.full(len(vids), _NINF, np.float64)
        pos = np.searchsorted(vids, self.sources)
        pos_c = np.clip(pos, 0, max(0, len(vids) - 1))
        hit = (len(vids) > 0) & (vids[pos_c] == self.sources)
        width[pos_c[hit]] = np.inf
        return {
            "width": width,
            "changed": np.isposinf(width).astype(np.int64),
        }

    def scatter(self, csr, sb) -> pa.Table:
        # absent rows have changed=0 (neutral fill) → contribute
        # nothing; max is idempotent so partial batches compose.
        width = sb.aligned["width"]
        changed = sb.aligned["changed"].astype(bool) & sb.present

        if len(csr.get("src_pos", ())):
            w = np.asarray(csr["w"], np.float64)
            vals = np.where(
                changed[csr["src_pos"]],
                np.minimum(width[csr["src_pos"]], w),
                _NINF,
            )
            seg_max = np.maximum.reduceat(vals, csr["seg_start"])
            live = seg_max > _NINF
            m_part = csr["seg_dst_part"][live]
            m_dst = csr["seg_dst"][live]
            m_val = seg_max[live]
        else:
            m_part = np.empty(0, np.int32)
            m_dst = np.empty(0, np.int64)
            m_val = np.empty(0, np.float64)

        self_vids = sb.vids
        self_width = sb.values["width"]
        n_self = len(self_vids)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate(
                        [m_part, np.full(n_self, sb.part, np.int32)]
                    )
                ),
                "dst": pa.array(np.concatenate([m_dst, self_vids])),
                "val": pa.array(np.concatenate([m_val, self_width])),
                "old": pa.array(
                    np.concatenate(
                        [np.full(len(m_dst), _NINF, np.float64), self_width]
                    )
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        val = group.column("val").to_numpy(zero_copy_only=False)
        old = group.column("old").to_numpy(zero_copy_only=False)

        order = np.argsort(dst, kind="stable")
        dst, val, old = dst[order], val[order], old[order]
        if len(dst):
            boundary = np.empty(len(dst), dtype=bool)
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
            seg = np.flatnonzero(boundary)
            vids = dst[seg]
            new = np.maximum.reduceat(val, seg)
            old_max = np.maximum.reduceat(old, seg)
        else:
            vids = np.empty(0, np.int64)
            new = np.empty(0, np.float64)
            old_max = np.empty(0, np.float64)

        changed = (new > old_max).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "width": pa.array(new),
                "changed": pa.array(changed),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        return metrics["changed"] == 0.0


def widest_paths(
    graph: GraphMeta,
    sources: list[int] | np.ndarray,
    max_iter: int = 10_000,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> KernelRun:
    """Widest-path widths from ``sources`` (max over sources when
    several); final state rows are ``(part, vid, width, changed)``
    with ``width = +inf`` at sources and ``-inf`` for unreachable
    vertices."""
    src = np.unique(np.asarray(sources, np.int64))
    if len(src) == 0:
        raise ValueError("widest_paths requires at least one source")
    kernel = WidestKernel(num_parts=graph.num_parts, sources=src)
    run = run_kernel(
        kernel,
        graph,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )
    if not run.converged:  # pragma: no cover - widths are monotone
        raise RuntimeError(
            f"widest_paths did not converge in {max_iter} iterations"
        )
    return run
