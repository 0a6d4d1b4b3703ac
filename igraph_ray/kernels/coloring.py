"""Greedy graph coloring — iterated Luby MIS on the chassis.

igraph surface: ``igraph_vertex_coloring_greedy`` / networkx
``nx.greedy_color`` — both return *a* proper coloring with at most
``Δ+1`` colors, with the exact assignment depending on visit order.
The distributed classic (Luby 1986 §5; Jones–Plassmann refines it) is
epoch-iterated MIS: epoch ``k`` computes a maximal independent set of
the still-uncolored induced subgraph and assigns it color ``k``.  A
vertex colored in epoch ``k`` was excluded in every earlier epoch by a
distinct already-colored neighbour, so ``k ≤ deg(v)`` and the coloring
uses at most ``Δ+1`` colors.  The oracle therefore asserts the
defining properties (proper, contiguous color ids, ``≤ Δ+1``), not
assignment equality.

One chassis run, no per-epoch graph rebuild: the kernel carries a
``color`` state column (−1 = uncolored) plus the Luby ``status``, and
a driver-side phase machine (the kernel object is re-pickled to the
workers every iteration, the same feedback channel the eigenvector
kernel uses for its norm):

- ``even``  — ACTIVE vertices broadcast this round's deterministic
  priority (``splitmix64(vid, rnd)``); strict local minima join the
  epoch's MIS;
- ``odd``   — new members flag neighbours, which become EXCLUDED for
  the rest of the epoch;
- when no ACTIVE vertices remain the driver inserts one ``rollover``
  iteration: members take ``color = epoch`` and become DONE, EXCLUDED
  vertices reset to ACTIVE, ``epoch += 1`` — a map-only superstep
  (self rows carry the state; no neighbour messages).

Colored (DONE) vertices never send or receive again, so late epochs
touch only the shrinking uncolored residual.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.base import run_kernel
from igraph_ray.kernels.mis import _PMAX, _priority
from igraph_ray.stages.partition import GraphMeta

_ACTIVE, _IN_MIS, _EXCLUDED, _DONE = 0, 1, 2, 3

MSG_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("pri", pa.int64()),
        ("mis", pa.int8()),
        ("self_status", pa.int8()),
        ("self_color", pa.int64()),
    ]
)


@dataclass
class ColoringKernel:
    num_parts: int
    #: driver-side phase machine, advanced in ``converged``
    phase: str = "even"
    rnd: int = 0
    epoch: int = 0

    state_value_cols: dict = field(
        default_factory=lambda: {
            "status": np.int64,
            "color": np.int64,
            "active": np.int64,
            "uncolored": np.int64,
        }
    )
    metric_cols: tuple = ("active", "uncolored")
    message_schema: pa.Schema = MSG_SCHEMA

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        vids = csr.get("vids", np.empty(0, np.int64))
        n = len(vids)
        return {
            "status": np.full(n, _ACTIVE, np.int64),
            "color": np.full(n, -1, np.int64),
            "active": np.ones(n, np.int64),
            "uncolored": np.ones(n, np.int64),
        }

    def scatter(self, csr, sb) -> pa.Table:
        vids_all = csr["vids"]
        status = sb.aligned["status"]
        present = sb.present

        src_pos = csr.get("src_pos", np.empty(0, np.int64))
        m_part = np.empty(0, np.int32)
        m_dst = np.empty(0, np.int64)
        m_pri = np.empty(0, np.int64)
        m_mis = np.empty(0, np.int8)
        if len(src_pos) and self.phase != "rollover":
            if self.phase == "even":
                send = (status[src_pos] == _ACTIVE) & present[src_pos]
                pri_all = _priority(vids_all, self.rnd)
                vals = np.where(send, pri_all[src_pos], _PMAX)
                seg_min = np.minimum.reduceat(vals, csr["seg_start"])
                live = seg_min < _PMAX
                m_dst = csr["seg_dst"][live]
                m_part = csr["seg_dst_part"][live].astype(np.int32)
                m_pri = seg_min[live]
                m_mis = np.zeros(len(m_dst), np.int8)
            else:  # odd — epoch members flag their neighbours
                send = (status[src_pos] == _IN_MIS) & present[src_pos]
                flags = send.astype(np.int64)
                seg_any = np.add.reduceat(flags, csr["seg_start"])
                live = seg_any > 0
                m_dst = csr["seg_dst"][live]
                m_part = csr["seg_dst_part"][live].astype(np.int32)
                m_pri = np.full(len(m_dst), _PMAX, np.int64)
                m_mis = np.ones(len(m_dst), np.int8)

        n_self = len(sb.vids)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate(
                        [m_part, np.full(n_self, sb.part, np.int32)]
                    ).astype(np.int32)
                ),
                "dst": pa.array(np.concatenate([m_dst, sb.vids])),
                "pri": pa.array(
                    np.concatenate(
                        [m_pri, np.full(n_self, _PMAX, np.int64)]
                    )
                ),
                "mis": pa.array(
                    np.concatenate([m_mis, np.zeros(n_self, np.int8)])
                ),
                "self_status": pa.array(
                    np.concatenate(
                        [
                            np.full(len(m_dst), -1, np.int8),
                            sb.values["status"].astype(np.int8),
                        ]
                    )
                ),
                "self_color": pa.array(
                    np.concatenate(
                        [
                            np.full(len(m_dst), -1, np.int64),
                            sb.values["color"],
                        ]
                    )
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        pri = group.column("pri").to_numpy(zero_copy_only=False)
        mis = group.column("mis").to_numpy(zero_copy_only=False)
        self_status = group.column("self_status").to_numpy(
            zero_copy_only=False
        )
        self_color = group.column("self_color").to_numpy(
            zero_copy_only=False
        )
        order = np.argsort(dst, kind="stable")
        dst, pri, mis, self_status, self_color = (
            dst[order],
            pri[order],
            mis[order],
            self_status[order],
            self_color[order],
        )
        boundary = np.empty(len(dst), dtype=bool)
        if len(dst):
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(boundary)
        vids = dst[seg]
        min_pri = np.minimum.reduceat(pri, seg)
        any_mis = np.maximum.reduceat(mis, seg)
        status = np.maximum.reduceat(self_status, seg).astype(np.int64)
        color = np.maximum.reduceat(self_color, seg)

        if self.phase == "even":
            mine = _priority(vids, self.rnd)
            join = (status == _ACTIVE) & (mine < min_pri)
            status = np.where(join, _IN_MIS, status)
        elif self.phase == "odd":
            out = (status == _ACTIVE) & (any_mis > 0)
            status = np.where(out, _EXCLUDED, status)
        else:  # rollover — assign the epoch's color, reset the rest
            won = status == _IN_MIS
            color = np.where(won, self.epoch, color)
            status = np.where(won, _DONE, status)
            status = np.where(status == _EXCLUDED, _ACTIVE, status)

        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "status": pa.array(status),
                "color": pa.array(color),
                "active": pa.array((status == _ACTIVE).astype(np.int64)),
                "uncolored": pa.array((color < 0).astype(np.int64)),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        if self.phase == "even":
            self.phase = "odd"
            return False
        if self.phase == "odd":
            self.rnd += 1
            self.phase = "rollover" if metrics["active"] == 0.0 else "even"
            return False
        # rollover just ran: epoch's colors are assigned
        self.epoch += 1
        self.phase = "even"
        return metrics["uncolored"] == 0.0


def greedy_coloring(
    graph: GraphMeta, max_iter: int = 4096
) -> ray.data.Dataset:
    """Rows ``(vid, color)`` — a proper vertex coloring of the
    (symmetrized) graph with contiguous color ids ``0..k−1``,
    ``k ≤ Δ+1``."""
    kernel = ColoringKernel(num_parts=graph.num_parts)
    run = run_kernel(kernel, graph, max_iter=max_iter)
    if not run.converged:
        raise RuntimeError(
            f"greedy_coloring did not converge in {max_iter} supersteps"
        )
    return run.state.select_columns(["vid", "color"])
