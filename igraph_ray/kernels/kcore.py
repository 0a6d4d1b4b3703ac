"""K-core decomposition (coreness) — igraph's ``igraph_coreness``
(networkx oracle: ``nx.core_number``,
``NX/algorithms/core.py``).

Distributed h-index iteration (Montresor, De Pellegrini & Miorandi,
"Distributed k-Core Decomposition", IEEE TPDS 2013 — public
algorithm): every vertex starts at its degree and repeatedly lowers its
estimate to the **h-index of its neighbors' estimates** (the largest h
such that at least h neighbors have estimate ≥ h, capped by its own
current value).  Estimates decrease monotonically to the exact core
numbers.

Chassis mapping: messages are per-(dst, value) histogram rows
(pre-combined per source partition like LPA labels), so a hub receiver
gets at most P rows per distinct estimate value; apply computes the
h-index per destination from the merged histogram with one sort +
cumulative count — fully vectorized.
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
        ("value", pa.int64()),
        ("cnt", pa.int64()),
        ("self_core", pa.int64()),
    ]
)


@dataclass
class KCoreKernel:
    num_parts: int

    state_value_cols: dict = field(
        default_factory=lambda: {"core": np.int64, "changed": np.int64}
    )
    metric_cols: tuple = ("changed",)
    message_schema: pa.Schema = MSG_SCHEMA

    def init_state(self, csr, part: int):
        vids = csr.get("vids", np.empty(0, np.int64))
        deg = csr.get("out_degree", np.zeros(len(vids), np.int64))
        return {
            "core": deg.astype(np.int64).copy(),
            "changed": np.ones(len(vids), dtype=np.int64),
        }

    def scatter(self, csr, sb) -> pa.Table:
        core = sb.aligned["core"]

        if len(csr.get("src_pos", ())) and sb.present.any():
            present = sb.present[csr["src_pos"]]
            val = core[csr["src_pos"]][present]
            dst = csr["dst"][present]
            dst_part = csr["dst_part"][present]
            if len(dst):
                order = np.lexsort((val, dst, dst_part))
                dst, dst_part, val = dst[order], dst_part[order], val[order]
                new_seg = np.empty(len(dst), dtype=bool)
                new_seg[0] = True
                new_seg[1:] = (dst[1:] != dst[:-1]) | (val[1:] != val[:-1])
                seg = np.flatnonzero(new_seg)
                m_part = dst_part[seg]
                m_dst = dst[seg]
                m_val = val[seg]
                m_cnt = np.diff(np.append(seg, len(dst)))
            else:
                m_part = np.empty(0, np.int32)
                m_dst = np.empty(0, np.int64)
                m_val = np.empty(0, np.int64)
                m_cnt = np.empty(0, np.int64)
        else:
            m_part = np.empty(0, np.int32)
            m_dst = np.empty(0, np.int64)
            m_val = np.empty(0, np.int64)
            m_cnt = np.empty(0, np.int64)

        n_self = len(sb.vids)
        n_msg = len(m_dst)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate([m_part, np.full(n_self, sb.part, np.int32)])
                ),
                "dst": pa.array(np.concatenate([m_dst, sb.vids])),
                "value": pa.array(
                    np.concatenate([m_val, np.full(n_self, -1, np.int64)])
                ),
                "cnt": pa.array(
                    np.concatenate([m_cnt.astype(np.int64), np.zeros(n_self, np.int64)])
                ),
                "self_core": pa.array(
                    np.concatenate(
                        [np.full(n_msg, -1, np.int64), sb.values["core"]]
                    )
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        val = group.column("value").to_numpy(zero_copy_only=False)
        cnt = group.column("cnt").to_numpy(zero_copy_only=False)
        slf = group.column("self_core").to_numpy(zero_copy_only=False)
        if len(dst) == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "vid": pa.array([], pa.int64()),
                    "core": pa.array([], pa.int64()),
                    "changed": pa.array([], pa.int64()),
                }
            )
        # merge histogram rows; sort by (dst, value DESC) for the
        # cumulative h-index scan
        order = np.lexsort((-val, dst))
        dst, val, cnt, slf = dst[order], val[order], cnt[order], slf[order]
        dseg_new = np.empty(len(dst), dtype=bool)
        dseg_new[0] = True
        dseg_new[1:] = dst[1:] != dst[:-1]
        dseg = np.flatnonzero(dseg_new)
        seg_id = np.cumsum(dseg_new) - 1
        vids = dst[dseg]

        old = np.maximum.reduceat(slf, dseg)  # self row carries old core

        # cumulative neighbor count within each dst (values descending;
        # self rows have value=-1 and sort last with cnt=0 — harmless)
        cum = np.cumsum(cnt)
        base = np.concatenate([[0], cum[dseg[1:] - 1]])
        cum_within = cum - base[seg_id]
        cand = np.minimum(val, cum_within)  # h-index candidate per row
        h = np.maximum.reduceat(cand, dseg)
        h = np.maximum(h, 0)

        new = np.minimum(old, h)
        changed = (new != old).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "core": pa.array(new),
                "changed": pa.array(changed),
            }
        )

    def converged(self, metrics, iteration) -> bool:
        return metrics["changed"] == 0.0


def core_numbers(
    graph: GraphMeta,
    max_iter: int = 10_000,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> KernelRun:
    """Coreness over a symmetrized simple graph (build with
    ``symmetrize=True``); final state rows ``(part, vid, core)``."""
    kernel = KCoreKernel(num_parts=graph.num_parts)
    return run_kernel(
        kernel,
        graph,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )


# ---------------------------------------------------------------------------
# Weighted s-core (generalized core, p-function = strength)
# ---------------------------------------------------------------------------
SCORE_MSG_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("value", pa.float64()),
        ("w", pa.float64()),
        ("self_core", pa.float64()),
    ]
)


@dataclass
class SCoreKernel:
    """Weighted coreness (s-core): core(v) = largest s such that v
    belongs to a maximal subgraph where every vertex's WEIGHTED degree
    (strength) inside the subgraph is >= s — Batagelj & Zaveršnik
    "Generalized cores" (2002) with p(v, S) = Σ w(v,u), u ∈ S; the
    s-core decomposition of Eidsaa & Almaas (PRE 88, 2013) at every
    attained level.

    Same distributed shape as :class:`KCoreKernel`: estimates start at
    the full strength and repeatedly lower to the WEIGHTED h-index of
    the neighbor estimates — the largest s with Σ_{u: est(u) >= s}
    w(v,u) >= s, computed per destination as max over the
    descending-value scan of min(value_i, cum_weight_i).  Every fixed
    point x satisfies x_v <= core(v) (the level set {x >= s} is an
    s-strength subgraph), and the true coreness is a fixed point, so
    the monotone descent converges to it exactly.  Messages are
    pre-combined per (dst, value) with summed weights; duplicate
    (dst, value) rows from different source partitions are handled by
    the cumulative scan (the last duplicate dominates the max)."""

    num_parts: int

    state_value_cols: dict = field(
        default_factory=lambda: {"core": np.float64, "changed": np.int64}
    )
    metric_cols: tuple = ("changed",)
    message_schema: pa.Schema = SCORE_MSG_SCHEMA

    def init_state(self, csr, part: int):
        vids = csr.get("vids", np.empty(0, np.int64))
        strength = csr.get("out_weight", np.zeros(len(vids), np.float64))
        return {
            "core": strength.astype(np.float64).copy(),
            "changed": np.ones(len(vids), dtype=np.int64),
        }

    def scatter(self, csr, sb) -> pa.Table:
        core = sb.aligned["core"]

        if len(csr.get("src_pos", ())) and sb.present.any():
            present = sb.present[csr["src_pos"]]
            val = core[csr["src_pos"]][present]
            dst = csr["dst"][present]
            dst_part = csr["dst_part"][present]
            w = np.asarray(csr["w"], np.float64)[present]
            if len(dst):
                order = np.lexsort((val, dst, dst_part))
                dst, dst_part, val, w = (
                    dst[order],
                    dst_part[order],
                    val[order],
                    w[order],
                )
                new_seg = np.empty(len(dst), dtype=bool)
                new_seg[0] = True
                new_seg[1:] = (dst[1:] != dst[:-1]) | (val[1:] != val[:-1])
                seg = np.flatnonzero(new_seg)
                m_part = dst_part[seg]
                m_dst = dst[seg]
                m_val = val[seg]
                cw = np.cumsum(w)
                seg_end = np.append(seg[1:], len(dst)) - 1
                m_w = np.diff(np.concatenate([[0.0], cw[seg_end]]))
            else:
                m_part = np.empty(0, np.int32)
                m_dst = np.empty(0, np.int64)
                m_val = np.empty(0, np.float64)
                m_w = np.empty(0, np.float64)
        else:
            m_part = np.empty(0, np.int32)
            m_dst = np.empty(0, np.int64)
            m_val = np.empty(0, np.float64)
            m_w = np.empty(0, np.float64)

        n_self = len(sb.vids)
        n_msg = len(m_dst)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate(
                        [m_part, np.full(n_self, sb.part, np.int32)]
                    )
                ),
                "dst": pa.array(np.concatenate([m_dst, sb.vids])),
                "value": pa.array(
                    np.concatenate([m_val, np.full(n_self, -1.0)])
                ),
                "w": pa.array(
                    np.concatenate([m_w, np.zeros(n_self, np.float64)])
                ),
                "self_core": pa.array(
                    np.concatenate(
                        [np.full(n_msg, -1.0), sb.values["core"]]
                    )
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        val = group.column("value").to_numpy(zero_copy_only=False)
        w = group.column("w").to_numpy(zero_copy_only=False)
        slf = group.column("self_core").to_numpy(zero_copy_only=False)
        if len(dst) == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "vid": pa.array([], pa.int64()),
                    "core": pa.array([], pa.float64()),
                    "changed": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((-val, dst))
        dst, val, w, slf = dst[order], val[order], w[order], slf[order]
        dseg_new = np.empty(len(dst), dtype=bool)
        dseg_new[0] = True
        dseg_new[1:] = dst[1:] != dst[:-1]
        dseg = np.flatnonzero(dseg_new)
        seg_id = np.cumsum(dseg_new) - 1
        vids = dst[dseg]

        old = np.maximum.reduceat(slf, dseg)  # self row carries old core

        cum = np.cumsum(w)
        base = np.concatenate([[0.0], cum[dseg[1:] - 1]])
        cum_within = cum - base[seg_id]
        cand = np.minimum(val, cum_within)
        h = np.maximum.reduceat(cand, dseg)
        h = np.maximum(h, 0.0)

        new = np.minimum(old, h)
        changed = (new != old).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "core": pa.array(new),
                "changed": pa.array(changed),
            }
        )

    def converged(self, metrics, iteration) -> bool:
        return metrics["changed"] == 0.0


def s_core_numbers(
    graph: GraphMeta,
    max_iter: int = 10_000,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> KernelRun:
    """Weighted coreness over a symmetrized weighted simple graph;
    final state rows ``(part, vid, core)`` with float64 core (exact
    integers when all edge weights are integral)."""
    kernel = SCoreKernel(num_parts=graph.num_parts)
    return run_kernel(
        kernel,
        graph,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )
