"""Minimal dominating set (greedy approximation) on the chassis.

``nx.dominating_set`` surface (igraph twin: the dominating-set checks
under ``igraph_is_dominating_set`` family): a set D where every vertex
is in D or adjacent to D.  Like the MIS/coloring witnesses, the output
is *a* dominating set — which one depends on the deterministic
priorities — so the oracle asserts the defining property plus
determinism, not set equality.

Distributed greedy ("span nomination", the classic synchronous greedy
set-cover approximation): rounds of three chassis supersteps,

- phase 0 — coverage + span exchange: every vertex reports its status
  along its arcs (pre-combined per CSR segment: max IN_DS flag, sum of
  uncovered flags); a vertex adjacent to a new member becomes COVERED
  and recomputes ``span`` = uncovered neighbours (stale-by-one, which
  affects quality only) + itself if uncovered.
- phase 1 — candidacy: every vertex broadcasts its packed candidate
  key ``span * (N + 1) + (N - 1 - vid)`` (max span, ties to the
  smallest vid; per-segment max pre-combine); every UNCOVERED vertex
  nominates the best of its closed neighbourhood.
- phase 2 — nomination: arcs whose source nominates their destination
  carry a flag (per-segment max); a vertex nominated by anyone — or
  self-nominated — joins D.

Every uncovered vertex nominates a candidate with span >= 1 each
round, so at least one new member covers it within two phases —
termination in <= n rounds, O(log n)-ish in practice.  All integer
state; runs are bitwise reproducible.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.base import run_kernel
from igraph_ray.stages.partition import GraphMeta

_UNCOVERED, _COVERED, _IN_DS = 0, 1, 2

MSG_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("unc", pa.int64()),
        ("dsflag", pa.int8()),
        ("cand", pa.int64()),
        ("nom", pa.int8()),
        ("self_status", pa.int8()),
        ("self_span", pa.int64()),
        ("self_nominee", pa.int64()),
    ]
)


@dataclass
class DominatingSetKernel:
    num_parts: int
    iteration: int = 0  # set by the chassis

    state_value_cols: dict = field(
        default_factory=lambda: {
            "status": np.int64,
            "span": np.int64,
            "nominee": np.int64,
            "active": np.int64,
        }
    )
    metric_cols: tuple = ("active",)
    message_schema: pa.Schema = MSG_SCHEMA

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        vids = csr.get("vids", np.empty(0, np.int64))
        n = len(vids)
        return {
            "status": np.full(n, _UNCOVERED, np.int64),
            "span": np.ones(n, np.int64),  # self counts until measured
            "nominee": np.full(n, -1, np.int64),
            "active": np.ones(n, np.int64),
        }

    # fixed packing base: vids need not be dense 0..n-1 (GraphMeta's
    # num_vertices is the distinct count, not max+1), so pack against
    # 2^31 — span < 2^31 and vid < 2^31 keep the key in int64
    _BASE = np.int64(1 << 31)

    def _key(self, span: np.ndarray, vids: np.ndarray) -> np.ndarray:
        return span * self._BASE + (self._BASE - 1 - vids)

    def scatter(self, csr, sb) -> pa.Table:
        status = sb.aligned["status"]
        span = sb.aligned["span"]
        nominee = sb.aligned["nominee"]
        present = sb.present
        phase = self.iteration % 3

        src_pos = csr.get("src_pos", np.empty(0, np.int64))
        m_part = np.empty(0, np.int32)
        m_dst = np.empty(0, np.int64)
        m_unc = np.empty(0, np.int64)
        m_ds = np.empty(0, np.int8)
        m_cand = np.empty(0, np.int64)
        m_nom = np.empty(0, np.int8)
        if len(src_pos):
            seg_start = csr["seg_start"]
            if phase == 0:
                unc = (
                    (status[src_pos] == _UNCOVERED) & present[src_pos]
                ).astype(np.int64)
                isds = (
                    (status[src_pos] == _IN_DS) & present[src_pos]
                ).astype(np.int8)
                unc_sum = np.add.reduceat(unc, seg_start)
                ds_any = np.maximum.reduceat(isds, seg_start)
                live = (unc_sum > 0) | (ds_any > 0)
                m_dst = csr["seg_dst"][live]
                m_part = csr["seg_dst_part"][live].astype(np.int32)
                m_unc = unc_sum[live]
                m_ds = ds_any[live]
                m_cand = np.full(len(m_dst), -1, np.int64)
                m_nom = np.zeros(len(m_dst), np.int8)
            elif phase == 1:
                key_all = self._key(span, np.asarray(csr["vids"]))
                vals = np.where(present[src_pos], key_all[src_pos], -1)
                seg_max = np.maximum.reduceat(vals, seg_start)
                live = seg_max >= 0
                m_dst = csr["seg_dst"][live]
                m_part = csr["seg_dst_part"][live].astype(np.int32)
                m_cand = seg_max[live]
                m_unc = np.zeros(len(m_dst), np.int64)
                m_ds = np.zeros(len(m_dst), np.int8)
                m_nom = np.zeros(len(m_dst), np.int8)
            else:
                seg_len = np.diff(
                    np.append(seg_start, len(src_pos))
                )
                arc_dst = np.repeat(csr["seg_dst"], seg_len)
                flag = (
                    (status[src_pos] == _UNCOVERED)
                    & present[src_pos]
                    & (nominee[src_pos] == arc_dst)
                ).astype(np.int8)
                seg_any = np.maximum.reduceat(flag, seg_start)
                live = seg_any > 0
                m_dst = csr["seg_dst"][live]
                m_part = csr["seg_dst_part"][live].astype(np.int32)
                m_nom = seg_any[live]
                m_unc = np.zeros(len(m_dst), np.int64)
                m_ds = np.zeros(len(m_dst), np.int8)
                m_cand = np.full(len(m_dst), -1, np.int64)

        n_self = len(sb.vids)
        n_msg = len(m_dst)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate(
                        [m_part, np.full(n_self, sb.part, np.int32)]
                    ).astype(np.int32)
                ),
                "dst": pa.array(np.concatenate([m_dst, sb.vids])),
                "unc": pa.array(
                    np.concatenate([m_unc, np.zeros(n_self, np.int64)])
                ),
                "dsflag": pa.array(
                    np.concatenate([m_ds, np.zeros(n_self, np.int8)])
                ),
                "cand": pa.array(
                    np.concatenate([m_cand, np.full(n_self, -1, np.int64)])
                ),
                "nom": pa.array(
                    np.concatenate([m_nom, np.zeros(n_self, np.int8)])
                ),
                "self_status": pa.array(
                    np.concatenate(
                        [
                            np.full(n_msg, -1, np.int8),
                            sb.values["status"].astype(np.int8),
                        ]
                    )
                ),
                "self_span": pa.array(
                    np.concatenate(
                        [np.full(n_msg, -1, np.int64), sb.values["span"]]
                    )
                ),
                "self_nominee": pa.array(
                    np.concatenate(
                        [
                            np.full(n_msg, -1, np.int64),
                            sb.values["nominee"],
                        ]
                    )
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        unc = group.column("unc").to_numpy(zero_copy_only=False)
        dsf = group.column("dsflag").to_numpy(zero_copy_only=False)
        cand = group.column("cand").to_numpy(zero_copy_only=False)
        nom = group.column("nom").to_numpy(zero_copy_only=False)
        s_st = group.column("self_status").to_numpy(zero_copy_only=False)
        s_sp = group.column("self_span").to_numpy(zero_copy_only=False)
        s_no = group.column("self_nominee").to_numpy(zero_copy_only=False)
        order = np.argsort(dst, kind="stable")
        dst, unc, dsf, cand, nom, s_st, s_sp, s_no = (
            a[order] for a in (dst, unc, dsf, cand, nom, s_st, s_sp, s_no)
        )
        boundary = np.empty(len(dst), dtype=bool)
        if len(dst):
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(boundary)
        vids = dst[seg]
        unc_sum = np.add.reduceat(unc, seg)
        ds_any = np.maximum.reduceat(dsf, seg)
        cand_max = np.maximum.reduceat(cand, seg)
        nom_any = np.maximum.reduceat(nom, seg)
        status = np.maximum.reduceat(s_st, seg).astype(np.int64)
        span = np.maximum.reduceat(s_sp, seg)
        nominee = np.maximum.reduceat(s_no, seg)

        phase = self.iteration % 3
        if phase == 0:
            newly_cov = (status == _UNCOVERED) & (ds_any > 0)
            status = np.where(newly_cov, _COVERED, status)
            span = unc_sum + (status == _UNCOVERED)
        elif phase == 1:
            mine = self._key(span, vids)
            best = np.maximum(cand_max, mine)
            best_vid = (self._BASE - 1) - (best % self._BASE)
            nominee = np.where(status == _UNCOVERED, best_vid, -1)
        else:
            join = (nom_any > 0) | (
                (status == _UNCOVERED) & (nominee == vids)
            )
            status = np.where(join, _IN_DS, status)

        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "status": pa.array(status),
                "span": pa.array(span),
                "nominee": pa.array(nominee),
                "active": pa.array(
                    (status == _UNCOVERED).astype(np.int64)
                ),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        # only a completed round (phase-2 apply + the following
        # phase-0 coverage) leaves a consistent zero; checking the
        # metric alone is safe because UNCOVERED only ever decreases
        return metrics["active"] == 0.0


def dominating_set(
    graph: GraphMeta, max_rounds: int = 64
) -> ray.data.Dataset:
    """Rows ``(vid, in_ds int8)`` — a deterministic dominating set of
    the (symmetrized) graph via greedy span nomination."""
    kernel = DominatingSetKernel(num_parts=graph.num_parts)
    run = run_kernel(kernel, graph, max_iter=3 * max_rounds)
    if not run.converged:
        raise RuntimeError(
            f"dominating set did not converge in {max_rounds} rounds"
        )

    def project(batch: pa.Table) -> pa.Table:
        status = batch.column("status").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": batch.column("vid"),
                "in_ds": pa.array((status == _IN_DS).astype(np.int8)),
            }
        )

    return run.state.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
