"""Maximal independent set — Luby's algorithm on the chassis.

``nx.maximal_independent_set`` surface (igraph twin:
``igraph_maximal_independent_vertex_sets`` picks one such set): a set
S with no two adjacent members where every vertex outside S has a
neighbour in S.  The output is *a* maximal independent set — which one
depends on the (deterministic) priorities, so the oracle asserts the
defining properties rather than set equality.

Luby 1986, synchronous: per round every ACTIVE vertex draws a priority
(here ``splitmix64(vid, round) >> 2`` — deterministic, so runs are
bitwise reproducible) and joins S iff its priority is a strict local
minimum among active neighbours (ties → neither joins; they retry next
round).  Neighbours of new members deactivate.  Expected O(log n)
rounds; each round is two chassis supersteps (parity-split like the
HITS kernel): even = priority exchange + join, odd = member flags +
exclusion.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.base import run_kernel
from igraph_ray.stages.partition import GraphMeta
from igraph_ray.utils import hash_int64

_ACTIVE, _IN_MIS, _EXCLUDED = 0, 1, 2
_PMAX = np.int64(2**62)

MSG_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("pri", pa.int64()),
        ("mis", pa.int8()),
        ("self_status", pa.int8()),
    ]
)


def _priority(vids: np.ndarray, rnd: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        mixed = hash_int64(
            vids.astype(np.uint64)
            ^ np.uint64((rnd * 0x9E3779B97F4A7C15) % (1 << 64))
        )
    # >> 2 keeps every real priority strictly below the _PMAX
    # no-message sentinel (2^62); the former >> 1 let half the draws
    # land in [2^62, 2^63), where a locally-minimal vertex could
    # neither send a surviving message nor pass the `mine < min_pri`
    # join test — a valid MIS still emerged, but not the documented
    # strict-local-min-per-round schedule
    return (mixed >> np.uint64(2)).astype(np.int64)


@dataclass
class LubyMISKernel:
    num_parts: int
    iteration: int = 0  # set by the chassis

    state_value_cols: dict = field(
        default_factory=lambda: {"status": np.int64, "active": np.int64}
    )
    metric_cols: tuple = ("active",)
    message_schema: pa.Schema = MSG_SCHEMA

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        vids = csr.get("vids", np.empty(0, np.int64))
        return {
            "status": np.full(len(vids), _ACTIVE, np.int64),
            "active": np.ones(len(vids), np.int64),
        }

    def scatter(self, csr, sb) -> pa.Table:
        vids_all = csr["vids"]
        status = sb.aligned["status"]
        present = sb.present
        even = self.iteration % 2 == 0
        rnd = self.iteration // 2

        src_pos = csr.get("src_pos", np.empty(0, np.int64))
        m_part = np.empty(0, np.int32)
        m_dst = np.empty(0, np.int64)
        m_pri = np.empty(0, np.int64)
        m_mis = np.empty(0, np.int8)
        if len(src_pos):
            if even:
                # active vertices broadcast this round's priority
                send = (status[src_pos] == _ACTIVE) & present[src_pos]
                pri_all = _priority(vids_all, rnd)
                vals = np.where(send, pri_all[src_pos], _PMAX)
                seg_min = np.minimum.reduceat(vals, csr["seg_start"])
                live = seg_min < _PMAX
                m_dst = csr["seg_dst"][live]
                m_part = csr["seg_dst_part"][live].astype(np.int32)
                m_pri = seg_min[live]
                m_mis = np.zeros(len(m_dst), np.int8)
            else:
                # new members flag their neighbours
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
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        pri = group.column("pri").to_numpy(zero_copy_only=False)
        mis = group.column("mis").to_numpy(zero_copy_only=False)
        self_status = group.column("self_status").to_numpy(
            zero_copy_only=False
        )
        order = np.argsort(dst, kind="stable")
        dst, pri, mis, self_status = (
            dst[order],
            pri[order],
            mis[order],
            self_status[order],
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

        even = self.iteration % 2 == 0
        rnd = self.iteration // 2
        active = status == _ACTIVE
        if even:
            mine = _priority(vids, rnd)
            join = active & (mine < min_pri)
            status = np.where(join, _IN_MIS, status)
        else:
            out = active & (any_mis > 0)
            status = np.where(out, _EXCLUDED, status)

        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "status": pa.array(status),
                "active": pa.array((status == _ACTIVE).astype(np.int64)),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        return metrics["active"] == 0.0


def maximal_independent_set(
    graph: GraphMeta, max_rounds: int = 256
) -> ray.data.Dataset:
    """Rows ``(vid, in_mis int8)`` — a deterministic maximal
    independent set of the (symmetrized) graph."""
    kernel = LubyMISKernel(num_parts=graph.num_parts)
    run = run_kernel(kernel, graph, max_iter=2 * max_rounds)
    if not run.converged:
        raise RuntimeError(
            f"Luby MIS did not converge in {max_rounds} rounds"
        )

    def project(batch: pa.Table) -> pa.Table:
        status = batch.column("status").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": batch.column("vid"),
                "in_mis": pa.array((status == _IN_MIS).astype(np.int8)),
            }
        )

    return run.state.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
