"""K3 — label propagation community detection (synchronous,
deterministic schedule).

Reference semantics: ``networkx.community.asyn_lpa_communities``
(``algorithms/community/label_propagation.py:142-233``; igraph's
``igraph_community_label_propagation`` is the same Raghavan-2007
algorithm): init every vertex with a unique label, repeatedly adopt the
most frequent label among neighbors (edge-weighted, default weight 1),
keeping the current label when it is already among the max-frequency
labels (``label_propagation.py:229-231``), until no vertex changes.

Deliberate semantic delta (SURVEY.md §2.3(1)): the reference shuffles
vertices with a seeded RNG and breaks ties randomly — a sequential,
order-dependent schedule that cannot be replayed distributed.  We run
a **semi-synchronous schedule**: each round updates only one
hashed-vid-parity class with a deterministic smallest-label tie-break.
This is the distributed analogue of the reference's semi-synchronous
variant (``label_propagation.py:236-338``), which updates independent
color classes one at a time with a deterministic Prec-Max rule
precisely to avoid the fully-synchronous 2-cycle (a star graph
oscillates hub↔leaves under lock-step updates).  Hash parity is not a
proper coloring, so adjacent same-class vertices can still swap labels;
a per-vertex ``prev`` column detects the period-2 alternation and
breaks it deterministically to the smaller label (a stable fixed
point), resetting afterwards so no vertex is trapped below its
neighborhood-maximal label.  Convergence = a full parity cycle with
zero changes.  Verification uses the fixed-point property (every vertex's
label is maximal in its neighborhood — ``label_propagation.py:297-307``)
plus exact equality on fixtures with unambiguous communities, not
bitwise label equality.

Message protocol: histogram rows ``(dst_part, dst, label, wsum,
self_lbl=-1)`` pre-combined per (source partition, dst, label); self
rows ``(part(v), v, old_label, 0.0, self_lbl=old_label)`` carry the
current label (weight 0 adds nothing to the histogram).  Apply merges
the per-dst label histogram, takes the max-weight label with
smallest-label tie-break, and keeps the current label when its weight
equals the max.
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
        ("label", pa.int64()),
        ("wsum", pa.float64()),
        ("self_lbl", pa.int64()),
        ("self_prev", pa.int64()),
    ]
)


@dataclass
class LabelPropagationKernel:
    num_parts: int
    weighted: bool = True
    #: number of parity classes in the semi-synchronous schedule
    phases: int = 2
    #: set by the driver loop before each iteration's pipeline is built
    iteration: int = 0
    #: consecutive zero-change rounds seen (driver-side convergence)
    _zero_streak: int = 0

    state_value_cols: dict = field(
        default_factory=lambda: {
            "label": np.int64,
            "changed": np.int64,
            "prev": np.int64,
        }
    )
    metric_cols: tuple = ("changed",)
    message_schema: pa.Schema = MSG_SCHEMA

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        vids = csr.get("vids", np.empty(0, np.int64))
        return {
            "label": vids.copy(),
            "changed": np.ones(len(vids), dtype=np.int64),
            # label two rounds ago, for 2-cycle detection (-1 = none)
            "prev": np.full(len(vids), -1, dtype=np.int64),
        }

    def scatter(self, csr, sb) -> pa.Table:
        label = sb.aligned["label"]

        if len(csr.get("src_pos", ())) and sb.present.any():
            from igraph_ray.utils import hash_int64

            # only the active parity class updates this round — drop
            # messages to inactive destinations (≈ halves the shuffle)
            active_parity = np.uint64(self.iteration % self.phases)
            dst_active = (
                hash_int64(csr["dst"]) % np.uint64(self.phases)
            ) == active_parity
            keep = sb.present[csr["src_pos"]] & dst_active
            lab_e = label[csr["src_pos"]][keep]
            w_all = csr["w"] if self.weighted else np.ones(len(csr["w"]))
            w_e = w_all[keep]
            dst = csr["dst"][keep]
            dst_part = csr["dst_part"][keep]
            # labels change every round → combine per (dst_part, dst,
            # label) with a fresh lexsort (edges are pre-sorted by
            # (dst_part, dst), but label order is per-iteration)
            order = np.lexsort((lab_e, dst, dst_part)) if len(dst) else np.empty(0, np.int64)
            dst, dst_part, lab_e, w_e = (
                dst[order],
                dst_part[order],
                lab_e[order],
                w_e[order],
            )
            if len(dst):
                new_seg = np.empty(len(dst), dtype=bool)
                new_seg[0] = True
                new_seg[1:] = (dst[1:] != dst[:-1]) | (lab_e[1:] != lab_e[:-1])
                seg = np.flatnonzero(new_seg)
                m_part = dst_part[seg]
                m_dst = dst[seg]
                m_lbl = lab_e[seg]
                m_w = np.add.reduceat(w_e, seg)
            else:
                m_part = np.empty(0, np.int32)
                m_dst = np.empty(0, np.int64)
                m_lbl = np.empty(0, np.int64)
                m_w = np.empty(0, np.float64)
        else:
            m_part = np.empty(0, np.int32)
            m_dst = np.empty(0, np.int64)
            m_lbl = np.empty(0, np.int64)
            m_w = np.empty(0, np.float64)

        self_vids = sb.vids
        self_lbl = sb.values["label"]
        self_prev = sb.values["prev"]
        n_self = len(self_vids)
        n_msg = len(m_dst)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate([m_part, np.full(n_self, sb.part, np.int32)])
                ),
                "dst": pa.array(np.concatenate([m_dst, self_vids])),
                "label": pa.array(np.concatenate([m_lbl, self_lbl])),
                "wsum": pa.array(np.concatenate([m_w, np.zeros(n_self)])),
                "self_lbl": pa.array(
                    np.concatenate([np.full(n_msg, -1, np.int64), self_lbl])
                ),
                "self_prev": pa.array(
                    np.concatenate([np.full(n_msg, -1, np.int64), self_prev])
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        lbl = group.column("label").to_numpy(zero_copy_only=False)
        wsum = group.column("wsum").to_numpy(zero_copy_only=False)
        slf = group.column("self_lbl").to_numpy(zero_copy_only=False)
        sprev = group.column("self_prev").to_numpy(zero_copy_only=False)

        # 1) merge duplicate (dst, label) rows from different source
        #    partitions; deterministic order via (dst, label, wsum).
        order = np.lexsort((wsum, lbl, dst))
        dst, lbl, wsum, slf, sprev = (
            dst[order],
            lbl[order],
            wsum[order],
            slf[order],
            sprev[order],
        )
        n = len(dst)
        if n == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "vid": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                    "changed": pa.array([], pa.int64()),
                    "prev": pa.array([], pa.int64()),
                }
            )
        pair_new = np.empty(n, dtype=bool)
        pair_new[0] = True
        pair_new[1:] = (dst[1:] != dst[:-1]) | (lbl[1:] != lbl[:-1])
        pseg = np.flatnonzero(pair_new)
        p_dst = dst[pseg]
        p_lbl = lbl[pseg]
        p_w = np.add.reduceat(wsum, pseg)
        p_slf = np.maximum.reduceat(slf, pseg)  # old label rides max
        p_sprev = np.maximum.reduceat(sprev, pseg)

        # 2) per-dst segments over the merged histogram
        dseg_new = np.empty(len(p_dst), dtype=bool)
        dseg_new[0] = True
        dseg_new[1:] = p_dst[1:] != p_dst[:-1]
        dseg = np.flatnonzero(dseg_new)
        vids = p_dst[dseg]
        seg_id = np.cumsum(dseg_new) - 1  # per-row dst segment index

        maxw = np.maximum.reduceat(p_w, dseg)
        old = np.maximum.reduceat(p_slf, dseg)  # self row holds the old label
        prev = np.maximum.reduceat(p_sprev, dseg)  # label two rounds ago

        # smallest label whose weight == segment max (tie-break = min
        # label, matching the deterministic Prec-Max precedent)
        is_max = p_w == maxw[seg_id]
        cand = np.where(is_max, p_lbl, np.iinfo(np.int64).max)
        best = np.minimum.reduceat(cand, dseg)

        # keep current label when it is already among the max-frequency
        # labels (label_propagation.py:229-231): find the weight of the
        # old label per dst by locating (dst, old) among the merged
        # (p_dst, p_lbl) pairs — both sorted, so a structured-key
        # searchsorted works.
        pos = np.searchsorted(_fuse(p_dst, p_lbl), _fuse(vids, old))
        pos = np.clip(pos, 0, len(p_dst) - 1)
        old_w = np.where(
            (p_dst[pos] == vids) & (p_lbl[pos] == old), p_w[pos], -1.0
        )
        new = np.where(old_w >= maxw, old, best)
        # semi-synchronous schedule: only the active parity class
        # updates this round; everyone else keeps their label.  Parity
        # comes from the hashed vid so id-namespacing schemes (e.g. all
        # vids even) cannot starve alternate rounds.
        from igraph_ray.utils import hash_int64

        active = (hash_int64(vids) % np.uint64(self.phases)).astype(
            np.int64
        ) == (self.iteration % self.phases)
        new = np.where(active, new, old)
        # 2-cycle break: if a vertex is about to return to its label of
        # two rounds ago (label swap with a neighbor — possible when
        # adjacent vertices share a parity class), both sides adopt the
        # smaller label deterministically, which is a stable fixed point.
        cycle = (new == prev) & (new != old)
        new = np.where(cycle, np.minimum(old, new), new)
        changed = (new != old).astype(np.int64)
        # prev = the last label this vertex HELD before its latest
        # change (inactive/unchanged rounds must not clobber it, or the
        # 2-cycle test would never see the alternation); once a break
        # fires, prev resets so the vertex can still adopt the true
        # neighborhood-maximal label on the next round instead of being
        # trapped at the minimum
        prev_out = np.where(
            cycle, np.int64(-1), np.where(changed.astype(bool), old, prev)
        )
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "label": pa.array(new),
                "changed": pa.array(changed),
                "prev": pa.array(prev_out),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        # converged = one full parity cycle with zero changes
        if metrics["changed"] == 0.0:
            self._zero_streak += 1
        else:
            self._zero_streak = 0
        return self._zero_streak >= self.phases


def _fuse(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Fuse two non-negative int64 arrays into one sortable uint128-ish
    key via object-free composition: (a << 64 | b) is not representable,
    so use a structured array view that sorts lexicographically."""
    out = np.empty(len(a), dtype=[("a", np.int64), ("b", np.int64)])
    out["a"] = a
    out["b"] = b
    return out


def label_propagation(
    graph: GraphMeta,
    max_iter: int = 100,
    weighted: bool = True,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> KernelRun:
    """Run synchronous label propagation; final state rows are
    ``(part, vid, label, changed)``."""
    kernel = LabelPropagationKernel(num_parts=graph.num_parts, weighted=weighted)
    return run_kernel(
        kernel,
        graph,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )
