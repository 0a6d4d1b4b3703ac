"""K2 — connected components via iterative min-label propagation.

Semantics match ``networkx.connected_components``
(``algorithms/components/connected.py:18,267-282`` — BFS per unseen
vertex; SURVEY.md §2.1 K2) up to labeling: the converged min-label
fixed point assigns every vertex the **minimum vid of its component**,
the canonical labeling SURVEY.md §2.3(2) uses for exact comparison
(igraph numbers components 0..k-1; both sides canonicalize to min-vid).

Requires a symmetrized edge table (undirected semantics; for directed
inputs this computes *weakly* connected components, matching
``weakly_connected.py:15``).

Frontier optimization: min-label propagation is monotone, so only
vertices whose label changed last iteration scatter messages — message
volume collapses after the first few iterations.  Iteration count is
O(component diameter).

Message protocol: rows ``(dst_part, dst, val, old)`` where message rows
carry ``val = min over changed in-neighbors`` and ``old = INT64_MAX``;
self rows carry ``val = old = current label``.  Apply takes
``new = min(val)`` and ``old = min(old)`` per dst — no kind column
needed because min is idempotent over the self row's val.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from igraph_ray.kernels.base import KernelRun, run_kernel
from igraph_ray.stages.partition import GraphMeta

_INT64_MAX = np.iinfo(np.int64).max

MSG_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("val", pa.int64()),
        ("old", pa.int64()),
    ]
)


@dataclass
class ComponentsKernel:
    num_parts: int

    state_value_cols: dict = field(
        default_factory=lambda: {"comp": np.int64, "changed": np.int64}
    )
    metric_cols: tuple = ("changed",)
    message_schema: pa.Schema = MSG_SCHEMA

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        vids = csr.get("vids", np.empty(0, np.int64))
        return {
            "comp": vids.copy(),
            "changed": np.ones(len(vids), dtype=np.int64),
        }

    def scatter(self, csr, sb) -> pa.Table:
        # absent rows have changed=0 (neutral fill) → emit nothing for
        # them, so partial batches compose (min is idempotent anyway).
        comp = sb.aligned["comp"]
        changed = sb.aligned["changed"].astype(bool) & sb.present

        if len(csr.get("src_pos", ())):
            vals = np.where(
                changed[csr["src_pos"]], comp[csr["src_pos"]], _INT64_MAX
            )
            seg_min = np.minimum.reduceat(vals, csr["seg_start"])
            live = seg_min < _INT64_MAX
            m_part = csr["seg_dst_part"][live]
            m_dst = csr["seg_dst"][live]
            m_val = seg_min[live]
        else:
            m_part = np.empty(0, np.int32)
            m_dst = np.empty(0, np.int64)
            m_val = np.empty(0, np.int64)

        self_vids = sb.vids
        self_comp = sb.values["comp"]
        n_self = len(self_vids)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate([m_part, np.full(n_self, sb.part, np.int32)])
                ),
                "dst": pa.array(np.concatenate([m_dst, self_vids])),
                "val": pa.array(np.concatenate([m_val, self_comp])),
                "old": pa.array(
                    np.concatenate(
                        [np.full(len(m_dst), _INT64_MAX, np.int64), self_comp]
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
        boundary = np.empty(len(dst), dtype=bool)
        if len(dst):
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
            seg = np.flatnonzero(boundary)
            vids = dst[seg]
            new = np.minimum.reduceat(val, seg)
            old_min = np.minimum.reduceat(old, seg)
        else:
            vids = np.empty(0, np.int64)
            new = np.empty(0, np.int64)
            old_min = np.empty(0, np.int64)

        changed = (new < old_min).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "comp": pa.array(new),
                "changed": pa.array(changed),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        return metrics["changed"] == 0.0


def connected_components(
    graph: GraphMeta,
    max_iter: int = 10_000,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> KernelRun:
    """Run min-label propagation to fixpoint; final state rows are
    ``(part, vid, comp, changed)`` with ``comp`` = min vid of the
    component."""
    kernel = ComponentsKernel(num_parts=graph.num_parts)
    return run_kernel(
        kernel,
        graph,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )
