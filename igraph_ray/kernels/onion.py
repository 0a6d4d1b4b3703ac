"""Onion decomposition — layer indices refining the k-core peeling
(networkx oracle: ``nx.onion_layers``,
``NX/algorithms/core.py``; Hébert-Dufresne, Grochow & Allard,
"Multi-scale structure and topological anomaly detection via a new
network statistic: The onion decomposition", Sci. Rep. 6, 2016).

Round r removes ALL alive vertices whose remaining degree is ≤ the
current core threshold (the monotone running max of the per-round
global minimum degree — nx's exact rule, with initially-isolated
vertices forming layer 1 on their own) and assigns them layer r.  The
loop
is inherently sequential in layers, so the driver runs ONE chassis
iteration per layer: a per-block partial reduce yields the global
minimum alive degree (P tiny rows on the driver — never a full-state
gather), the kernel broadcasts it as a plain field (the kernel object
is re-pickled each iteration), removed vertices emit a pre-combined
decrement count per neighbour, and apply stamps the layer / lowers
the survivors' degrees.

Scatter obeys the chassis partial-batch contract (base.py: messages
only from PRESENT rows): every emission is masked by
``sb.present[csr['src_pos']]``, so checkpoint-reloaded or re-blocked
state slices never double-emit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from igraph_ray.kernels.base import (
    KernelRun,
    init_state_dataset,
    run_kernel,
)
from igraph_ray.stages.partition import GraphMeta

MSG_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("dec", pa.int64()),
        ("self_layer", pa.int64()),
        ("self_deg", pa.int64()),
    ]
)


@dataclass
class OnionKernel:
    num_parts: int
    threshold: int = -1  # set by the driver before each iteration
    layer_now: int = 0

    state_value_cols: dict = field(
        default_factory=lambda: {
            "layer": np.int64,
            "deg": np.int64,
            "removed": np.int64,
        }
    )
    metric_cols: tuple = ("removed",)
    message_schema: pa.Schema = MSG_SCHEMA

    def init_state(self, csr, part: int):
        vids = csr.get("vids", np.empty(0, np.int64))
        deg = csr.get("out_degree", np.zeros(len(vids), np.int64))
        return {
            "layer": np.zeros(len(vids), dtype=np.int64),
            "deg": deg.astype(np.int64).copy(),
            "removed": np.zeros(len(vids), dtype=np.int64),
        }

    def scatter(self, csr, sb) -> pa.Table:
        layer = sb.aligned["layer"]
        deg = sb.aligned["deg"]

        m_part = np.empty(0, np.int32)
        m_dst = np.empty(0, np.int64)
        m_dec = np.empty(0, np.int64)
        if len(csr.get("src_pos", ())) and sb.present.any():
            present = sb.present[csr["src_pos"]]
            removed_src = (
                present
                & (layer[csr["src_pos"]] == 0)
                & (deg[csr["src_pos"]] <= self.threshold)
            )
            dst = csr["dst"][removed_src]
            dst_part = csr["dst_part"][removed_src]
            if len(dst):
                order = np.lexsort((dst, dst_part))
                dst, dst_part = dst[order], dst_part[order]
                new_seg = np.empty(len(dst), dtype=bool)
                new_seg[0] = True
                new_seg[1:] = dst[1:] != dst[:-1]
                seg = np.flatnonzero(new_seg)
                m_part = dst_part[seg]
                m_dst = dst[seg]
                m_dec = np.diff(np.append(seg, len(dst))).astype(np.int64)

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
                "dec": pa.array(
                    np.concatenate([m_dec, np.zeros(n_self, np.int64)])
                ),
                "self_layer": pa.array(
                    np.concatenate(
                        [np.full(n_msg, -1, np.int64), sb.values["layer"]]
                    )
                ),
                "self_deg": pa.array(
                    np.concatenate(
                        [np.full(n_msg, -1, np.int64), sb.values["deg"]]
                    )
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        dec = group.column("dec").to_numpy(zero_copy_only=False)
        slf_layer = group.column("self_layer").to_numpy(
            zero_copy_only=False
        )
        slf_deg = group.column("self_deg").to_numpy(zero_copy_only=False)
        if len(dst) == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "vid": pa.array([], pa.int64()),
                    "layer": pa.array([], pa.int64()),
                    "deg": pa.array([], pa.int64()),
                    "removed": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((dst,))
        dst, dec = dst[order], dec[order]
        slf_layer, slf_deg = slf_layer[order], slf_deg[order]
        new_seg = np.empty(len(dst), dtype=bool)
        new_seg[0] = True
        new_seg[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(new_seg)
        vids = dst[seg]
        layer = np.maximum.reduceat(slf_layer, seg)  # self row value
        deg = np.maximum.reduceat(slf_deg, seg)
        total_dec = np.add.reduceat(dec, seg)

        alive = layer == 0
        removed_now = alive & (deg <= self.threshold)
        new_layer = np.where(removed_now, self.layer_now, layer)
        new_deg = np.where(
            alive & ~removed_now, deg - total_dec, deg
        ).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "layer": pa.array(new_layer.astype(np.int64)),
                "deg": pa.array(new_deg),
                "removed": pa.array(removed_now.astype(np.int64)),
            }
        )

    def converged(self, metrics, iteration) -> bool:
        return False  # the driver runs exactly one iteration per layer


def _alive_min_degree(state) -> int | None:
    """Global min degree among alive (layer == 0) vertices via
    per-block partial minima — P tiny rows to the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        layer = batch.column("layer").to_numpy(zero_copy_only=False)
        deg = batch.column("deg").to_numpy(zero_copy_only=False)
        alive = layer == 0
        if not alive.any():
            return pa.table({"m": pa.array([], pa.int64())})
        return pa.table({"m": pa.array([int(deg[alive].min())])})

    rows = state.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    if not rows:
        return None
    return min(r["m"] for r in rows)


def onion_layers(graph: GraphMeta, max_layers: int = 100_000) -> KernelRun:
    """Per-vertex onion layer (1-based) over the symmetrized graph —
    ``nx.onion_layers`` parity.  Result state columns: (vid, layer)."""
    kernel = OnionKernel(num_parts=graph.num_parts)
    state = init_state_dataset(kernel, graph).materialize()
    run = KernelRun(state=state, iterations=0, converged=False)
    layer = 0
    current_core = 1
    first_round = True
    while layer < max_layers:
        m = _alive_min_degree(state)
        if m is None:
            run.converged = True
            break
        layer += 1
        if first_round and m == 0:
            # nx special case: initially-isolated vertices are layer 1
            # on their own, without consuming the core-1 threshold
            kernel.threshold = 0
        else:
            current_core = max(current_core, int(m))
            kernel.threshold = current_core
        first_round = False
        kernel.layer_now = layer
        step = run_kernel(kernel, graph, max_iter=1, initial_state=state)
        state = step.state
        run.iterations += 1
        run.metrics_history.extend(step.metrics_history)
    run.state = state
    return run
