"""Trophic levels (Levine 1980) — distributed Jacobi iteration.

Semantics match ``networkx.trophic_levels`` (networkx 3.6.1,
``algorithms/centrality/trophic.py``; defined for directed graphs):

    s_i = 1 + (1 / k_in_i) · Σ_j w_ji · s_j        (k_in_i > 0)
    s_i = 1                                         (basal: k_in_i = 0)

with k_in_i = Σ_j w_ji.  The reference solves the dense linear system
(I − P)s = 1; we run the Jacobi fixed point s ← P·s + 1 on the
chassis — each iteration is one scatter→shuffle→apply superstep.  On
the graphs where the reference is defined (every vertex reachable from
a basal vertex) every backward walk eventually exits through a basal
row, so ρ(P) < 1 and Jacobi converges geometrically; on a DAG it is
EXACT after depth+1 supersteps.  Raises past ``max_iter`` like the
PageRank family.

Partial-batch contract: the in-weight message (Σ w per destination)
depends only on the CSR, so it is masked by ``sb.present`` — a state
partition split across blocks emits each arc's weight exactly once
(the WL/SSSP masking rule, ADVICE round-2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.base import run_kernel
from igraph_ray.kernels.pagerank import PowerIterationFailedConvergence
from igraph_ray.stages.partition import GraphMeta

MSG_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("contrib", pa.float64()),
        ("wsum", pa.float64()),
        ("old", pa.float64()),
    ]
)


@dataclass
class TrophicKernel:
    num_vertices: int
    num_parts: int
    tol: float = 1.0e-10

    state_value_cols: dict = field(
        default_factory=lambda: {"s": np.float64, "resid": np.float64}
    )
    metric_cols: tuple = ("resid",)
    message_schema: pa.Schema = MSG_SCHEMA

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        n = len(csr.get("vids", np.empty(0, np.int64)))
        return {"s": np.ones(n), "resid": np.full(n, np.inf)}

    def scatter(self, csr, sb) -> pa.Table:
        s = sb.aligned["s"]
        if len(csr.get("src_pos", ())):
            w = np.asarray(csr["w"], np.float64).copy()
            # mask arcs whose source state row is absent from this
            # block — both the s·w contribution AND the constant
            # in-weight w must be emitted exactly once per arc
            absent = ~sb.present[csr["src_pos"]]
            if absent.any():
                w[absent] = 0.0
            vals = s[csr["src_pos"]] * w
            contrib = np.add.reduceat(vals, csr["seg_start"])
            wsum = np.add.reduceat(w, csr["seg_start"])
            seg_dst = csr["seg_dst"]
            seg_dst_part = csr["seg_dst_part"]
        else:
            contrib = np.empty(0, np.float64)
            wsum = np.empty(0, np.float64)
            seg_dst = np.empty(0, np.int64)
            seg_dst_part = np.empty(0, np.int32)

        n_self = len(sb.vids)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate(
                        [seg_dst_part, np.full(n_self, sb.part, np.int32)]
                    ).astype(np.int32)
                ),
                "dst": pa.array(np.concatenate([seg_dst, sb.vids])),
                "contrib": pa.array(
                    np.concatenate([contrib, np.zeros(n_self)])
                ),
                "wsum": pa.array(np.concatenate([wsum, np.zeros(n_self)])),
                "old": pa.array(
                    np.concatenate(
                        [np.zeros(len(contrib)), sb.values["s"]]
                    )
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        contrib = group.column("contrib").to_numpy(zero_copy_only=False)
        wsum = group.column("wsum").to_numpy(zero_copy_only=False)
        old = group.column("old").to_numpy(zero_copy_only=False)

        order = np.lexsort((old, wsum, contrib, dst))
        dst = dst[order]
        contrib = contrib[order]
        wsum = wsum[order]
        old = old[order]
        boundary = np.empty(len(dst), dtype=bool)
        if len(dst):
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(boundary)
        vids = dst[seg]
        in_sum = np.add.reduceat(contrib, seg)
        k_in = np.add.reduceat(wsum, seg)
        old_s = np.add.reduceat(old, seg)  # one self row per vid

        new = np.where(k_in > 0, 1.0 + in_sum / np.maximum(k_in, 1.0), 1.0)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "s": pa.array(new),
                "resid": pa.array(np.abs(new - old_s)),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        return metrics["resid"] < self.num_vertices * self.tol


def trophic_levels(
    graph: GraphMeta,
    num_vertices: int,
    tol: float = 1.0e-10,
    max_iter: int = 500,
) -> ray.data.Dataset:
    """Rows ``(vid, level)`` — Levine trophic levels, nx parity on the
    graphs where the reference is defined (≥1 basal vertex, all
    vertices reachable from the basal set)."""
    kernel = TrophicKernel(
        num_vertices=num_vertices, num_parts=graph.num_parts, tol=tol
    )
    run = run_kernel(kernel, graph, max_iter=max_iter)
    if not run.converged:
        raise PowerIterationFailedConvergence(
            f"trophic_levels failed to converge in {max_iter} iterations"
        )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"vid": batch.column("vid"), "level": batch.column("s")}
        )

    return run.state.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
