"""Katz centrality — distributed power iteration.

Semantics match ``networkx.katz_centrality`` (networkx 3.6.1,
``algorithms/centrality/katz.py``; igraph has no direct twin — the
closest surface is ``igraph_personalized_pagerank`` with damping, but
Katz is the classic alpha-attenuated walk count):

- start ``x0 = 0`` for every vertex (nx default ``nstart=None``);
- per iteration ``x ← α·A'x_last + β`` (contributions flow along arcs
  ``u→v`` weighted by the arc weight, i.e. the same transpose-product
  direction as the eigenvector kernel);
- convergence when ``Σ|x_t − x_{t-1}| < n·tol``; raises
  ``PowerIterationFailedConvergence`` past ``max_iter``;
- after convergence the iterate is L2-normalized
  (``s = 1/sqrt(Σx²)``, 0 → 1 — nx ``normalized=True`` default).

Distribution note — unlike the eigenvector kernel no per-iteration
global norm barrier exists in the reference semantics, so each
iteration is exactly one scatter→shuffle→apply superstep: ``apply``
sees both the arriving contributions and the vertex's own previous
value (piggybacked on the self row), computes ``new = α·Σin + β`` and
the residual ``|new − old|`` in the same pass, and the chassis' tree
aggregate reduces the residual and the final ``Σx²`` — the L2 scale is
applied lazily in the projection, not as an extra pass.
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
        ("old", pa.float64()),
    ]
)


@dataclass
class KatzKernel:
    num_vertices: int
    num_parts: int
    alpha: float = 0.1
    beta: float = 1.0
    tol: float = 1.0e-6

    state_value_cols: dict = field(
        default_factory=lambda: {
            "x": np.float64,
            "sumsq": np.float64,
            "resid": np.float64,
        }
    )
    metric_cols: tuple = ("sumsq", "resid")
    message_schema: pa.Schema = MSG_SCHEMA

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        vids = csr.get("vids", np.empty(0, np.int64))
        n = len(vids)
        return {
            "x": np.zeros(n),
            "sumsq": np.zeros(n),
            # force at least one iteration so x reaches the β fixed
            # point even on edgeless graphs (nx runs ≥1 iteration too)
            "resid": np.full(n, np.inf),
        }

    def scatter(self, csr, sb) -> pa.Table:
        x = sb.aligned["x"]
        if len(csr.get("src_pos", ())):
            vals = x[csr["src_pos"]] * np.asarray(csr["w"], np.float64)
            contrib = np.add.reduceat(vals, csr["seg_start"])
            seg_dst = csr["seg_dst"]
            seg_dst_part = csr["seg_dst_part"]
        else:
            contrib = np.empty(0, np.float64)
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
                "old": pa.array(
                    np.concatenate(
                        [np.zeros(len(contrib)), sb.values["x"]]
                    )
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        contrib = group.column("contrib").to_numpy(zero_copy_only=False)
        old = group.column("old").to_numpy(zero_copy_only=False)

        # deterministic float reduction order (bitwise resume parity)
        order = np.lexsort((old, contrib, dst))
        dst, contrib, old = dst[order], contrib[order], old[order]
        boundary = np.empty(len(dst), dtype=bool)
        if len(dst):
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(boundary)
        vids = dst[seg]
        in_sum = np.add.reduceat(contrib, seg)
        old_x = np.add.reduceat(old, seg)  # one self row per vid

        new = self.alpha * in_sum + self.beta
        resid = np.abs(new - old_x)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "x": pa.array(new),
                "sumsq": pa.array(new * new),
                "resid": pa.array(resid),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        # remember the last Σx² so the projection can L2-normalize
        # without another pass over the state
        self.final_sumsq = float(metrics["sumsq"])
        return metrics["resid"] < self.num_vertices * self.tol


def katz_centrality(
    graph: GraphMeta,
    num_vertices: int,
    alpha: float = 0.1,
    beta: float = 1.0,
    tol: float = 1.0e-6,
    max_iter: int = 1000,
) -> ray.data.Dataset:
    """Rows ``(vid, centrality)`` — L2-normalized Katz centrality,
    nx.katz_centrality parity (``alpha`` must satisfy
    ``alpha < 1/λ_max`` for convergence, exactly as in the reference).
    """
    kernel = KatzKernel(
        num_vertices=num_vertices,
        num_parts=graph.num_parts,
        alpha=alpha,
        beta=beta,
        tol=tol,
    )
    run = run_kernel(kernel, graph, max_iter=max_iter)
    if not run.converged:
        raise PowerIterationFailedConvergence(
            f"katz_centrality failed to converge in {max_iter} iterations"
        )
    norm = float(np.sqrt(getattr(kernel, "final_sumsq", 0.0))) or 1.0

    def project(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": batch.column("vid"),
                "centrality": pa.array(x / norm),
            }
        )

    return run.state.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
