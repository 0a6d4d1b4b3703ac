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


MSG_SCHEMA_INT = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("contrib", pa.float64()),
        ("old", pa.float64()),
        ("oldz", pa.float64()),
    ]
)


@dataclass
class KatzFixedIntegerKernel:
    """INTEGER-EXACT truncated Katz at ``alpha = 1/16``.

    The scaled recurrence ``y_{t+1} = A'y_t + 16·z_t``,
    ``z_{t+1} = 16·z_t`` from ``y_0 = 0, z_0 = 1`` keeps
    ``y_t = 16^t · x_t`` where ``x_t`` is the Katz iterate — every
    intermediate is an exact integer-valued float64 (integer edge
    weights), so message sums are order-independent and the run is
    bitwise replayable by the driver's DuckDB twin.  The 16^t scale
    cancels in the final L2 normalization.  ``z`` is per-vertex state
    only so the recurrence needs no iteration counter anywhere.
    """

    num_vertices: int
    num_parts: int

    state_value_cols: dict = field(
        default_factory=lambda: {
            "x": np.float64,
            "z": np.float64,
            "sumsq": np.float64,
        }
    )
    metric_cols: tuple = ("sumsq",)
    message_schema: pa.Schema = MSG_SCHEMA_INT

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        n = len(csr.get("vids", np.empty(0, np.int64)))
        return {
            "x": np.zeros(n),
            "z": np.ones(n),
            "sumsq": np.zeros(n),
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
                "oldz": pa.array(
                    np.concatenate(
                        [np.zeros(len(contrib)), sb.values["z"]]
                    )
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        contrib = group.column("contrib").to_numpy(zero_copy_only=False)
        old = group.column("old").to_numpy(zero_copy_only=False)
        oldz = group.column("oldz").to_numpy(zero_copy_only=False)

        order = np.lexsort((oldz, old, contrib, dst))
        dst = dst[order]
        contrib, oldz = contrib[order], oldz[order]
        boundary = np.empty(len(dst), dtype=bool)
        if len(dst):
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(boundary)
        vids = dst[seg]
        in_sum = np.add.reduceat(contrib, seg)
        z = np.add.reduceat(oldz, seg)  # one self row per vid

        new = in_sum + 16.0 * z
        newz = 16.0 * z
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "x": pa.array(new),
                "z": pa.array(newz),
                "sumsq": pa.array(new * new),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        return False  # fixed iteration count, driven by the caller


def katz_fixed_integer(
    graph: GraphMeta,
    num_vertices: int,
    cap_bits: int = 49,
) -> pa.Table:
    """(vid, centrality) — truncated Katz walk-count centrality at
    ``alpha = 1/16`` via the integer-exact scaled recurrence of
    ``KatzFixedIntegerKernel``, normalized L2 once at the end (the
    16^T scale cancels).

    The iteration count is the shared deterministic rule
    ``T = max(1, largest t ≤ 12 with (W+16)^t ≤ 2^cap_bits)``
    (W = max weighted degree, an exact integer both sides compute —
    here probed from the kernel's own second iterate
    ``y_2 = 16·wdeg + 256``; y_t ≤ (W+16)^t by induction, and t ≤ 12
    keeps z = 16^t exact) — order-independent, bitwise
    DuckDB-replayable.  Convergent nx-parity mode stays available as
    ``katz_centrality`` (pytest oracle).  Bounded final gather
    (replay-scale surface).
    """
    import math

    kernel = KatzFixedIntegerKernel(
        num_vertices=num_vertices, num_parts=graph.num_parts
    )

    def gather(state) -> pa.Table:
        return pa.concat_tables(
            state.select_columns(["vid", "x"]).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        ).sort_by("vid")

    # probe: y_2 = 16·wdeg + 256 yields W from the kernel's own graph
    run = run_kernel(kernel, graph, max_iter=2)
    y2 = gather(run.state).column("x").to_numpy(zero_copy_only=False)
    W = int((int(y2.max()) - 256) // 16) if len(y2) else 0
    cap = 1 << cap_bits
    T = 1
    while T < 12 and (W + 16) ** (T + 1) <= cap:
        T += 1
    if T > 2:
        run = run_kernel(
            kernel, graph, max_iter=T - 2, initial_state=run.state
        )
    elif T < 2:
        run = run_kernel(kernel, graph, max_iter=T)
    tbl = gather(run.state)
    x = tbl.column("x").to_numpy(zero_copy_only=False)
    S = sum(int(v) ** 2 for v in x)
    norm = math.sqrt(float(S)) or 1.0
    return pa.table(
        {
            "vid": tbl.column("vid"),
            "centrality": pa.array(x / norm),
        }
    )
