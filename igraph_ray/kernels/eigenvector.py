"""Eigenvector centrality — distributed power iteration.

Semantics match ``networkx.eigenvector_centrality`` (networkx 3.6.1,
``algorithms/centrality/eigenvector.py``; igraph twin
``igraph_eigenvector_centrality``):

- start ``x0`` = uniform 1/n (or ``nstart`` normalized by its sum);
- per iteration ``x ← xlast + A'xlast`` (each vertex keeps its own
  value and adds weighted in-contributions — the +I shift that makes
  the iteration converge on bipartite graphs too);
- L2 normalization each iteration (``math.hypot``, 0 → 1);
- convergence when ``Σ|x_t − x_{t-1}| < n·tol`` over the NORMALIZED
  iterates; raises ``PowerIterationFailedConvergence`` past max_iter.

Distribution note — the global L2 norm is a barrier nx applies between
iterations.  Here the state stays *unnormalized*; the driver computes
``norm = sqrt(Σx²)`` from the per-iteration ``sumsq`` metric (a state
column, reduced by the chassis' existing tree aggregate) and feeds it
back through the kernel object (re-pickled to workers every
iteration), so scatter normalizes lazily — no extra pass, no second
shuffle.  The convergence residual is therefore evaluated one
iteration later than nx evaluates it (over the same pair of iterates),
and the converged result is the ``xn_prev`` column — exactly the
iterate nx returns.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.kernels.base import KernelRun, run_kernel
from igraph_ray.kernels.pagerank import PowerIterationFailedConvergence
from igraph_ray.stages.partition import GraphMeta

MSG_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("contrib", pa.float64()),
        ("old", pa.float64()),
        ("prev", pa.float64()),
    ]
)


@dataclass
class EigenvectorKernel:
    num_vertices: int
    num_parts: int
    tol: float = 1.0e-6
    nstart: dict[int, float] | None = None
    #: L2 norm of the current (unnormalized) state — updated by the
    #: driver in ``converged`` after every iteration's sumsq metric
    norm: float = 1.0
    #: integer-exact mode (eigenvector_fixed_integer): x0 = ones, the
    #: norm stays pinned at 1 so every intermediate is an
    #: integer-valued float64 — sums become order-independent exact
    integer_mode: bool = False

    state_value_cols: dict = field(
        default_factory=lambda: {
            "x": np.float64,  # unnormalized current iterate
            "xn_prev": np.float64,  # previous iterate, normalized
            "sumsq": np.float64,
            "resid": np.float64,
        }
    )
    metric_cols: tuple = ("sumsq", "resid")
    message_schema: pa.Schema = MSG_SCHEMA

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        vids = csr.get("vids", np.empty(0, np.int64))
        if self.integer_mode:
            x0 = np.ones(len(vids))
        elif self.nstart is None:
            x0 = np.full(len(vids), 1.0 / max(1, self.num_vertices))
        else:
            s = float(sum(self.nstart.values()))
            x0 = np.array([self.nstart.get(int(v), 0.0) / s for v in vids])
        return {
            "x": x0,
            "xn_prev": np.zeros(len(vids)),
            "sumsq": x0 * x0,
            "resid": np.full(len(vids), np.inf),
        }

    def scatter(self, csr, sb) -> pa.Table:
        xn = sb.aligned["x"] / self.norm
        if len(csr.get("src_pos", ())):
            vals = xn[csr["src_pos"]] * np.asarray(csr["w"], np.float64)
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
                        [np.zeros(len(contrib)), sb.values["x"] / self.norm]
                    )
                ),
                "prev": pa.array(
                    np.concatenate(
                        [np.zeros(len(contrib)), sb.values["xn_prev"]]
                    )
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        contrib = group.column("contrib").to_numpy(zero_copy_only=False)
        old = group.column("old").to_numpy(zero_copy_only=False)
        prev = group.column("prev").to_numpy(zero_copy_only=False)

        # deterministic float reduction order (bitwise resume parity)
        order = np.lexsort((prev, old, contrib, dst))
        dst, contrib, old, prev = (
            dst[order],
            contrib[order],
            old[order],
            prev[order],
        )
        boundary = np.empty(len(dst), dtype=bool)
        if len(dst):
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(boundary)
        vids = dst[seg]
        in_sum = np.add.reduceat(contrib, seg)
        old_x = np.add.reduceat(old, seg)  # one self row per vid
        prev_x = np.add.reduceat(prev, seg)

        new = old_x + in_sum  # x ← xlast + A'xlast (normalized xlast)
        resid = np.abs(old_x - prev_x)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "x": pa.array(new),
                "xn_prev": pa.array(old_x),
                "sumsq": pa.array(new * new),
                "resid": pa.array(resid),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        if self.integer_mode:
            return False  # fixed iteration count, norm pinned at 1
        # driver-side norm feedback for the next iteration's scatter
        self.norm = float(np.sqrt(metrics["sumsq"])) or 1.0
        if iteration == 0:
            return False  # resid at iter 0 compares x0 against zeros
        return metrics["resid"] < self.num_vertices * self.tol


def eigenvector_centrality(
    graph: GraphMeta,
    num_vertices: int,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    nstart: dict[int, float] | None = None,
) -> ray.data.Dataset:
    """Rows ``(vid, centrality)`` — the L2-normalized dominant
    eigenvector iterate, nx.eigenvector_centrality parity."""
    kernel = EigenvectorKernel(
        num_vertices=num_vertices,
        num_parts=graph.num_parts,
        tol=tol,
        nstart=nstart,
    )
    run = run_kernel(kernel, graph, max_iter=max_iter)
    if not run.converged:
        raise PowerIterationFailedConvergence(
            f"eigenvector_centrality failed to converge in {max_iter} "
            "iterations"
        )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                # the iterate whose residual met tol (what nx returns)
                "centrality": batch.column("xn_prev"),
            }
        )

    return run.state.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )


def eigenvector_fixed_integer(
    graph: GraphMeta,
    num_vertices: int,
    cap_bits: int = 49,
    max_pow_iters: int = 40,
) -> pa.Table:
    """(vid, centrality) — INTEGER-EXACT fixed power iteration.

    The same ``x ← x + A'x`` chassis loop, but from ``x0 = 1`` with
    the norm pinned at 1: with integer edge weights every
    intermediate value is an integer-valued float64, so all message
    sums are ORDER-INDEPENDENT exact (no IEEE summation-order wobble
    across partitionings) and the whole run — including the single
    final L2 normalization, done once on the driver in exact integer
    arithmetic — is bitwise reproducible and replayable by the
    driver's DuckDB twin.

    The iteration count is the shared deterministic rule
    ``T = max(1, largest t ≤ max_pow_iters with (1+W)^t ≤ 2^cap_bits)``
    (W = max weighted degree, an exact integer both sides compute),
    which keeps every product/sum below 2^53 (float64's exact-integer
    range).  Direction quality is (λ2/λ1)^T — a fixed-iteration
    estimate, not the tol-converged nx iterate; nx parity of the
    standard mode stays pytest-gated.  The final gather is bounded
    (replay-scale surface; use ``eigenvector_centrality`` at scale).
    """
    import math

    kernel = EigenvectorKernel(
        num_vertices=num_vertices,
        num_parts=graph.num_parts,
        tol=0.0,
        integer_mode=True,
    )
    # probe iteration: x1 = 1 + weighted_degree — yields W for free
    run = run_kernel(kernel, graph, max_iter=1)

    def gather(state) -> pa.Table:
        return pa.concat_tables(
            state.select_columns(["vid", "x"]).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        ).sort_by("vid")

    t1 = gather(run.state)
    x1 = t1.column("x").to_numpy(zero_copy_only=False)
    W = int(x1.max()) - 1 if len(x1) else 0
    cap = 1 << cap_bits
    T = 1
    while T < max_pow_iters and (1 + W) ** (T + 1) <= cap:
        T += 1
    if T > 1:
        run = run_kernel(
            kernel, graph, max_iter=T - 1, initial_state=run.state
        )
    tbl = gather(run.state)
    x = tbl.column("x").to_numpy(zero_copy_only=False)
    # exact integer sum of squares, then ONE deterministic rounding
    # (int → float64, round-nearest — the same as SQL's HUGEINT cast)
    S = sum(int(v) ** 2 for v in x)
    norm = math.sqrt(float(S)) or 1.0
    return pa.table(
        {
            "vid": tbl.column("vid"),
            "centrality": pa.array(x / norm),
        }
    )
