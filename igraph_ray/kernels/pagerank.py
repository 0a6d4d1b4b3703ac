"""K1 — PageRank: distributed power iteration with damping.

Semantics match ``networkx.pagerank`` (networkx 3.6.1,
``algorithms/link_analysis/pagerank_alg.py``, itself igraph-compatible —
SURVEY.md §2.1 K1):

- transition = out-weight-normalized edge weights
  (``pagerank_alg.py:460-464``); normalization is local to a partition
  because a vertex's out-edges are co-located (partition by src).
- start ``x0 = 1/N`` uniform, or normalized ``nstart``
  (``pagerank_alg.py:469-471``);
- per iteration ``x ← α·(xW + dangling_mass·dangling_w) + (1−α)·p``
  (``pagerank_alg.py:491-494``), where ``dangling_mass = Σ x[v]`` over
  zero-out-degree vertices (``:488``) and ``dangling_w`` defaults to
  the personalization vector (``:482-483``);
- L1 convergence: ``Σ|x_new − x| < N·tol`` (``:495-496``); raises
  :class:`PowerIterationFailedConvergence` past ``max_iter`` like the
  reference (``:498``).

Message protocol (one shuffle per iteration):

- contribution rows ``(dst_part, dst, contrib, old=0)`` — pre-combined
  per (source partition, dst) via ``np.add.reduceat``;
- self rows ``(part(v), v, 0, old=x[v])`` — carry the old rank through
  the shuffle so apply computes the residual and covers vertices with
  no in-edges;
- dangling rows ``(q, dst=-1, local_dangling_mass, 0)`` broadcast to
  every partition q (P² tiny rows) so apply sees the global dangling
  mass without a second barrier.

Apply sorts messages by (dst, contrib, old) before reducing, making
float summation order — and therefore the whole run — bitwise
deterministic for resume-equivalence tests.
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
        ("contrib", pa.float64()),
        ("old", pa.float64()),
    ]
)


class PowerIterationFailedConvergence(Exception):
    """Raised when PageRank fails to converge within max_iter
    (mirrors ``networkx.PowerIterationFailedConvergence``)."""


@dataclass
class PageRankKernel:
    num_vertices: int
    num_parts: int
    alpha: float = 0.85
    tol: float = 1.0e-6
    # Optional small-side vectors (vid -> weight), broadcast with the
    # kernel object itself.  At 10^12-vertex scale these would become
    # vid-keyed side tables; the uniform default needs no vector at all.
    personalization: dict[int, float] | None = None
    dangling: dict[int, float] | None = None
    nstart: dict[int, float] | None = None

    state_value_cols: dict = field(
        default_factory=lambda: {"rank": np.float64, "resid": np.float64}
    )
    metric_cols: tuple = ("resid",)
    message_schema: pa.Schema = MSG_SCHEMA

    def _norm_dict(self, d: dict[int, float], what: str) -> dict[int, float]:
        s = float(sum(d.values()))
        if s == 0:
            raise ZeroDivisionError(f"{what} sums to zero")
        return {k: v / s for k, v in d.items()}

    def _p_for(self, vids: np.ndarray) -> np.ndarray:
        if self.personalization is None:
            return np.full(len(vids), 1.0 / max(1, self.num_vertices))
        p = self._norm_dict(self.personalization, "personalization")
        return np.array([p.get(int(v), 0.0) for v in vids])

    def _dangling_for(self, vids: np.ndarray) -> np.ndarray:
        if self.dangling is None:
            return self._p_for(vids)
        d = self._norm_dict(self.dangling, "dangling")
        return np.array([d.get(int(v), 0.0) for v in vids])

    # -- chassis hooks ---------------------------------------------------
    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        vids = csr.get("vids", np.empty(0, np.int64))
        if self.nstart is None:
            x0 = np.full(len(vids), 1.0 / max(1, self.num_vertices))
        else:
            s = float(sum(self.nstart.values()))
            x0 = np.array([self.nstart.get(int(v), 0.0) / s for v in vids])
        return {"rank": x0, "resid": np.zeros(len(vids))}

    def scatter(self, csr, sb) -> pa.Table:
        # ranks aligned to csr['vids'], zero-filled for absent rows —
        # absent srcs then contribute exactly 0 through the reduceat,
        # so partial batches compose additively.
        rank = sb.aligned["rank"]
        if len(csr.get("src_pos", ())):
            vals = rank[csr["src_pos"]] * csr["w_norm"]
            contrib = np.add.reduceat(vals, csr["seg_start"])
            seg_dst = csr["seg_dst"]
            seg_dst_part = csr["seg_dst_part"]
        else:
            contrib = np.empty(0, np.float64)
            seg_dst = np.empty(0, np.int64)
            seg_dst_part = np.empty(0, np.int32)

        # local dangling mass over PRESENT rows only (absent are 0),
        # broadcast to every partition; skipped when zero
        dangling_mask = csr["out_weight"] == 0.0
        local_dm = float(rank[dangling_mask].sum())
        all_parts = (
            np.arange(self.num_parts, dtype=np.int32)
            if local_dm != 0.0
            else np.empty(0, np.int32)
        )
        n_dm = len(all_parts)

        # self rows only for rows actually in this batch
        self_vids = sb.vids
        self_old = sb.values["rank"]
        n_self = len(self_vids)
        dst_part = np.concatenate(
            [seg_dst_part, np.full(n_self, sb.part, np.int32), all_parts]
        )
        dst = np.concatenate([seg_dst, self_vids, np.full(n_dm, -1, np.int64)])
        contrib_col = np.concatenate(
            [contrib, np.zeros(n_self), np.full(n_dm, local_dm)]
        )
        old_col = np.concatenate(
            [np.zeros(len(contrib)), self_old, np.zeros(n_dm)]
        )
        return pa.table(
            {
                "dst_part": pa.array(dst_part.astype(np.int32)),
                "dst": pa.array(dst.astype(np.int64)),
                "contrib": pa.array(contrib_col),
                "old": pa.array(old_col),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        contrib = group.column("contrib").to_numpy(zero_copy_only=False)
        old = group.column("old").to_numpy(zero_copy_only=False)

        dm_mask = dst == -1
        # dm rows arrive in shuffle order, which is outside the lexsort
        # below — sort before summing so the float reduction order (and
        # hence bitwise resume equivalence) is deterministic on graphs
        # with dangling mass
        dangling_mass = float(np.sort(contrib[dm_mask]).sum())
        dst, contrib, old = dst[~dm_mask], contrib[~dm_mask], old[~dm_mask]

        # deterministic reduction order: sort by (dst, contrib, old)
        order = np.lexsort((old, contrib, dst))
        dst, contrib, old = dst[order], contrib[order], old[order]
        boundary = np.empty(len(dst), dtype=bool)
        if len(dst):
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
            seg = np.flatnonzero(boundary)
            vids = dst[seg]
            in_sum = np.add.reduceat(contrib, seg)
            old_rank = np.add.reduceat(old, seg)
        else:
            vids = np.empty(0, np.int64)
            in_sum = np.empty(0, np.float64)
            old_rank = np.empty(0, np.float64)

        p = self._p_for(vids)
        dw = self._dangling_for(vids)
        new = self.alpha * (in_sum + dangling_mass * dw) + (1.0 - self.alpha) * p
        resid = np.abs(new - old_rank)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "rank": pa.array(new),
                "resid": pa.array(resid),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        return metrics["resid"] < self.num_vertices * self.tol


def pagerank(
    graph: GraphMeta,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1.0e-6,
    personalization: dict[int, float] | None = None,
    dangling: dict[int, float] | None = None,
    nstart: dict[int, float] | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    raise_on_nonconvergence: bool = True,
) -> KernelRun:
    """Run PageRank over a partitioned graph; final state dataset has
    rows ``(part, vid, rank, resid)``."""
    kernel = PageRankKernel(
        num_vertices=graph.num_vertices,
        num_parts=graph.num_parts,
        alpha=alpha,
        tol=tol,
        personalization=personalization,
        dangling=dangling,
        nstart=nstart,
    )
    run = run_kernel(
        kernel,
        graph,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )
    if not run.converged and raise_on_nonconvergence:
        raise PowerIterationFailedConvergence(
            f"PageRank failed to converge in {max_iter} iterations"
        )
    return run
