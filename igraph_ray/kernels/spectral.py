"""Fiedler vector / algebraic connectivity — distributed deflated
power iteration on the graph Laplacian.

Semantics: the eigenvector of the second-smallest eigenvalue λ₂ of
``L = D − A`` on the symmetrized weighted graph (igraph twin:
``igraph_laplacian`` + ARPACK in ``igraph_community_leading_eigenvector``
territory; networkx/scipy twin ``nx.fiedler_vector`` — scipy is absent
in this container, so tests oracle against a dense ``numpy.linalg.eigh``
of the explicitly-built Laplacian).

Method: power iteration on ``M = σI − L`` with σ = 2·max-degree
(Gershgorin bound ⇒ M ⪰ 0).  M's dominant eigenvector is the constant
vector (eigenvalue σ); deflating it (subtracting the mean) makes the
iteration converge to the λ₂ eigenvector with eigenvalue σ − λ₂.

Distribution note — the two global scalars each iteration needs
(mean for deflation, L2 norm for normalization) are driver-fed like
the eigenvector kernel's norm: the state stays raw, per-iteration
``s``/``sumsq`` metrics give the driver ``mean`` and ``‖x−mean‖``,
and scatter deflates+normalizes lazily — no extra barrier beyond the
chassis' one shuffle per iteration.  ``dot = Σ xnₜ·xₜ₊₁`` is the
Rayleigh quotient of M, so ``λ₂ = σ − dot`` at convergence.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.base import run_kernel
from igraph_ray.kernels.pagerank import PowerIterationFailedConvergence
from igraph_ray.stages.partition import GraphMeta, load_csr
from igraph_ray.utils import hash_int64

MSG_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("contrib", pa.float64()),
        ("old", pa.float64()),
        ("prev", pa.float64()),
        ("deg", pa.float64()),
    ]
)


@dataclass
class FiedlerKernel:
    num_vertices: int
    num_parts: int
    sigma: float
    tol: float = 1.0e-8
    #: driver-fed deflation/normalization of the raw state — updated
    #: from the s/sumsq metrics after every iteration
    mean: float = 0.0
    norm: float = 1.0
    #: Rayleigh estimate λ₂ = σ − dot, refreshed every iteration
    lam2: float = float("nan")

    state_value_cols: dict = field(
        default_factory=lambda: {
            "x": np.float64,  # raw current iterate
            "xn_prev": np.float64,  # previous deflated+normalized iterate
            "s": np.float64,
            "sumsq": np.float64,
            "dot": np.float64,
            "resid": np.float64,
        }
    )
    metric_cols: tuple = ("s", "sumsq", "dot", "resid")
    message_schema: pa.Schema = MSG_SCHEMA

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        vids = csr.get("vids", np.empty(0, np.int64))
        # deterministic pseudo-random start (partitioning-independent),
        # guaranteed non-constant so deflation never zeroes it
        x0 = (
            hash_int64(vids).astype(np.float64) / 2.0**64
        ) - 0.5
        return {
            "x": x0,
            "xn_prev": np.zeros(len(vids)),
            "s": x0,
            "sumsq": x0 * x0,
            "dot": np.zeros(len(vids)),
            "resid": np.full(len(vids), np.inf),
        }

    def scatter(self, csr, sb) -> pa.Table:
        xn = (sb.aligned["x"] - self.mean) / self.norm
        if len(csr.get("src_pos", ())):
            vals = xn[csr["src_pos"]] * np.asarray(csr["w"], np.float64)
            # partial-batch contract: (0 - mean)/norm is nonzero, so
            # arcs from rows absent in this batch must be zeroed
            vals[~sb.present[csr["src_pos"]]] = 0.0
            contrib = np.add.reduceat(vals, csr["seg_start"])
            seg_dst = csr["seg_dst"]
            seg_dst_part = csr["seg_dst_part"]
        else:
            contrib = np.empty(0, np.float64)
            seg_dst = np.empty(0, np.int64)
            seg_dst_part = np.empty(0, np.int32)

        n_self = len(sb.vids)
        # deflated+normalized own value for rows actually present
        own_xn = (sb.values["x"] - self.mean) / self.norm
        # weighted degree aligned to present rows
        vid_pos = np.searchsorted(csr["vids"], sb.vids)
        deg = np.asarray(csr["out_weight"], np.float64)[vid_pos]
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
                    np.concatenate([np.zeros(len(contrib)), own_xn])
                ),
                "prev": pa.array(
                    np.concatenate(
                        [np.zeros(len(contrib)), sb.values["xn_prev"]]
                    )
                ),
                "deg": pa.array(
                    np.concatenate([np.zeros(len(contrib)), deg])
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        contrib = group.column("contrib").to_numpy(zero_copy_only=False)
        old = group.column("old").to_numpy(zero_copy_only=False)
        prev = group.column("prev").to_numpy(zero_copy_only=False)
        deg = group.column("deg").to_numpy(zero_copy_only=False)

        order = np.lexsort((deg, prev, old, contrib, dst))
        dst, contrib, old, prev, deg = (
            dst[order],
            contrib[order],
            old[order],
            prev[order],
            deg[order],
        )
        boundary = np.empty(len(dst), dtype=bool)
        if len(dst):
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(boundary)
        vids = dst[seg]
        in_sum = np.add.reduceat(contrib, seg)
        old_xn = np.add.reduceat(old, seg)  # one self row per vid
        prev_xn = np.add.reduceat(prev, seg)
        deg_v = np.add.reduceat(deg, seg)

        # (Mx)_v = (σ − d_v)·xn_v + Σ_{u∈N(v)} w_uv·xn_u
        new = (self.sigma - deg_v) * old_xn + in_sum
        resid = np.abs(old_xn - prev_xn)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "x": pa.array(new),
                "xn_prev": pa.array(old_xn),
                "s": pa.array(new),
                "sumsq": pa.array(new * new),
                "dot": pa.array(old_xn * new),
                "resid": pa.array(resid),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        n = max(1, self.num_vertices)
        self.mean = metrics["s"] / n
        var = metrics["sumsq"] - n * self.mean * self.mean
        self.norm = float(np.sqrt(max(var, 0.0))) or 1.0
        # Rayleigh quotient of M over the unit-norm input iterate
        self.lam2 = self.sigma - metrics["dot"]
        if iteration == 0:
            return False  # resid at iter 0 compares x0 against zeros
        return metrics["resid"] < n * self.tol


def _max_weighted_degree(graph: GraphMeta) -> float:
    """Global max weighted degree, one tiny Ray task per partition
    (each reads only its own mmap'd ``out_weight`` array)."""
    parts_ds = ray.data.from_items([{"part": p} for p in graph.parts])

    def local_max(row: dict) -> dict:
        csr = load_csr(graph, int(row["part"]))
        ow = csr.get("out_weight", np.empty(0))
        return {"m": float(ow.max()) if len(ow) else 0.0}

    return float(parts_ds.map(local_max).max("m") or 0.0)


def fiedler_vector(
    graph: GraphMeta,
    num_vertices: int,
    tol: float = 1.0e-8,
    max_iter: int = 1000,
    sigma: float | None = None,
) -> tuple[ray.data.Dataset, float]:
    """Rows ``(vid, fiedler)`` (unit L2 norm, mean 0) plus the
    algebraic connectivity λ₂.

    Assumes a CONNECTED symmetrized graph (on a disconnected graph the
    iteration converges inside the 0-eigenspace of component
    indicators and λ₂ ≈ 0; run per component for meaningful vectors).
    Sign is deterministic: the entry of the smallest vid is ≥ 0.
    """
    if sigma is None:
        sigma = 2.0 * _max_weighted_degree(graph)
    if sigma <= 0:
        raise ValueError("graph has no edges (sigma <= 0)")
    kernel = FiedlerKernel(
        num_vertices=num_vertices,
        num_parts=graph.num_parts,
        sigma=float(sigma),
        tol=tol,
    )
    run = run_kernel(kernel, graph, max_iter=max_iter)
    if not run.converged:
        raise PowerIterationFailedConvergence(
            f"fiedler_vector failed to converge in {max_iter} iterations"
        )
    mean, norm = kernel.mean, kernel.norm

    # deterministic global sign: flip so the smallest vid's entry >= 0
    def head(batch: pa.Table) -> pa.Table:
        v = batch.column("vid").to_numpy(zero_copy_only=False)
        x = batch.column("x").to_numpy(zero_copy_only=False)
        if len(v) == 0:
            return pa.table(
                {"vid": pa.array([], pa.int64()),
                 "val": pa.array([], pa.float64())}
            )
        i = int(np.argmin(v))
        return pa.table(
            {
                "vid": pa.array([int(v[i])]),
                "val": pa.array([float((x[i] - mean) / norm)]),
            }
        )

    heads = run.state.map_batches(
        head, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    first = min(heads, key=lambda r: r["vid"])
    flip = -1.0 if first["val"] < 0 else 1.0

    def project(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": batch.column("vid"),
                "fiedler": pa.array(flip * (x - mean) / norm),
            }
        )

    out = run.state.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
    return out, float(kernel.lam2)


def spectral_bisection(
    graph: GraphMeta, num_vertices: int, tol: float = 1.0e-8,
    max_iter: int = 1000,
) -> ray.data.Dataset:
    """Rows ``(vid, side)`` — the classic Fiedler sweep at 0: side 1
    where the Fiedler entry ≥ 0, else 0."""
    vec, _ = fiedler_vector(graph, num_vertices, tol=tol, max_iter=max_iter)

    def cut(batch: pa.Table) -> pa.Table:
        f = batch.column("fiedler").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": batch.column("vid"),
                "side": pa.array((f >= 0).astype(np.int64)),
            }
        )

    return vec.map_batches(cut, batch_format="pyarrow", zero_copy_batch=True)
