"""k-dimensional Laplacian spectral embedding — block orthogonal
iteration on the chassis.

Generalizes the Fiedler kernel (`spectral.py`, k = 1) to the k
smallest NONTRIVIAL eigenpairs of ``L = D − A`` on a CONNECTED
symmetrized graph — the classic spectral embedding used for
partitioning and as `laplacian_eigenmaps` coordinates (Belkin–Niyogi
2003; scipy/ARPACK territory — scipy is absent, so tests oracle
against a dense ``numpy.linalg.eigh``).

Method: orthogonal (simultaneous) iteration on ``M = σI − L`` with
σ = 2·max weighted degree (Gershgorin ⇒ M ⪰ 0), the trivial constant
eigenvector deflated analytically.  One iteration = two supersteps:

- **matvec** (phase A): scatter streams the k orthonormal lanes along
  arcs (presence-masked); apply forms ``y = (σ − deg)·x + Σ w·x_nbr``
  and emits as metric columns the lane sums Σy_i (for deflation), the
  raw Gram ``G_ij = Σ y_i y_j`` and the projected block
  ``H_ij = Σ x_i y_j`` (the Rayleigh quotient matrix — k(k+1)/2 each,
  symmetrized).
- the driver deflates analytically (``G_defl = G − n·m mᵀ``,
  ``m = Σy/n``; likewise H — x lanes are already mean-free), Cholesky-
  factorizes ``G_defl = RᵀR`` and feeds ``M_mix = R⁻¹`` to phase B
  (the CG kernel's driver-fed pattern); Ritz values θ_i from
  ``eigh(H)`` give λ_i = σ − θ_i and the convergence signal.
- **axpy/mix** (phase B): self-rows only; apply sets
  ``x ← (y − m)·M_mix`` — orthonormal again, one Cholesky-QR step.

On convergence one extra **Ritz** superstep rotates the lanes by H's
eigenvector matrix so each column is an individual eigenvector (up to
sign), not just a basis of the invariant subspace.  Output rows
``(vid, e0..e{k-1})`` plus the eigenvalue estimates λ_1..λ_k of L
(ascending, λ_1 = algebraic connectivity — cross-checked against the
Fiedler kernel in tests).

Resume contract: the A/B phase flag and the driver-held recurrence
state (α/β, Gram factors) live on the kernel object, not in the
checkpointed vertex state — a killed solve RESTARTS from scratch
(solves are bounded and deterministic, so the restart is exact).
The mid-algorithm bitwise-resume contract covers the single-phase
kernels (PageRank / components / LPA / SSSP family).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.base import run_kernel
from igraph_ray.kernels.pagerank import PowerIterationFailedConvergence
from igraph_ray.stages.partition import GraphMeta
from igraph_ray.utils import hash_int64


@dataclass
class SpectralEmbedKernel:
    num_vertices: int
    num_parts: int
    sigma: float
    k: int = 4
    tol: float = 1.0e-9

    phase: str = "A"
    mix: np.ndarray | None = None  # k×k fed to phase B / Ritz
    mean: np.ndarray | None = None  # k fed to phase B
    theta_prev: np.ndarray | None = None
    lambdas: np.ndarray | None = None
    done: bool = False
    _ritz_pending: bool = False

    def __post_init__(self):
        k = self.k
        self.state_value_cols = {"degw": np.float64}
        for i in range(k):
            self.state_value_cols[f"x{i}"] = np.float64
            self.state_value_cols[f"y{i}"] = np.float64
        for i in range(k):
            self.state_value_cols[f"sy{i}"] = np.float64
        for i in range(k):
            for j in range(i, k):
                self.state_value_cols[f"g{i}_{j}"] = np.float64
                self.state_value_cols[f"h{i}_{j}"] = np.float64
        self.metric_cols = tuple(
            [f"sy{i}" for i in range(k)]
            + [
                f"{p}{i}_{j}"
                for p in ("g", "h")
                for i in range(k)
                for j in range(i, k)
            ]
        )
        fields = [("dst_part", pa.int32()), ("dst", pa.int64())]
        fields += [(f"c{i}", pa.float64()) for i in range(k)]
        fields += [("is_self", pa.int8()), ("degw", pa.float64())]
        fields += [(f"x{i}", pa.float64()) for i in range(k)]
        fields += [(f"y{i}", pa.float64()) for i in range(k)]
        self.message_schema = pa.schema(fields)

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        vids = csr.get("vids", np.empty(0, np.int64))
        n_local = len(vids)
        degw = np.zeros(n_local)
        if len(csr.get("src_pos", ())):
            degw = np.bincount(
                csr["src_pos"],
                weights=np.asarray(csr["w"], np.float64),
                minlength=n_local,
            ).astype(np.float64)
        out = {"degw": degw}
        for i in range(self.k):
            x0 = (
                hash_int64(vids * np.int64(self.k) + np.int64(i)).astype(
                    np.float64
                )
                / 2.0**64
            ) - 0.5
            out[f"x{i}"] = x0
            out[f"y{i}"] = np.zeros(n_local)
        for c in self.metric_cols:
            out[c] = np.zeros(n_local)
        return out

    def scatter(self, csr, sb) -> pa.Table:
        k = self.k
        n_self = len(sb.vids)
        cols: dict[str, pa.Array] = {}
        if self.phase == "A" and len(csr.get("src_pos", ())):
            w = np.asarray(csr["w"], np.float64).copy()
            absent = ~sb.present[csr["src_pos"]]
            if absent.any():
                w[absent] = 0.0
            contribs = []
            for i in range(k):
                x = sb.aligned[f"x{i}"]
                contribs.append(
                    np.add.reduceat(x[csr["src_pos"]] * w, csr["seg_start"])
                )
            n_msg = len(contribs[0])
            seg_dst = csr["seg_dst"]
            seg_dst_part = csr["seg_dst_part"]
        else:
            contribs = [np.empty(0, np.float64) for _ in range(k)]
            n_msg = 0
            seg_dst = np.empty(0, np.int64)
            seg_dst_part = np.empty(0, np.int32)

        cols["dst_part"] = pa.array(
            np.concatenate(
                [seg_dst_part, np.full(n_self, sb.part, np.int32)]
            ).astype(np.int32)
        )
        cols["dst"] = pa.array(np.concatenate([seg_dst, sb.vids]))
        for i in range(k):
            cols[f"c{i}"] = pa.array(
                np.concatenate([contribs[i], np.zeros(n_self)])
            )
        cols["is_self"] = pa.array(
            np.concatenate(
                [np.zeros(n_msg, np.int8), np.ones(n_self, np.int8)]
            )
        )
        cols["degw"] = pa.array(
            np.concatenate([np.zeros(n_msg), sb.values["degw"]])
        )
        for i in range(k):
            cols[f"x{i}"] = pa.array(
                np.concatenate([np.zeros(n_msg), sb.values[f"x{i}"]])
            )
            cols[f"y{i}"] = pa.array(
                np.concatenate([np.zeros(n_msg), sb.values[f"y{i}"]])
            )
        return pa.table(cols)

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        k = self.k
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        order = np.lexsort(
            (group.column("is_self").to_numpy(zero_copy_only=False), dst)
        )
        dst = dst[order]
        boundary = np.empty(len(dst), dtype=bool)
        if len(dst):
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(boundary)
        vids = dst[seg]

        def red(col: str) -> np.ndarray:
            v = group.column(col).to_numpy(zero_copy_only=False)[order]
            return np.add.reduceat(v, seg) if len(dst) else v

        degw = red("degw")
        X = np.stack([red(f"x{i}") for i in range(k)], axis=1)
        out: dict[str, pa.Array] = {
            "part": pa.array(np.full(len(vids), part, np.int32)),
            "vid": pa.array(vids),
            "degw": pa.array(degw),
        }
        zeros = np.zeros(len(vids))
        if self.phase == "A":
            Y = np.empty_like(X)
            for i in range(k):
                Y[:, i] = (self.sigma - degw) * X[:, i] + red(f"c{i}")
            for i in range(k):
                out[f"x{i}"] = pa.array(X[:, i])
                out[f"y{i}"] = pa.array(Y[:, i])
                out[f"sy{i}"] = pa.array(Y[:, i])
            for i in range(k):
                for j in range(i, k):
                    out[f"g{i}_{j}"] = pa.array(Y[:, i] * Y[:, j])
                    out[f"h{i}_{j}"] = pa.array(X[:, i] * Y[:, j])
        elif self.phase == "B":
            Y = np.stack([red(f"y{i}") for i in range(k)], axis=1)
            Xn = (Y - self.mean[None, :]) @ self.mix
            for i in range(k):
                out[f"x{i}"] = pa.array(Xn[:, i])
                out[f"y{i}"] = pa.array(zeros)
                out[f"sy{i}"] = pa.array(zeros)
            for i in range(k):
                for j in range(i, k):
                    out[f"g{i}_{j}"] = pa.array(zeros)
                    out[f"h{i}_{j}"] = pa.array(zeros)
        else:  # Ritz rotation
            Xn = X @ self.mix
            for i in range(k):
                out[f"x{i}"] = pa.array(Xn[:, i])
                out[f"y{i}"] = pa.array(zeros)
                out[f"sy{i}"] = pa.array(zeros)
            for i in range(k):
                for j in range(i, k):
                    out[f"g{i}_{j}"] = pa.array(zeros)
                    out[f"h{i}_{j}"] = pa.array(zeros)
        return pa.table(out)

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        k = self.k
        n = self.num_vertices
        if self.phase == "R":
            self.done = True
            return True
        if self.phase == "B":
            self.phase = "A"
            return False
        # after a matvec: close the recurrences
        sy = np.array([metrics[f"sy{i}"] for i in range(k)])
        G = np.zeros((k, k))
        H = np.zeros((k, k))
        for i in range(k):
            for j in range(i, k):
                G[i, j] = G[j, i] = metrics[f"g{i}_{j}"]
                H[i, j] = H[j, i] = metrics[f"h{i}_{j}"]
        m = sy / n
        Gd = G - n * np.outer(m, m)
        # x lanes are mean-free after the first B; H needs no
        # deflation then (Σx_i = 0 ⇒ Σx_i·mean_j term vanishes)
        theta, V = np.linalg.eigh((H + H.T) / 2.0)
        # ascending eigh → dominant (σ−λ smallest-λ) lanes last;
        # order lanes by DESCENDING θ so column 0 = λ₁ (Fiedler)
        theta = theta[::-1]
        V = V[:, ::-1]
        self.lambdas = self.sigma - theta
        stable = (
            self.theta_prev is not None
            and iteration > 2
            and np.max(np.abs(theta - self.theta_prev))
            <= self.tol * max(self.sigma, 1.0)
        )
        self.theta_prev = theta
        if stable:
            # one final Ritz rotation of the CURRENT orthonormal x
            self.mix = V
            self.phase = "R"
            return False
        # Cholesky-QR mix for phase B (regularize the tail slightly —
        # lanes start random and Gd is near-singular only at k > n)
        jitter = 1e-300
        for _ in range(60):
            try:
                R = np.linalg.cholesky(
                    Gd + jitter * np.eye(k)
                ).T
                break
            except np.linalg.LinAlgError:
                jitter = max(jitter * 1e10, 1e-12 * np.trace(Gd) / k)
        self.mix = np.linalg.inv(R)
        self.mean = m
        self.phase = "B"
        return False


def spectral_embedding(
    graph: GraphMeta,
    num_vertices: int,
    k: int = 4,
    tol: float = 1.0e-9,
    max_iter: int = 2000,
):
    """Returns ``(state Dataset with e0..e{k-1}, lambdas)`` — the k
    smallest nontrivial Laplacian eigenpairs of a CONNECTED graph
    (λ ascending; e columns L2-normalized over the graph, sign
    unspecified)."""
    from igraph_ray.stages.partition import load_csr

    # σ = 2 · max weighted degree (Gershgorin) — same bound the
    # Fiedler kernel uses; derive from the CSR meta cheaply
    max_deg = 0.0
    for part in range(graph.num_parts):
        csr = load_csr(graph, part)
        if len(csr.get("src_pos", ())):
            d = np.bincount(
                csr["src_pos"], weights=np.asarray(csr["w"], np.float64)
            )
            if len(d):
                max_deg = max(max_deg, float(d.max()))
    sigma = 2.0 * max(max_deg, 1.0)
    kernel = SpectralEmbedKernel(
        num_vertices=num_vertices,
        num_parts=graph.num_parts,
        sigma=sigma,
        k=k,
        tol=tol,
    )
    run = run_kernel(kernel, graph, max_iter=max_iter)
    if not kernel.done:
        raise PowerIterationFailedConvergence(
            f"spectral_embedding failed to converge in {max_iter} supersteps"
        )

    def project(batch: pa.Table) -> pa.Table:
        cols = {"vid": batch.column("vid")}
        for i in range(k):
            cols[f"e{i}"] = batch.column(f"x{i}")
        return pa.table(cols)

    emb = run.state.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
    return emb, np.asarray(kernel.lambdas[:k])
