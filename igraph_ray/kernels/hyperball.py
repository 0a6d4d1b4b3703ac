"""HyperBall — approximate neighborhood function / effective diameter
(Boldi & Vigna, "HyperBall: a fast and scalable approach to the
neighbourhood function", 2013; igraph surface: the scale path for
``igraph_eccentricity`` / average-distance statistics on graphs where
exact all-pairs BFS is impossible).

Every vertex carries a 64-register HyperLogLog counter of the ball
``B(v, t) = {u : d(v, u) <= t}``.  One chassis iteration per radius:
``regs(v) ← byte-wise max(regs(v), regs(u) ∀ u ∈ N(v))`` — max is
idempotent/associative, so messages pre-combine per (src-partition,
dst) with ONE ``np.maximum.reduceat`` over the byte matrix, exactly
like the min-combine of SSSP.  Per-iteration metrics carry the summed
ball estimates, so the driver reads the whole neighborhood function
``N(t) = Σ_v |B(v, t)|`` out of ``metrics_history`` for free — no
extra pass.  Convergence: no register changed (t reached the
diameter).

State layout: 64 uint8 registers packed into eight int64 state
columns (``r0..r7``) — the chassis state/message schema is plain
int64 columns, and numpy views them back as a (n, 64) byte matrix
zero-copy.  At p=6 the counters give ~13% rse per ball; the SUM over
vertices concentrates much tighter.  Deterministic: splitmix64 vertex
hashes, so registers (not just estimates) are bitwise reproducible —
the pytest oracle replays the identical algorithm in local numpy and
compares registers exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from igraph_ray.kernels.base import KernelRun, run_kernel
from igraph_ray.stages.partition import GraphMeta
from igraph_ray.utils import hash_int64

M = 64  # registers per vertex (p = 6)
_P = 6
_COLS = [f"r{i}" for i in range(8)]

MSG_SCHEMA = pa.schema(
    [("dst_part", pa.int32()), ("dst", pa.int64())]
    + [(c, pa.int64()) for c in _COLS]
    + [("est", pa.float64()), ("chg", pa.int64())]
)


def init_registers(vids: np.ndarray) -> np.ndarray:
    """(n, 64) uint8 register matrix with each vertex's own hash
    inserted: register j = h & 63, value = leading-rank of the
    remaining 58 bits (+1)."""
    h = hash_int64(vids.astype(np.int64))
    j = (h & np.uint64(M - 1)).astype(np.int64)
    rest = h >> np.uint64(_P)
    # rank = number of leading zeros in the 58-bit field + 1
    width = 64 - _P
    rank = np.ones(len(vids), np.uint8)
    bits = rest
    # leading zeros via float log2 would be inexact; do it by loop over
    # the 58 bit positions' highest set bit (vectorized bit scan)
    nz = bits != 0
    highest = np.zeros(len(vids), np.int64)
    b = bits.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = b >= (np.uint64(1) << np.uint64(shift))
        highest[m] += shift
        b[m] >>= np.uint64(shift)
    rank = np.where(nz, width - highest, width + 1).astype(np.uint8)
    regs = np.zeros((len(vids), M), np.uint8)
    regs[np.arange(len(vids)), j] = rank
    return regs


_ALPHA_64 = 0.709  # standard HLL alpha for m = 64


def estimate(regs: np.ndarray) -> np.ndarray:
    """Vectorized HLL estimate per row of an (n, 64) register matrix,
    with the small-range (linear counting) correction."""
    pow2 = np.power(2.0, -regs.astype(np.float64))
    raw = _ALPHA_64 * M * M / pow2.sum(axis=1)
    zeros = (regs == 0).sum(axis=1)
    small = raw <= 2.5 * M
    lin = np.where(zeros > 0, M * np.log(M / np.maximum(zeros, 1)), raw)
    return np.where(small & (zeros > 0), lin, raw)


def _pack(regs: np.ndarray) -> list[np.ndarray]:
    """(n, 64) uint8 → eight int64 columns (zero-copy views)."""
    flat = np.ascontiguousarray(regs).view(np.int64).reshape(len(regs), 8)
    return [flat[:, i].copy() for i in range(8)]


def _unpack(cols: list[np.ndarray]) -> np.ndarray:
    """Eight int64 arrays → (n, 64) uint8 matrix."""
    n = len(cols[0])
    stacked = np.empty((n, 8), np.int64)
    for i, c in enumerate(cols):
        stacked[:, i] = c
    return stacked.view(np.uint8).reshape(n, M)


@dataclass
class HyperBallKernel:
    num_parts: int

    state_value_cols: dict = field(
        default_factory=lambda: {
            **{c: np.int64 for c in _COLS},
            "est": np.float64,
            "chg": np.int64,
        }
    )
    metric_cols: tuple = ("est", "chg")
    message_schema: pa.Schema = MSG_SCHEMA

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        vids = csr.get("vids", np.empty(0, np.int64))
        regs = init_registers(vids)
        cols = _pack(regs)
        return {
            **{c: cols[i] for i, c in enumerate(_COLS)},
            "est": estimate(regs),
            "chg": np.ones(len(vids), np.int64),
        }

    def scatter(self, csr, sb) -> pa.Table:
        regs = _unpack([sb.aligned[c] for c in _COLS])
        if len(csr.get("src_pos", ())):
            vals = regs[csr["src_pos"]]
            comb = np.maximum.reduceat(vals, csr["seg_start"], axis=0)
            seg_dst = csr["seg_dst"]
            seg_dst_part = csr["seg_dst_part"]
        else:
            comb = np.zeros((0, M), np.uint8)
            seg_dst = np.empty(0, np.int64)
            seg_dst_part = np.empty(0, np.int32)
        n_msg = len(seg_dst)
        n_self = len(sb.vids)
        own = _unpack([sb.values[c] for c in _COLS])
        all_regs = np.concatenate([comb, own], axis=0)
        cols = _pack(all_regs)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate(
                        [seg_dst_part, np.full(n_self, sb.part, np.int32)]
                    ).astype(np.int32)
                ),
                "dst": pa.array(np.concatenate([seg_dst, sb.vids])),
                **{c: pa.array(cols[i]) for i, c in enumerate(_COLS)},
                "est": pa.array(np.zeros(n_msg + n_self)),
                "chg": pa.array(
                    np.concatenate(
                        [np.zeros(n_msg, np.int64), np.ones(n_self, np.int64)]
                    )
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        chg = group.column("chg").to_numpy(zero_copy_only=False)
        regs = _unpack(
            [
                group.column(c).to_numpy(zero_copy_only=False)
                for c in _COLS
            ]
        )
        order = np.argsort(dst, kind="stable")
        dst, chg, regs = dst[order], chg[order], regs[order]
        boundary = np.empty(len(dst), dtype=bool)
        if len(dst):
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(boundary)
        vids = dst[seg]
        merged = np.maximum.reduceat(regs, seg, axis=0)
        # the self row (chg=1 marker) carried the incumbent registers;
        # changed iff the merge strictly grew any register
        own_mask = chg == 1
        own = regs[own_mask]
        own_vid_order = np.argsort(dst[own_mask], kind="stable")
        own = own[own_vid_order]
        changed = (merged != own).any(axis=1).astype(np.int64)
        cols = _pack(merged)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                **{c: pa.array(cols[i]) for i, c in enumerate(_COLS)},
                "est": pa.array(estimate(merged)),
                "chg": pa.array(changed),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        return iteration > 0 and metrics["chg"] == 0.0


def hyperball(
    graph: GraphMeta, max_iter: int = 200
) -> tuple[KernelRun, list[float], float]:
    """Run HyperBall to the diameter.  Returns ``(run, nf, eff_diam)``:

    - ``run.state`` rows ``(vid, r0..r7, est, chg)`` — ``est`` is each
      vertex's final ball (≈ its component size);
    - ``nf[t]`` = estimated neighborhood function Σ_v |B(v, t)| for
      t = 0..T (read from the per-iteration metrics — no extra pass);
    - ``eff_diam`` = 90% effective diameter (linear interpolation on
      the nf curve).
    """
    kernel = HyperBallKernel(num_parts=graph.num_parts)
    run = run_kernel(kernel, graph, max_iter=max_iter)
    if not run.converged:
        raise RuntimeError(f"hyperball did not converge in {max_iter} iters")
    # metrics_history[i] is N(t = i + 1); N(0) = num vertices (every
    # ball starts as {v}) is prepended for the t = 0 point
    nf = [float(graph.num_vertices)] + [
        m["est"] for m in run.metrics_history
    ]
    # drop the trailing no-change iteration's duplicate point
    while len(nf) >= 2 and nf[-1] == nf[-2]:
        nf.pop()
    target = 0.9 * nf[-1]
    eff = float(len(nf) - 1)
    for t in range(len(nf)):
        if nf[t] >= target:
            if t == 0:
                eff = 0.0
            else:
                span = nf[t] - nf[t - 1]
                frac = (target - nf[t - 1]) / span if span > 0 else 0.0
                eff = (t - 1) + frac
            break
    return run, nf, eff
