"""Laplacian linear solves on the chassis → current-flow closeness.

Current-flow closeness centrality (= information centrality;
``nx.current_flow_closeness_centrality``, Brandes–Fleischer STACS 2005
/ Stephenson–Zelen 1989) for a connected undirected graph:

    CFC(s) = (n − 1) / Σ_t r_eff(s, t)
           = (n − 1) / (n · L⁺_ss + tr L⁺)

(the identity follows from r_eff(s,t) = L⁺_ss + L⁺_tt − 2·L⁺_st and
Σ_t L⁺_st = 0), so only the DIAGONAL of the Laplacian pseudo-inverse
is needed.  Column s of L⁺ solves L·x = e_s − 𝟙/n, which this module
solves by **conjugate gradients run as a chassis kernel** — k
right-hand-side lanes per run (the multi-pivot BFS pattern), every CG
step = exactly two scatter→shuffle→apply supersteps:

- phase A (matvec): scatter streams the k ``p`` lanes along arcs;
  apply forms q = L·p = degw·p − Σ w·p_nbr and emits the per-lane
  dot-product partials pᵀq, rᵀq, qᵀq, rᵀr as metric columns;
- the driver closes the recurrences analytically — α = rᵀr/pᵀq,
  ‖r_new‖² = rᵀr − 2α·rᵀq + α²·qᵀq, β = ‖r_new‖²/rᵀr — and feeds
  (α, β) to phase B (the kernel object re-pickles each superstep, the
  eigenvector/VoteRank driver-fed pattern);
- phase B (axpy): no arc traffic (self rows only); apply updates
  x += α·p, r −= α·q, p = r + β·p.

CG iterates stay ⊥ 𝟙 automatically (b ⊥ 𝟙 and L𝟙 = 0), so the
pseudo-inverse solution needs no deflation.  Exact all-vertex CFC runs
⌈n/k⌉ solves — the same all-pivots contract as exact closeness
(`multibfs`); per-solve state is 4k+1 float columns.

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
from igraph_ray.stages.partition import GraphMeta


def _lane_cols(k: int) -> list[str]:
    out = []
    for i in range(k):
        out += [f"x{i}", f"r{i}", f"p{i}", f"q{i}"]
    return out


@dataclass
class CGLaplacianKernel:
    """k-lane CG for L·x_i = e_{pivot_i} − 𝟙/n."""

    num_vertices: int
    num_parts: int
    pivots: np.ndarray  # k pivot vids
    tol: float = 1.0e-10

    phase: str = "A"
    alpha: np.ndarray | None = None
    beta: np.ndarray | None = None
    done: bool = False

    def __post_init__(self):
        k = len(self.pivots)
        self.k = k
        self.state_value_cols = {"degw": np.float64}
        for c in _lane_cols(k):
            self.state_value_cols[c] = np.float64
        for i in range(k):
            for d in ("pq", "rq", "qq", "rr"):
                self.state_value_cols[f"{d}{i}"] = np.float64
        self.metric_cols = tuple(
            f"{d}{i}"
            for i in range(k)
            for d in ("pq", "rq", "qq", "rr")
        )
        fields = [("dst_part", pa.int32()), ("dst", pa.int64())]
        fields += [(f"c{i}", pa.float64()) for i in range(k)]
        fields += [("is_self", pa.int8())]
        fields += [
            (c, pa.float64())
            for c in ["degw"] + _lane_cols(k)
        ]
        self.message_schema = pa.schema(fields)

    # -- state ---------------------------------------------------------
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
        inv_n = 1.0 / self.num_vertices
        for i in range(self.k):
            b = np.full(n_local, -inv_n)
            hit = np.searchsorted(vids, self.pivots[i])
            if hit < n_local and n_local and vids[hit] == self.pivots[i]:
                b[hit] += 1.0
            out[f"x{i}"] = np.zeros(n_local)
            out[f"r{i}"] = b.copy()
            out[f"p{i}"] = b.copy()
            out[f"q{i}"] = np.zeros(n_local)
            for d in ("pq", "rq", "qq"):
                out[f"{d}{i}"] = np.zeros(n_local)
            out[f"rr{i}"] = b * b
        return out

    # -- scatter -------------------------------------------------------
    def scatter(self, csr, sb) -> pa.Table:
        k = self.k
        n_self = len(sb.vids)
        cols: dict[str, pa.Array] = {}
        if self.phase == "A" and len(csr.get("src_pos", ())):
            w = np.asarray(csr["w"], np.float64)
            contribs = []
            for i in range(k):
                p = sb.aligned[f"p{i}"]  # zero-filled absent → neutral
                vals = p[csr["src_pos"]] * w
                contribs.append(np.add.reduceat(vals, csr["seg_start"]))
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
        for c in ["degw"] + _lane_cols(k):
            cols[c] = pa.array(
                np.concatenate([np.zeros(n_msg), sb.values[c]])
            )
        return pa.table(cols)

    # -- apply ---------------------------------------------------------
    def apply(self, group: pa.Table, part: int) -> pa.Table:
        k = self.k
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        is_self = group.column("is_self").to_numpy(zero_copy_only=False)

        order = np.lexsort((is_self, dst))
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

        out: dict[str, pa.Array] = {
            "part": pa.array(np.full(len(vids), part, np.int32)),
            "vid": pa.array(vids),
        }
        degw = red("degw")
        out["degw"] = pa.array(degw)
        for i in range(k):
            x = red(f"x{i}")
            r = red(f"r{i}")
            p = red(f"p{i}")
            if self.phase == "A":
                q = degw * p - red(f"c{i}")
                out[f"x{i}"] = pa.array(x)
                out[f"r{i}"] = pa.array(r)
                out[f"p{i}"] = pa.array(p)
                out[f"q{i}"] = pa.array(q)
                out[f"pq{i}"] = pa.array(p * q)
                out[f"rq{i}"] = pa.array(r * q)
                out[f"qq{i}"] = pa.array(q * q)
                out[f"rr{i}"] = pa.array(r * r)
            else:
                q = red(f"q{i}")
                a = float(self.alpha[i])
                bta = float(self.beta[i])
                x2 = x + a * p
                r2 = r - a * q
                p2 = r2 + bta * p
                out[f"x{i}"] = pa.array(x2)
                out[f"r{i}"] = pa.array(r2)
                out[f"p{i}"] = pa.array(p2)
                out[f"q{i}"] = pa.array(q)
                out[f"pq{i}"] = pa.array(np.zeros(len(vids)))
                out[f"rq{i}"] = pa.array(np.zeros(len(vids)))
                out[f"qq{i}"] = pa.array(np.zeros(len(vids)))
                out[f"rr{i}"] = pa.array(r2 * r2)
        return pa.table(out)

    # -- driver --------------------------------------------------------
    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        k = self.k
        bb = 1.0 - 1.0 / self.num_vertices  # ‖b‖² per lane
        if self.phase == "A":
            alpha = np.zeros(k)
            beta = np.zeros(k)
            live = False
            for i in range(k):
                rr = metrics[f"rr{i}"]
                pq = metrics[f"pq{i}"]
                if rr > (self.tol**2) * bb and pq > 0:
                    a = rr / pq
                    rr_new = rr - 2 * a * metrics[f"rq{i}"] + a * a * metrics[f"qq{i}"]
                    alpha[i] = a
                    beta[i] = max(rr_new, 0.0) / rr
                    live = True
            self.alpha, self.beta = alpha, beta
            self.phase = "B"
            if not live:
                self.done = True
                return True
            return False
        self.phase = "A"
        done = all(
            metrics[f"rr{i}"] <= (self.tol**2) * bb for i in range(k)
        )
        self.done = done
        return done


def solve_laplacian_columns(
    graph: GraphMeta,
    num_vertices: int,
    pivots,
    tol: float = 1.0e-10,
    max_iter: int | None = None,
):
    """Solve L·x = e_s − 𝟙/n for each pivot s (k lanes, one run).
    Returns (state Dataset with x0..x{k-1}, pivots array)."""
    pivots = np.asarray(pivots, np.int64)
    kernel = CGLaplacianKernel(
        num_vertices=num_vertices,
        num_parts=graph.num_parts,
        pivots=pivots,
        tol=tol,
    )
    supersteps = (
        2 * (max_iter if max_iter is not None else 2 * num_vertices + 10)
    )
    run = run_kernel(kernel, graph, max_iter=supersteps)
    if not kernel.done:
        raise RuntimeError(
            f"CG failed to converge within {supersteps} supersteps "
            "(is the graph connected?)"
        )
    return run.state, pivots


def current_flow_closeness(
    graph: GraphMeta,
    num_vertices: int,
    lanes: int = 8,
    tol: float = 1.0e-10,
) -> dict[int, float]:
    """Exact current-flow closeness for every vertex of a CONNECTED
    graph: ⌈n/lanes⌉ CG runs recover diag(L⁺), then
    CFC(s) = (n−1)/(n·L⁺_ss + tr L⁺)."""
    diag: dict[int, float] = {}
    all_vids = np.arange(num_vertices, dtype=np.int64)
    for lo in range(0, num_vertices, lanes):
        piv = all_vids[lo : lo + lanes]
        state, piv = solve_laplacian_columns(
            graph, num_vertices, piv, tol=tol
        )
        piv_sorted = np.sort(piv)

        def keep_pivots(batch: pa.Table, _p=piv_sorted) -> pa.Table:
            v = batch.column("vid").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(_p, v)
            pos_c = np.clip(pos, 0, len(_p) - 1)
            return batch.filter(pa.array(_p[pos_c] == v))

        rows = pa.concat_tables(
            state.select_columns(
                ["vid"] + [f"x{i}" for i in range(len(piv))]
            )
            .map_batches(
                keep_pivots, batch_format="pyarrow", zero_copy_batch=True
            )
            .iter_batches(batch_format="pyarrow", batch_size=None)
        )
        vid_arr = rows.column("vid").to_numpy(zero_copy_only=False)
        for i, s in enumerate(piv.tolist()):
            at = np.flatnonzero(vid_arr == s)
            diag[int(s)] = float(
                rows.column(f"x{i}").to_numpy(zero_copy_only=False)[
                    at[0]
                ]
            )
    trace = sum(diag.values())
    n = num_vertices
    return {
        s: (n - 1.0) / (n * d + trace) for s, d in diag.items()
    }


def effective_resistance_edges(
    graph: GraphMeta,
    num_vertices: int,
    pairs: ray.data.Dataset,
    num_edges: int | None = None,
    lanes: int = 8,
    tol: float = 1.0e-10,
) -> pa.Table:
    """Effective resistance (and commute time = 2m·r_eff, Chandra et
    al. 1989) for every edge of a CONNECTED graph:
    r_eff(u,v) = L⁺_uu + L⁺_vv − 2·L⁺_uv — the spanning-edge-centrality
    weight (for unit weights, r_eff(e) = Pr[e ∈ uniform spanning
    tree], Kirchhoff).

    Reuses the k-lane chassis CG: ⌈n/lanes⌉ solves recover every
    pseudo-inverse column; each solve's state is reduced to the O(n·k)
    entries the edge list touches (an edge (u,v) reads column u at
    rows u, v).  Exact all-columns contract, same as
    ``current_flow_closeness``.  Returns an Arrow table
    ``(src, dst, r_eff, commute_time)`` sorted by (src, dst).
    """
    ptbl = pa.concat_tables(
        pairs.select_columns(["src", "dst"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    es = ptbl.column("src").to_numpy(zero_copy_only=False)
    ed = ptbl.column("dst").to_numpy(zero_copy_only=False)
    m = num_edges if num_edges is not None else len(es)

    # L⁺ entries needed: diag everywhere + (u,v) per edge
    diag = np.zeros(num_vertices)
    cross = np.zeros(len(es))
    all_vids = np.arange(num_vertices, dtype=np.int64)
    for lo in range(0, num_vertices, lanes):
        piv = all_vids[lo : lo + lanes]
        state, piv = solve_laplacian_columns(
            graph, num_vertices, piv, tol=tol
        )
        tbl = pa.concat_tables(
            state.select_columns(
                ["vid"] + [f"x{i}" for i in range(len(piv))]
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        ).sort_by("vid")
        vid_arr = tbl.column("vid").to_numpy(zero_copy_only=False)
        for i, s in enumerate(piv.tolist()):
            col = tbl.column(f"x{i}").to_numpy(zero_copy_only=False)
            # vid_arr is sorted 0..n-1 (dense ids)
            diag[s] = col[np.searchsorted(vid_arr, s)]
            # cross term read from the SRC column only (L⁺ symmetric:
            # column v's u-row would be the same value — reading both
            # would double-count)
            hit_s = es == s
            if hit_s.any():
                cross[hit_s] += col[
                    np.searchsorted(vid_arr, ed[hit_s])
                ]
    r_eff = diag[es] + diag[ed] - 2.0 * cross
    order = np.lexsort((ed, es))
    return pa.table(
        {
            "src": pa.array(es[order]),
            "dst": pa.array(ed[order]),
            "r_eff": pa.array(r_eff[order]),
            "commute_time": pa.array(2.0 * m * r_eff[order]),
        }
    )
