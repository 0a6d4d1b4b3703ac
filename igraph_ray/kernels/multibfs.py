"""Multi-pivot BFS: k simultaneous hop-distance lanes in ONE chassis
run, and the closeness / harmonic centralities built on it.

Covers igraph's ``igraph_closeness`` / ``igraph_harmonic_centrality``
surface (``Graph.closeness`` / ``Graph.harmonic_centrality``), matching
``networkx.closeness_centrality`` (wf_improved) and
``networkx.harmonic_centrality`` exactly when every vertex is a pivot,
and the Eppstein–Wang style pivot-sampled estimator otherwise.

Why a dedicated kernel instead of k ``shortest_paths`` runs: each
chassis run pays a fixed per-iteration Ray Data cost (scatter stage +
message shuffle + materialize), so k separate BFS runs cost
k × diameter supersteps.  Here the per-vertex state is a k-wide
distance matrix and one run costs diameter supersteps total — messages
for all lanes ride the same shuffle.  This is the shape that survives
on a real cluster: lane count k bounds the state/message width
(k × 8 bytes per vertex/message row), so memory scales as k·V/P per
partition, independent of the number of vertices sampled against.

Frontier filtering happens per *arc*: only arcs whose source vertex
improved any lane since the last superstep are expanded, and the
per-(src-partition, dst) combine runs ``np.minimum.reduceat`` over the
lane matrix in one vectorized pass (axis=0) — no per-lane Python loop.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.base import KernelRun, run_kernel
from igraph_ray.stages.partition import GraphMeta
from igraph_ray.utils import hash_int64

_INF = np.inf


@dataclass
class MultiBFSKernel:
    """BFS / min-plus relaxation from k pivots at once; lane i holds
    distances from ``pivots[i]`` — hop counts by default, weighted
    shortest-path distances with ``weighted=True`` (distributed
    Bellman-Ford per lane; exact Dijkstra distances at the converged
    fixed point on non-negative weights, like ``kernels/sssp.py``)."""

    num_parts: int
    pivots: np.ndarray  # sorted pivot vids, one BFS lane each
    weighted: bool = False

    def __post_init__(self) -> None:
        k = len(self.pivots)
        self.state_value_cols = {f"d{i}": np.float64 for i in range(k)}
        self.state_value_cols["changed"] = np.int64
        self.metric_cols = ("changed",)
        self.message_schema = pa.schema(
            [("dst_part", pa.int32()), ("dst", pa.int64()), ("is_self", pa.int8())]
            + [(f"d{i}", pa.float64()) for i in range(k)]
        )

    @property
    def k(self) -> int:
        return len(self.pivots)

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        vids = csr.get("vids", np.empty(0, np.int64))
        n = len(vids)
        state: dict[str, np.ndarray] = {}
        changed = np.zeros(n, np.int64)
        for i, p in enumerate(self.pivots):
            d = np.full(n, _INF, np.float64)
            pos = np.searchsorted(vids, p)
            if pos < n and vids[pos] == p:
                d[pos] = 0.0
                changed[pos] = 1
            state[f"d{i}"] = d
        state["changed"] = changed
        return state

    def scatter(self, csr, sb) -> pa.Table:
        k = self.k
        changed = sb.aligned["changed"].astype(bool) & sb.present

        src_pos = csr.get("src_pos", np.empty(0, np.int64))
        m_part = np.empty(0, np.int32)
        m_dst = np.empty(0, np.int64)
        m_vals = np.empty((0, k), np.float64)
        if len(src_pos):
            arc_live = changed[src_pos]
            kept = np.flatnonzero(arc_live)
            if len(kept):
                # lanes stacked into an (n_aligned, k) matrix once;
                # per-(seg,dst) combine is one reduceat along axis 0
                dmat = np.stack(
                    [sb.aligned[f"d{i}"] for i in range(k)], axis=1
                )
                step = (
                    np.asarray(csr["w"], np.float64)[kept][:, None]
                    if self.weighted
                    else 1.0
                )
                vals = dmat[src_pos[kept]] + step
                # kept is ascending → its seg ids are non-decreasing;
                # rebuild combine boundaries on the filtered arcs
                seg_id = (
                    np.searchsorted(csr["seg_start"], kept, side="right") - 1
                )
                boundary = np.empty(len(kept), dtype=bool)
                boundary[0] = True
                boundary[1:] = seg_id[1:] != seg_id[:-1]
                starts = np.flatnonzero(boundary)
                m_vals = np.minimum.reduceat(vals, starts, axis=0)
                segs = seg_id[starts]
                m_dst = csr["seg_dst"][segs]
                m_part = csr["seg_dst_part"][segs].astype(np.int32)

        n_self = len(sb.vids)
        cols = {
            "dst_part": pa.array(
                np.concatenate([m_part, np.full(n_self, sb.part, np.int32)])
            ),
            "dst": pa.array(np.concatenate([m_dst, sb.vids])),
            "is_self": pa.array(
                np.concatenate(
                    [np.zeros(len(m_dst), np.int8), np.ones(n_self, np.int8)]
                )
            ),
        }
        for i in range(k):
            cols[f"d{i}"] = pa.array(
                np.concatenate([m_vals[:, i], sb.values[f"d{i}"]])
            )
        return pa.table(cols)

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        k = self.k
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        is_self = group.column("is_self").to_numpy(zero_copy_only=False)
        vals = np.stack(
            [
                group.column(f"d{i}").to_numpy(zero_copy_only=False)
                for i in range(k)
            ],
            axis=1,
        )
        order = np.argsort(dst, kind="stable")
        dst, is_self, vals = dst[order], is_self[order], vals[order]

        boundary = np.empty(len(dst), dtype=bool)
        if len(dst):
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(boundary)
        vids = dst[seg]
        new = np.minimum.reduceat(vals, seg, axis=0)
        # exactly one self row per vid (each present vid's own slice
        # emits it); its lanes are the pre-iteration distances
        self_rows = np.flatnonzero(is_self == 1)
        old = np.full_like(new, _INF)
        old_seg = np.searchsorted(vids, dst[self_rows])
        old[old_seg] = vals[self_rows]

        changed = (new < old).any(axis=1).astype(np.int64)
        cols = {
            "part": pa.array(np.full(len(vids), part, np.int32)),
            "vid": pa.array(vids),
        }
        for i in range(k):
            cols[f"d{i}"] = pa.array(new[:, i])
        cols["changed"] = pa.array(changed)
        return pa.table(cols)

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        return metrics["changed"] == 0.0


def sample_pivots(vids: np.ndarray, k: int | None) -> np.ndarray:
    """Deterministic pivot sample: the k vids with the smallest
    splitmix64 hash (same estimator-sampling rule as betweenness)."""
    if k is None or k >= len(vids):
        return np.sort(vids)
    order = np.argsort(hash_int64(vids), kind="stable")
    return np.sort(vids[order[:k]])


def pivot_distances(
    graph: GraphMeta,
    pivots: np.ndarray,
    max_iter: int = 10_000,
    weighted: bool = False,
) -> KernelRun:
    """One chassis run; final state rows are
    ``(part, vid, d0..d{k-1}, changed)`` with ``d{i}`` = hop distance
    from ``pivots[i]`` (+inf when unreachable)."""
    pivots = np.unique(np.asarray(pivots, np.int64))
    if len(pivots) == 0:
        raise ValueError("pivot_distances requires at least one pivot")
    kernel = MultiBFSKernel(
        num_parts=graph.num_parts, pivots=pivots, weighted=weighted
    )
    run = run_kernel(kernel, graph, max_iter=max_iter)
    if not run.converged:
        raise RuntimeError("pivot_distances did not converge")
    return run


def _centrality(
    graph: GraphMeta,
    n_vertices: int,
    pivots: np.ndarray,
    mode: str,
    wf_improved: bool = True,
    weighted: bool = False,
) -> ray.data.Dataset:
    if weighted:
        # d == 0 must mean "self lane" in finish() below — zero-weight
        # edges would alias a real neighbor distance to 0
        from igraph_ray.kernels.weighted_brandes import (
            validate_positive_weights,
        )

        validate_positive_weights(graph)
    run = pivot_distances(graph, pivots, weighted=weighted)
    k = len(pivots)
    n = n_vertices
    pivot_set = np.asarray(pivots, np.int64)

    def finish(batch: pa.Table) -> pa.Table:
        vid = batch.column("vid").to_numpy(zero_copy_only=False)
        dmat = np.stack(
            [
                batch.column(f"d{i}").to_numpy(zero_copy_only=False)
                for i in range(k)
            ],
            axis=1,
        )
        # exclude the self lane (d == 0 exactly at the pivot itself)
        finite = np.isfinite(dmat) & (dmat > 0)
        # per-vertex effective sample size: pivots other than v itself
        pos = np.searchsorted(pivot_set, vid)
        pos_c = np.clip(pos, 0, max(0, len(pivot_set) - 1))
        is_pivot = (len(pivot_set) > 0) & (pivot_set[pos_c] == vid)
        k_eff = np.where(is_pivot, k - 1, k).astype(np.float64)
        # scale = (n-1)/k_eff: with all-vertex pivots k_eff = n-1 and
        # the estimator reduces to the exact sum (networkx parity)
        with np.errstate(divide="ignore", invalid="ignore"):
            scale = np.where(k_eff > 0, (n - 1) / k_eff, 0.0)
            if mode == "harmonic":
                contrib = np.where(finite, 1.0 / np.where(finite, dmat, 1.0), 0.0)
                # left-to-right chain over lanes (pivot-vid order), NOT
                # np.sum's pairwise tree: a defined IEEE order lets the
                # SQL twin replay the sum bitwise (lane i joins via
                # ROW_NUMBER over the pivot draw); k additions per row,
                # vectorized across vertices
                acc = np.zeros(len(vid), np.float64)
                for i in range(k):
                    acc = acc + contrib[:, i]
                out = acc * scale
            else:  # closeness
                dsum = np.where(finite, dmat, 0.0).sum(axis=1) * scale
                reach = finite.sum(axis=1) * scale  # est. |reachable|-1
                out = np.where(dsum > 0, reach / dsum, 0.0)
                if wf_improved and n > 1:
                    out *= reach / (n - 1)
        return pa.table(
            {
                "vid": batch.column("vid"),
                mode: pa.array(out.astype(np.float64)),
            }
        )

    return run.state.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def harmonic_centrality(
    graph: GraphMeta,
    n_vertices: int,
    k: int | None = None,
    pivots: np.ndarray | list[int] | None = None,
    weighted: bool = False,
) -> ray.data.Dataset:
    """Rows ``(vid, harmonic)``.  ``harmonic(v) = Σ_{u≠v} 1/d(u, v)``
    (``nx.harmonic_centrality``) — exact when pivots cover all
    vertices, else the (n-1)/k-scaled pivot estimate.
    ``weighted=True`` uses edge weights as distances
    (``nx.harmonic_centrality(G, distance=...)``)."""
    if pivots is None:
        from igraph_ray.kernels.betweenness import _all_vids

        pivots = sample_pivots(_all_vids(graph), k)
    return _centrality(
        graph,
        n_vertices,
        np.asarray(pivots, np.int64),
        "harmonic",
        weighted=weighted,
    )


def closeness_centrality(
    graph: GraphMeta,
    n_vertices: int,
    k: int | None = None,
    pivots: np.ndarray | list[int] | None = None,
    wf_improved: bool = True,
    weighted: bool = False,
) -> ray.data.Dataset:
    """Rows ``(vid, closeness)`` matching ``nx.closeness_centrality``
    (``wf_improved=True`` default: (r-1)/Σd · (r-1)/(n-1) within each
    component) when pivots cover all vertices.  ``weighted=True`` uses
    edge weights as distances
    (``nx.closeness_centrality(G, distance=...)``)."""
    if pivots is None:
        from igraph_ray.kernels.betweenness import _all_vids

        pivots = sample_pivots(_all_vids(graph), k)
    return _centrality(
        graph,
        n_vertices,
        np.asarray(pivots, np.int64),
        "closeness",
        wf_improved=wf_improved,
        weighted=weighted,
    )


def eccentricity(
    graph: GraphMeta,
    pivots: np.ndarray | list[int],
    weighted: bool = False,
) -> ray.data.Dataset:
    """Rows ``(vid, eccentricity)`` — max finite hop distance from any
    pivot (undirected symmetry: d(p,v) = d(v,p), so with pivots = all
    vertices this is exact ``igraph_eccentricity`` / nx.eccentricity
    within each component; with sampled pivots it is the standard
    lower-bound estimate).  Isolated vertices get 0.  With
    ``weighted=True`` distances are integer edge-weight sums (exact in
    float64 below 2**53), matching ``nx.eccentricity(weight=...)``."""
    run = pivot_distances(
        graph, np.asarray(pivots, np.int64), weighted=weighted
    )
    k = len(np.unique(np.asarray(pivots, np.int64)))

    def finish(batch: pa.Table) -> pa.Table:
        dmat = np.stack(
            [
                batch.column(f"d{i}").to_numpy(zero_copy_only=False)
                for i in range(k)
            ],
            axis=1,
        )
        ecc = np.where(np.isfinite(dmat), dmat, -np.inf).max(axis=1)
        ecc = np.where(np.isfinite(ecc), ecc, 0.0)
        return pa.table(
            {
                "vid": batch.column("vid"),
                "eccentricity": pa.array(ecc.astype(np.int64)),
            }
        )

    return run.state.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def diameter_radius(ecc: ray.data.Dataset) -> tuple[int, int]:
    """(diameter, radius) = (max, min) of an eccentricity table —
    per-component semantics when the graph is disconnected."""
    from ray.data.aggregate import Max, Min

    res = ecc.aggregate(
        Max("eccentricity", alias_name="d"),
        Min("eccentricity", alias_name="r"),
    )
    return int(res["d"] or 0), int(res["r"] or 0)


def distance_histogram(
    graph: GraphMeta,
    pivots: np.ndarray | list[int],
) -> ray.data.Dataset:
    """Rows ``(dist, pairs)`` — the hop-distance distribution: number
    of ordered reachable pairs ``(v, p)`` with ``p`` a pivot, ``p ≠ v``
    and ``d(v, p) = dist``.  With pivots = all vertices this is the
    exact ordered-pair hop histogram of the graph (the sufficient
    statistic for Wiener index / global efficiency — both are exact
    int-weighted sums over it, so a SQL twin matches bitwise on the
    int columns).

    Distributed shape: per state batch one ``np.bincount`` over the
    finite positive lanes (an O(rows·k) vectorized pass), then a tiny
    ``groupby("dist")`` over O(diameter) partial rows per batch.
    """
    pivots = np.unique(np.asarray(pivots, np.int64))
    run = pivot_distances(graph, pivots)
    k = len(pivots)

    def partial(batch: pa.Table) -> pa.Table:
        dmat = np.stack(
            [
                batch.column(f"d{i}").to_numpy(zero_copy_only=False)
                for i in range(k)
            ],
            axis=1,
        )
        finite = np.isfinite(dmat) & (dmat > 0)
        d = dmat[finite].astype(np.int64)
        counts = np.bincount(d) if len(d) else np.zeros(0, np.int64)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "dist": pa.array(nz.astype(np.int64)),
                "pairs": pa.array(counts[nz].astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    return (
        run.state.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("dist")
        .aggregate(Sum("pairs", alias_name="pairs"))
        .sort("dist")
    )


def _hist_table(graph: GraphMeta, pivots) -> pa.Table:
    ds = distance_histogram(graph, pivots)
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches:
        return pa.table(
            {"dist": pa.array([], pa.int64()), "pairs": pa.array([], pa.int64())}
        )
    return pa.concat_tables(batches).sort_by("dist")


def global_efficiency(
    graph: GraphMeta, n_vertices: int, pivots: np.ndarray | list[int]
) -> float:
    """``nx.global_efficiency`` parity when pivots = all vertices:
    mean of ``1/d(u, v)`` over ordered vertex pairs, 0 for unreachable
    pairs.  Driver-side work is O(diameter) histogram rows."""
    tbl = _hist_table(graph, pivots)
    dist = tbl.column("dist").to_numpy(zero_copy_only=False)
    pairs = tbl.column("pairs").to_numpy(zero_copy_only=False)
    denom = n_vertices * (n_vertices - 1)
    if denom == 0:
        return 0.0
    # ascending-dist left-to-right chain (sort_by above), one term per
    # distinct hop count — a defined IEEE order the SQL twin replays
    # bitwise via a recursive CTE over the (SQL-checked) hop histogram
    acc = 0.0
    for p, d in zip(pairs.tolist(), dist.tolist()):
        acc = acc + p / d
    return acc / denom


def wiener_index(
    graph: GraphMeta, n_vertices: int, pivots: np.ndarray | list[int]
) -> float:
    """``nx.wiener_index`` (unweighted, undirected) parity when pivots
    cover all vertices: Σ d(u, v) over unordered pairs; +inf when the
    graph is disconnected (some pair unreachable), matching nx."""
    tbl = _hist_table(graph, pivots)
    dist = tbl.column("dist").to_numpy(zero_copy_only=False)
    pairs = tbl.column("pairs").to_numpy(zero_copy_only=False)
    reachable = int(pairs.sum())
    if reachable < n_vertices * (n_vertices - 1):
        return float("inf")
    return float(int((dist * pairs).sum()) / 2)
