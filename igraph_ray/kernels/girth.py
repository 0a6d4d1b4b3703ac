"""Girth — length of the shortest cycle (igraph ``igraph_girth`` /
``nx.girth`` semantics; +inf for forests).

Distributed shape: for each chunk of BFS pivots, run the k-lane
``pivot_distances`` chassis, then ONE extra probe superstep that
detects cycles from the converged distance lanes entirely with
per-partition numpy plus the chassis' usual pre-combined message
shuffle — no all-pairs work, no driver-side adjacency:

- **odd cycles**: an edge ``(u, v)`` with ``d(p,u) == d(p,v) = d``
  closes an odd closed walk of length ``2d+1`` through pivot ``p``;
  every odd closed walk contains an odd cycle of at most its length.
- **even cycles**: a vertex ``v`` with >= 2 BFS-DAG parents (two
  neighbours at level ``d(p,v)-1``) has two distinct shortest paths
  from ``p``, whose union contains a cycle of length <= ``2·d(p,v)``.

Both detectors only over-estimate, and for a pivot ON a shortest
cycle of length ``g`` the relevant detector fires with value exactly
``g`` (the far edge of an odd cycle sits level-parallel at depth
``(g-1)/2``; the antipode of an even cycle has two parents at depth
``g/2``) — so the min over pivots covering every vertex is exact,
matching the reference's O(V·E) per-root BFS algorithm.

Message economy: the probe pre-combines per (partition, dst) into
``(min src-level m, count at m, count at m+1)`` triples per lane —
sufficient statistics, because no arc into ``v`` can come from below
level ``d(p,v)-1`` — so a hub vertex still receives at most P rows.

Sampled mode (``pivots`` a subset) gives an upper bound — the
documented estimate-at-scale trade, like sampled betweenness.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from igraph_ray.kernels.base import run_kernel
from igraph_ray.kernels.multibfs import MultiBFSKernel, pivot_distances
from igraph_ray.stages.partition import GraphMeta

_INF = np.inf


@dataclass
class GirthProbeKernel:
    """One-superstep cycle probe over converged multi-BFS lanes."""

    num_parts: int
    k: int

    def __post_init__(self) -> None:
        k = self.k
        self.state_value_cols = {f"d{i}": np.float64 for i in range(k)}
        self.state_value_cols["changed"] = np.int64
        self.metric_cols = ()
        fields = [
            ("dst_part", pa.int32()),
            ("dst", pa.int64()),
            ("is_self", pa.int8()),
        ]
        for i in range(k):
            fields += [
                (f"m{i}", pa.float64()),
                (f"c0{i}", pa.int64()),
                (f"c1{i}", pa.int64()),
            ]
        self.message_schema = pa.schema(fields)

    def init_state(self, csr, part: int):  # pragma: no cover - unused
        raise RuntimeError("GirthProbeKernel requires initial_state")

    def scatter(self, csr, sb) -> pa.Table:
        k = self.k
        src_pos = csr.get("src_pos", np.empty(0, np.int64))
        nseg = 0
        m = np.empty((0, k), np.float64)
        c0 = np.empty((0, k), np.int64)
        c1 = np.empty((0, k), np.int64)
        m_dst = np.empty(0, np.int64)
        m_part = np.empty(0, np.int32)
        if len(src_pos):
            # partial-batch contract: only arcs whose source row is
            # present may contribute (absent slots are zero-filled and
            # would alias pivot distance 0)
            kept = np.flatnonzero(sb.present[src_pos])
            if len(kept):
                dmat = np.stack(
                    [sb.aligned[f"d{i}"] for i in range(k)], axis=1
                )
                vals = dmat[src_pos[kept]]
                seg_id = (
                    np.searchsorted(csr["seg_start"], kept, side="right") - 1
                )
                boundary = np.empty(len(kept), dtype=bool)
                boundary[0] = True
                boundary[1:] = seg_id[1:] != seg_id[:-1]
                starts = np.flatnonzero(boundary)
                nseg = len(starts)
                lens = np.diff(np.append(starts, len(kept)))
                seg_of = np.repeat(np.arange(nseg), lens)
                m = np.minimum.reduceat(vals, starts, axis=0)
                at_min = (vals == m[seg_of]).astype(np.int64)
                at_next = (vals == m[seg_of] + 1).astype(np.int64)
                c0 = np.add.reduceat(at_min, starts, axis=0)
                c1 = np.add.reduceat(at_next, starts, axis=0)
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
                    [np.zeros(nseg, np.int8), np.ones(n_self, np.int8)]
                )
            ),
        }
        for i in range(k):
            cols[f"m{i}"] = pa.array(
                np.concatenate([m[:, i], sb.values[f"d{i}"]])
            )
            cols[f"c0{i}"] = pa.array(
                np.concatenate([c0[:, i], np.zeros(n_self, np.int64)])
            )
            cols[f"c1{i}"] = pa.array(
                np.concatenate([c1[:, i], np.zeros(n_self, np.int64)])
            )
        return pa.table(cols)

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        k = self.k
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        is_self = group.column("is_self").to_numpy(zero_copy_only=False)
        m = np.stack(
            [
                group.column(f"m{i}").to_numpy(zero_copy_only=False)
                for i in range(k)
            ],
            axis=1,
        )
        c0 = np.stack(
            [
                group.column(f"c0{i}").to_numpy(zero_copy_only=False)
                for i in range(k)
            ],
            axis=1,
        )
        c1 = np.stack(
            [
                group.column(f"c1{i}").to_numpy(zero_copy_only=False)
                for i in range(k)
            ],
            axis=1,
        )
        order = np.argsort(dst, kind="stable")
        dst, is_self = dst[order], is_self[order]
        m, c0, c1 = m[order], c0[order], c1[order]

        boundary = np.empty(len(dst), dtype=bool)
        if len(dst):
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(boundary)
        vids = dst[seg]
        # exactly one self row per vid carries its own distance lanes
        self_rows = np.flatnonzero(is_self == 1)
        d_v = np.full((len(vids), k), _INF)
        d_v[np.searchsorted(vids, dst[self_rows])] = m[self_rows]

        vid_of_row = np.searchsorted(vids, dst)
        d_row = d_v[vid_of_row]
        parents_contrib = np.where(m == d_row - 1, c0, 0)
        same_contrib = np.where(m == d_row, c0, 0) + np.where(
            m == d_row - 1, c1, 0
        )
        parents = np.add.reduceat(parents_contrib, seg, axis=0)
        same = np.add.reduceat(same_contrib, seg, axis=0)

        finite = np.isfinite(d_v)
        even = np.where(finite & (parents >= 2), 2.0 * d_v, _INF)
        odd = np.where(finite & (same >= 1), 2.0 * d_v + 1.0, _INF)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "cand": pa.array(np.minimum(even, odd).min(axis=1)),
                "cand_odd": pa.array(odd.min(axis=1)),
            }
        )

    def converged(self, metrics, iteration: int) -> bool:
        return True


def girth(
    graph: GraphMeta,
    pivots: np.ndarray,
    lane_width: int = 64,
) -> float:
    """Shortest-cycle length from BFS roots ``pivots`` — exact when
    ``pivots`` covers every vertex (any vertex of a shortest cycle
    suffices), an upper bound for a subset.  Returns ``inf`` when no
    cycle is seen (forest).  Early-exits when 3 is reached."""
    pivots = np.unique(np.asarray(pivots, np.int64))
    best = _INF
    for lo in range(0, len(pivots), lane_width):
        chunk = pivots[lo : lo + lane_width]
        dk = pivot_distances(graph, chunk)
        probe = GirthProbeKernel(num_parts=graph.num_parts, k=len(chunk))
        run = run_kernel(probe, graph, max_iter=1, initial_state=dk.state)
        chunk_min = run.state.min("cand")
        if chunk_min is not None and chunk_min < best:
            best = float(chunk_min)
        if best <= 3.0:
            break
    return best


# ---------------------------------------------------------------------------
# Bipartiteness / 2-coloring
# ---------------------------------------------------------------------------
@dataclass
class MultiSourceBFSKernel(MultiBFSKernel):
    """One BFS lane with MANY simultaneous sources (one per connected
    component) — hop distance to the nearest source.  Parity of that
    distance 2-colors each component; an edge between equal-parity
    (== equal-level, since BFS levels differ by at most 1 across an
    edge) endpoints certifies an odd cycle."""

    sources: np.ndarray = None  # type: ignore[assignment]

    def init_state(self, csr, part: int):
        vids = csr.get("vids", np.empty(0, np.int64))
        n = len(vids)
        d = np.full(n, _INF, np.float64)
        changed = np.zeros(n, np.int64)
        pos = np.searchsorted(vids, self.sources)
        pos = pos[(pos < n)]
        hit = pos[np.isin(vids[pos], self.sources)]
        d[hit] = 0.0
        changed[hit] = 1
        return {"d0": d, "changed": changed}


def bipartite_check(
    graph: GraphMeta, roots: np.ndarray, max_iter: int = 10_000
):
    """(is_bipartite, colors) — igraph ``is_bipartite`` /
    ``nx.bipartite.color`` semantics.  ``roots`` must contain one
    vertex per connected component (e.g. the min-vid component labels
    from the components kernel).  Returns the final parity state
    dataset ``(part, vid, color)`` (color = BFS level mod 2, a valid
    2-coloring iff bipartite) and the bipartite flag — detected by the
    same one-superstep probe as girth, restricted to odd candidates.
    """
    roots = np.unique(np.asarray(roots, np.int64))
    kernel = MultiSourceBFSKernel(
        num_parts=graph.num_parts,
        pivots=np.array([roots[0]], np.int64),
        sources=roots,
    )
    run = run_kernel(kernel, graph, max_iter=max_iter)
    if not run.converged:
        raise RuntimeError("bipartite_check BFS did not converge")
    probe = GirthProbeKernel(num_parts=graph.num_parts, k=1)
    probe_run = run_kernel(probe, graph, max_iter=1, initial_state=run.state)
    odd_min = probe_run.state.min("cand_odd")
    is_bip = odd_min is None or not np.isfinite(odd_min)

    def parity(batch: pa.Table) -> pa.Table:
        d = batch.column("d0").to_numpy(zero_copy_only=False)
        color = np.where(np.isfinite(d), d.astype(np.int64) % 2, -1)
        return pa.table(
            {
                "part": batch.column("part"),
                "vid": batch.column("vid"),
                "color": pa.array(color.astype(np.int64)),
            }
        )

    colors = run.state.map_batches(
        parity, batch_format="pyarrow", zero_copy_batch=True
    )
    return bool(is_bip), colors
