"""Weighted Brandes betweenness — Dijkstra orderings on the chassis.

Closes the documented gap at ``kernels/betweenness.py`` ("weighted
Brandes needs Dijkstra orderings that do not level-synchronize"): the
trick is that the orderings only need to be *topological on the
shortest-path DAG*, not Dijkstra's literal pop order.  Per source:

1. **dist** — the existing weighted SSSP kernel (distributed
   Bellman-Ford with a frontier, ``kernels/sssp.py``) converges to the
   exact Dijkstra distances on positive weights.  The per-vertex dist
   vector (two arrays, vid-sorted) is broadcast once via ``ray.put``
   under the engine-wide ``BROADCAST_MAX_VERTICES`` bound — the same
   per-source broadcast the unweighted ``edge_betweenness`` composition
   already uses.
2. **DAG arcs** — with dist on every worker, each partition marks its
   CSR arcs ``(u → v)`` locally: *forward DAG* iff
   ``dist[u] + w(u,v) == dist[v]`` (the exact float-equality predecessor
   test networkx's ``_dijkstra`` uses: ``vu_dist == seen[u]``), and
   *reverse DAG* iff ``dist[v] + w == dist[u]``.  Positive weights make
   the DAG acyclic (dist strictly increases along DAG arcs).  Masks are
   memoized per (dist broadcast, partition) in a worker-global cache.
3. **lvl** — longest-path depth over the DAG (max-label propagation,
   integer, exact convergence).  ``lvl`` is a topological rank: every
   DAG arc goes from a lower to a strictly higher level, so processing
   by level replaces Dijkstra's ordering with O(depth) supersteps
   instead of O(distinct distances).
4. **σ** — level-synchronous forward sweep: at round t vertices with
   ``lvl == t`` send σ along forward-DAG arcs; receivers accumulate.
   Exactly ``max_lvl`` rounds (a vertex's σ is complete before its
   level is reached — all its DAG predecessors have strictly lower
   levels).
5. **δ** — reverse sweep, levels high→low: senders emit
   ``c = (1 + δ(w)) / σ(w)`` along *reverse*-DAG arcs (the DAG check is
   sender-side, so no receiver-side predecessor test is needed);
   receivers accumulate ``δ += σ · Σc``.

Betweenness = Σ_s δ_s(v) with the same rescaling as the unweighted
path (``nx.betweenness_centrality(G, weight=...)`` semantics; Brandes
2001).  Float sums may associate differently from networkx's
sequential accumulation — tests compare at 1e-9 like the unweighted
oracle suite.

Scale notes: the broadcast is 16 bytes/vertex per in-flight source
(join fallback above the bound is future work — raise for now, the
documented boundary); everything else is the standard chassis shape —
pre-combined per-partition messages, one ``groupby("dst_part")``
shuffle per superstep, CSR never reshuffled.
"""

from __future__ import annotations

import collections
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.kernels.base import run_kernel
from igraph_ray.kernels.sssp import shortest_paths
from igraph_ray.stages.partition import GraphMeta, load_csr
from igraph_ray.stages.vertex_ids import BROADCAST_MAX_VERTICES

# ---------------------------------------------------------------------------
# Worker-global DAG-mask cache: (dist-broadcast hex, part) → masks.
# The mask arrays are O(arcs) bools — recomputing them every superstep
# would cost an O(E log V) searchsorted per iteration; memoized they
# cost it once per source.  Bounded by entry count (entries die with
# the source's ObjectRef anyway).
# ---------------------------------------------------------------------------
_DAG_CACHE: "collections.OrderedDict[tuple[str, int], dict[str, np.ndarray]]" = (
    collections.OrderedDict()
)
_DAG_CACHE_MAX = 64


def _dag_masks(
    csr: dict[str, np.ndarray], part: int, dist_ref: Any
) -> dict[str, np.ndarray]:
    key = (dist_ref.hex(), part)
    hit = _DAG_CACHE.get(key)
    if hit is not None:
        _DAG_CACHE.move_to_end(key)
        return hit
    b_vids, b_dist = ray.get(dist_ref)
    vids = csr.get("vids", np.empty(0, np.int64))
    sp = csr.get("src_pos", np.empty(0, np.int64))
    if len(sp):
        d_local = b_dist[np.searchsorted(b_vids, vids)]
        du = d_local[sp]
        dv = b_dist[np.searchsorted(b_vids, csr["dst"])]
        w = np.asarray(csr["w"], np.float64)
        fwd = np.isfinite(du) & (du + w == dv)
        rev = np.isfinite(dv) & (dv + w == du)
    else:
        fwd = np.empty(0, bool)
        rev = np.empty(0, bool)
    out = {"fwd": fwd, "rev": rev}
    _DAG_CACHE[key] = out
    while len(_DAG_CACHE) > _DAG_CACHE_MAX:
        _DAG_CACHE.popitem(last=False)
    return out


def _segment_combine(
    csr: dict[str, np.ndarray],
    arc_vals: np.ndarray,
    arc_mask: np.ndarray,
    reduce: str,
    neutral: float,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pre-combine per-arc values into per-(dst_part, dst) messages
    over the CSR combine segments; rows whose combined value equals
    ``neutral`` are dropped."""
    vals = np.where(arc_mask, arc_vals, neutral)
    op = np.maximum if reduce == "max" else np.add
    seg = op.reduceat(vals, csr["seg_start"])
    live = seg != neutral
    return (
        csr["seg_dst_part"][live].astype(np.int32),
        csr["seg_dst"][live],
        seg[live],
    )


LVL_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("val", pa.int64()),
        ("old", pa.int64()),
    ]
)


@dataclass
class _WDagLevel:
    """Longest-path level over the shortest-path DAG (max-label
    propagation; positive weights ⇒ acyclic ⇒ exact convergence)."""

    num_parts: int
    source: int
    dist_ref: Any

    state_value_cols: dict = field(
        default_factory=lambda: {"lvl": np.int64, "changed": np.int64}
    )
    metric_cols: tuple = ("changed",)
    message_schema: pa.Schema = LVL_SCHEMA

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        vids = csr.get("vids", np.empty(0, np.int64))
        lvl = np.full(len(vids), -1, np.int64)
        pos = np.searchsorted(vids, self.source)
        if pos < len(vids) and len(vids) and vids[pos] == self.source:
            lvl[pos] = 0
        return {"lvl": lvl, "changed": (lvl == 0).astype(np.int64)}

    def scatter(self, csr, sb) -> pa.Table:
        lvl = sb.aligned["lvl"]
        changed = sb.aligned["changed"].astype(bool) & sb.present
        sp = csr.get("src_pos", np.empty(0, np.int64))
        if len(sp):
            dag = _dag_masks(csr, sb.part, self.dist_ref)["fwd"]
            mask = changed[sp] & dag
            m_part, m_dst, m_val = _segment_combine(
                csr, lvl[sp] + 1, mask, "max", -1
            )
        else:
            m_part = np.empty(0, np.int32)
            m_dst = np.empty(0, np.int64)
            m_val = np.empty(0, np.int64)
        n_self = len(sb.vids)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate([m_part, np.full(n_self, sb.part, np.int32)])
                ),
                "dst": pa.array(np.concatenate([m_dst, sb.vids])),
                "val": pa.array(
                    np.concatenate([m_val, sb.values["lvl"]]).astype(np.int64)
                ),
                "old": pa.array(
                    np.concatenate(
                        [np.full(len(m_dst), -1, np.int64), sb.values["lvl"]]
                    )
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        val = group.column("val").to_numpy(zero_copy_only=False)
        old = group.column("old").to_numpy(zero_copy_only=False)
        order = np.argsort(dst, kind="stable")
        dst, val, old = dst[order], val[order], old[order]
        if len(dst):
            boundary = np.empty(len(dst), dtype=bool)
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
            seg = np.flatnonzero(boundary)
            vids = dst[seg]
            new = np.maximum.reduceat(val, seg)
            old_max = np.maximum.reduceat(old, seg)
        else:
            vids = np.empty(0, np.int64)
            new = np.empty(0, np.int64)
            old_max = np.empty(0, np.int64)
        changed = (new > old_max).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "lvl": pa.array(new),
                "changed": pa.array(changed),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        return metrics["changed"] == 0.0


SIG_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("add_sig", pa.float64()),
        ("lvl", pa.int64()),
        ("sigma", pa.float64()),
        ("is_self", pa.int8()),
    ]
)


@dataclass
class _WSigma:
    """Level-synchronous σ forward sweep: round t senders are vertices
    at ``lvl == t``; receivers accumulate path counts."""

    num_parts: int
    max_lvl: int
    dist_ref: Any
    iteration: int = 0  # set by the chassis each iteration

    state_value_cols: dict = field(
        default_factory=lambda: {"lvl": np.int64, "sigma": np.float64}
    )
    metric_cols: tuple = ()
    message_schema: pa.Schema = SIG_SCHEMA

    def init_state(self, csr, part: int):  # pragma: no cover
        raise RuntimeError("σ phase always starts from the lvl state")

    def scatter(self, csr, sb) -> pa.Table:
        lvl = sb.aligned["lvl"]
        sigma = sb.aligned["sigma"]
        sender = (lvl == self.iteration) & sb.present
        sp = csr.get("src_pos", np.empty(0, np.int64))
        if len(sp) and sender.any():
            dag = _dag_masks(csr, sb.part, self.dist_ref)["fwd"]
            mask = sender[sp] & dag
            m_part, m_dst, m_val = _segment_combine(
                csr, sigma[sp], mask, "add", 0.0
            )
        else:
            m_part = np.empty(0, np.int32)
            m_dst = np.empty(0, np.int64)
            m_val = np.empty(0, np.float64)
        n_self = len(sb.vids)
        nm = len(m_dst)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate([m_part, np.full(n_self, sb.part, np.int32)])
                ),
                "dst": pa.array(np.concatenate([m_dst, sb.vids])),
                "add_sig": pa.array(
                    np.concatenate([m_val, np.zeros(n_self)])
                ),
                "lvl": pa.array(
                    np.concatenate(
                        [np.zeros(nm, np.int64), sb.values["lvl"]]
                    )
                ),
                "sigma": pa.array(
                    np.concatenate([np.zeros(nm), sb.values["sigma"]])
                ),
                "is_self": pa.array(
                    np.concatenate(
                        [np.zeros(nm, np.int8), np.ones(n_self, np.int8)]
                    )
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        add = group.column("add_sig").to_numpy(zero_copy_only=False)
        lvl = group.column("lvl").to_numpy(zero_copy_only=False)
        sigma = group.column("sigma").to_numpy(zero_copy_only=False)
        is_self = group.column("is_self").to_numpy(zero_copy_only=False) == 1
        order = np.argsort(dst, kind="stable")
        dst, add, lvl, sigma, is_self = (
            x[order] for x in (dst, add, lvl, sigma, is_self)
        )
        if len(dst) == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "vid": pa.array([], pa.int64()),
                    "lvl": pa.array([], pa.int64()),
                    "sigma": pa.array([], pa.float64()),
                }
            )
        boundary = np.empty(len(dst), dtype=bool)
        boundary[0] = True
        boundary[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(boundary)
        vids = dst[seg]
        s_lvl = np.add.reduceat(np.where(is_self, lvl, 0), seg)
        s_sig = np.add.reduceat(np.where(is_self, sigma, 0.0), seg)
        a_sum = np.add.reduceat(np.where(is_self, 0.0, add), seg)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "lvl": pa.array(s_lvl),
                "sigma": pa.array(s_sig + a_sum),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        return iteration >= self.max_lvl - 1


BWD_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("c", pa.float64()),
        ("lvl", pa.int64()),
        ("sigma", pa.float64()),
        ("delta", pa.float64()),
        ("is_self", pa.int8()),
    ]
)


@dataclass
class _WBackward:
    """Reverse dependency sweep: iteration t processes level
    ``max_lvl − t``; DAG membership is checked sender-side on the
    reverse masks, so receivers just accumulate ``δ += σ·Σc``."""

    num_parts: int
    max_lvl: int
    dist_ref: Any
    iteration: int = 0

    state_value_cols: dict = field(
        default_factory=lambda: {
            "lvl": np.int64,
            "sigma": np.float64,
            "delta": np.float64,
        }
    )
    metric_cols: tuple = ()
    message_schema: pa.Schema = BWD_SCHEMA

    def init_state(self, csr, part: int):  # pragma: no cover
        raise RuntimeError("backward phase always starts from σ state")

    def scatter(self, csr, sb) -> pa.Table:
        level = self.max_lvl - self.iteration
        lvl = sb.aligned["lvl"]
        sigma = sb.aligned["sigma"]
        delta = sb.aligned["delta"]
        sender = (lvl == level) & sb.present & (sigma > 0)
        sp = csr.get("src_pos", np.empty(0, np.int64))
        if len(sp) and sender.any():
            rev = _dag_masks(csr, sb.part, self.dist_ref)["rev"]
            mask = sender[sp] & rev
            c = np.where(
                mask,
                (1.0 + delta[sp]) / np.where(sigma[sp] > 0, sigma[sp], 1.0),
                0.0,
            )
            m_part, m_dst, m_c = _segment_combine(csr, c, mask, "add", 0.0)
        else:
            m_part = np.empty(0, np.int32)
            m_dst = np.empty(0, np.int64)
            m_c = np.empty(0, np.float64)
        n_self = len(sb.vids)
        nm = len(m_dst)
        z = np.zeros(nm, np.float64)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate([m_part, np.full(n_self, sb.part, np.int32)])
                ),
                "dst": pa.array(np.concatenate([m_dst, sb.vids])),
                "c": pa.array(np.concatenate([m_c, np.zeros(n_self)])),
                "lvl": pa.array(
                    np.concatenate([np.zeros(nm, np.int64), sb.values["lvl"]])
                ),
                "sigma": pa.array(np.concatenate([z, sb.values["sigma"]])),
                "delta": pa.array(np.concatenate([z, sb.values["delta"]])),
                "is_self": pa.array(
                    np.concatenate(
                        [np.zeros(nm, np.int8), np.ones(n_self, np.int8)]
                    )
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        lvl = group.column("lvl").to_numpy(zero_copy_only=False)
        sigma = group.column("sigma").to_numpy(zero_copy_only=False)
        delta = group.column("delta").to_numpy(zero_copy_only=False)
        is_self = group.column("is_self").to_numpy(zero_copy_only=False) == 1
        order = np.argsort(dst, kind="stable")
        dst, c, lvl, sigma, delta, is_self = (
            x[order] for x in (dst, c, lvl, sigma, delta, is_self)
        )
        if len(dst) == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "vid": pa.array([], pa.int64()),
                    "lvl": pa.array([], pa.int64()),
                    "sigma": pa.array([], pa.float64()),
                    "delta": pa.array([], pa.float64()),
                }
            )
        boundary = np.empty(len(dst), dtype=bool)
        boundary[0] = True
        boundary[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(boundary)
        vids = dst[seg]
        c_sum = np.add.reduceat(np.where(is_self, 0.0, c), seg)
        s_lvl = np.add.reduceat(np.where(is_self, lvl, 0), seg)
        s_sig = np.add.reduceat(np.where(is_self, sigma, 0.0), seg)
        s_del = np.add.reduceat(np.where(is_self, delta, 0.0), seg)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "lvl": pa.array(s_lvl),
                "sigma": pa.array(s_sig),
                "delta": pa.array(s_del + s_sig * c_sum),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        return iteration >= self.max_lvl - 1


def validate_positive_weights(graph: GraphMeta) -> None:
    """Weighted Brandes requires strictly positive weights (otherwise
    the shortest-path DAG can be cyclic / path counts diverge — igraph
    rejects non-positive weights for weighted betweenness too).  One
    tiny remote scan per partition, result cached on the meta object."""
    if getattr(graph, "_weights_positive", False):
        return

    @ray.remote
    def part_min(graph_dir: str, part: int) -> float:
        blk = load_csr(GraphMeta.load(graph_dir), part)
        w = np.asarray(blk.get("w", np.empty(0, np.float64)))
        return float(w.min()) if len(w) else np.inf

    mins = ray.get(
        [part_min.remote(graph.graph_dir, p) for p in graph.parts]
    )
    if mins and min(mins) <= 0.0:
        raise ValueError(
            "weighted betweenness/closeness requires strictly positive "
            f"edge weights (min weight = {min(mins)})"
        )
    graph._weights_positive = True  # type: ignore[attr-defined]


def dist_broadcast(graph: GraphMeta, source: int):
    """Weighted SSSP from ``source`` → ``ray.put((vids, dist))``,
    vid-sorted.  Raises past the engine broadcast bound (the per-source
    join fallback is the documented scale path, not yet needed for the
    V ≤ 20M graphs this engine targets per BASELINE.md)."""
    run = shortest_paths(graph, [source], weighted=True)
    tbl = pa.concat_tables(
        run.state.select_columns(["vid", "dist"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    if tbl.num_rows > BROADCAST_MAX_VERTICES:
        raise NotImplementedError(
            "weighted betweenness above BROADCAST_MAX_VERTICES needs the "
            "co-partitioned join fallback for the per-source dist table"
        )
    vid = tbl.column("vid").to_numpy(zero_copy_only=False)
    dist = tbl.column("dist").to_numpy(zero_copy_only=False)
    order = np.argsort(vid)
    return ray.put((vid[order], dist[order]))


def single_source_weighted_state(
    graph: GraphMeta, source: int
) -> ray.data.Dataset:
    """(part, vid, lvl, sigma, delta) full weighted-Brandes state of
    one source."""
    ref = dist_broadcast(graph, source)

    lvl_run = run_kernel(
        _WDagLevel(num_parts=graph.num_parts, source=source, dist_ref=ref),
        graph,
        max_iter=100_000,
    )
    max_lvl = int(lvl_run.state.max("lvl") or 0)

    def add_sigma(batch: pa.Table) -> pa.Table:
        vid = batch.column("vid").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": batch.column("part"),
                "vid": batch.column("vid"),
                "lvl": batch.column("lvl"),
                "sigma": pa.array((vid == source).astype(np.float64)),
            }
        )

    sig_init = lvl_run.state.map_batches(
        add_sigma, batch_format="pyarrow", zero_copy_batch=True
    )
    if max_lvl >= 1:
        sig_run = run_kernel(
            _WSigma(
                num_parts=graph.num_parts, max_lvl=max_lvl, dist_ref=ref
            ),
            graph,
            max_iter=max_lvl,
            initial_state=sig_init,
        )
        sig_state = sig_run.state
    else:
        sig_state = sig_init

    def add_delta(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "part": batch.column("part"),
                "vid": batch.column("vid"),
                "lvl": batch.column("lvl"),
                "sigma": batch.column("sigma"),
                "delta": pa.array(np.zeros(batch.num_rows, np.float64)),
            }
        )

    bwd_init = sig_state.map_batches(
        add_delta, batch_format="pyarrow", zero_copy_batch=True
    )
    if max_lvl < 1:
        return bwd_init
    bwd_run = run_kernel(
        _WBackward(num_parts=graph.num_parts, max_lvl=max_lvl, dist_ref=ref),
        graph,
        max_iter=max_lvl,
        initial_state=bwd_init,
    )
    return bwd_run.state


def single_source_weighted_dependencies(
    graph: GraphMeta, source: int
) -> ray.data.Dataset:
    """(vid, delta) weighted dependency table of one Brandes source."""
    out = single_source_weighted_state(graph, source)

    def project(batch: pa.Table, _src=source) -> pa.Table:
        vid = batch.column("vid").to_numpy(zero_copy_only=False)
        delta = batch.column("delta").to_numpy(zero_copy_only=False)
        keep = vid != _src
        return pa.table(
            {"vid": pa.array(vid[keep]), "delta": pa.array(delta[keep])}
        )

    return out.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
