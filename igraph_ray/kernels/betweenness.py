"""Betweenness centrality — pivot-sampled Brandes over the BFS chassis.

Reference semantics: ``networkx.betweenness_centrality``
(``NX/algorithms/centrality/betweenness.py``) — Brandes 2001: for each
source s, (1) a BFS computes distance and shortest-path counts σ, (2)
a reverse level sweep accumulates dependencies
``δ(v) += σ(v)/σ(w) · (1 + δ(w))`` over predecessors, and betweenness
is ``Σ_s δ_s(v)`` (halved for undirected graphs).  With ``k`` sampled
pivots the sum is rescaled by ``n/k`` (the same estimator
``nx.betweenness_centrality(G, k=...)`` uses).

Distributed shape: both phases are chassis kernels (one message
shuffle per BFS level; combine via ``reduceat``).  Forward messages
carry (candidate distance, σ partial-sum); the level-synchronous BFS
discovers every vertex exactly once, so σ sums correctly in the single
apply where the vertex is first reached.  Backward iterations process
levels high→low: senders at the current level broadcast
``c = (1+δ)/σ`` to all neighbors; only receivers one level below
accumulate ``δ += σ·Σc`` (the predecessor relation for unweighted
BFS).  Per-source cost is O(diameter) supersteps; per-source δ tables
are unioned and reduced with one final ``groupby(vid).sum``.

The unweighted path below level-synchronizes on BFS hop levels; the
weighted path (``weighted=True``) delegates to
``kernels/weighted_brandes.py``, which replaces Dijkstra's pop order
with shortest-path-DAG *levels* (a topological rank) — same chassis,
same estimator/scaling.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from igraph_ray.kernels.base import KernelRun, run_kernel
from igraph_ray.stages.partition import GraphMeta, load_csr
from igraph_ray.utils import hash_int64

_INF = np.inf

FWD_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("val", pa.float64()),
        ("sig", pa.float64()),
        ("old", pa.float64()),
    ]
)

BWD_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("c", pa.float64()),
        ("dist", pa.float64()),
        ("sigma", pa.float64()),
        ("delta", pa.float64()),
        ("is_self", pa.int8()),
    ]
)


@dataclass
class _BrandesForward:
    """Level-synchronous BFS with shortest-path counts σ."""

    num_parts: int
    source: int

    state_value_cols: dict = field(
        default_factory=lambda: {
            "dist": np.float64,
            "sigma": np.float64,
            "changed": np.int64,
        }
    )
    metric_cols: tuple = ("changed",)
    message_schema: pa.Schema = FWD_SCHEMA

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        vids = csr.get("vids", np.empty(0, np.int64))
        dist = np.full(len(vids), _INF, np.float64)
        sigma = np.zeros(len(vids), np.float64)
        pos = np.searchsorted(vids, self.source)
        if pos < len(vids) and len(vids) and vids[pos] == self.source:
            dist[pos] = 0.0
            sigma[pos] = 1.0
        return {
            "dist": dist,
            "sigma": sigma,
            "changed": (dist == 0.0).astype(np.int64),
        }

    def scatter(self, csr, sb) -> pa.Table:
        dist = sb.aligned["dist"]
        sigma = sb.aligned["sigma"]
        changed = sb.aligned["changed"].astype(bool) & sb.present

        if len(csr.get("src_pos", ())):
            sp = csr["src_pos"]
            live_e = changed[sp]
            vals = np.where(live_e, dist[sp] + 1.0, _INF)
            sigs = np.where(live_e, sigma[sp], 0.0)
            seg_val = np.minimum.reduceat(vals, csr["seg_start"])
            seg_sig = np.add.reduceat(sigs, csr["seg_start"])
            live = np.isfinite(seg_val)
            m_part = csr["seg_dst_part"][live]
            m_dst = csr["seg_dst"][live]
            m_val = seg_val[live]
            m_sig = seg_sig[live]
        else:
            m_part = np.empty(0, np.int32)
            m_dst = np.empty(0, np.int64)
            m_val = np.empty(0, np.float64)
            m_sig = np.empty(0, np.float64)

        self_vids = sb.vids
        self_dist = sb.values["dist"]
        self_sig = sb.values["sigma"]
        n_self = len(self_vids)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate([m_part, np.full(n_self, sb.part, np.int32)])
                ),
                "dst": pa.array(np.concatenate([m_dst, self_vids])),
                "val": pa.array(np.concatenate([m_val, self_dist])),
                "sig": pa.array(np.concatenate([m_sig, self_sig])),
                "old": pa.array(
                    np.concatenate(
                        [np.full(len(m_dst), _INF, np.float64), self_dist]
                    )
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        val = group.column("val").to_numpy(zero_copy_only=False)
        sig = group.column("sig").to_numpy(zero_copy_only=False)
        old = group.column("old").to_numpy(zero_copy_only=False)

        order = np.argsort(dst, kind="stable")
        dst, val, sig, old = dst[order], val[order], sig[order], old[order]
        if len(dst) == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "vid": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.float64()),
                    "sigma": pa.array([], pa.float64()),
                    "changed": pa.array([], pa.int64()),
                }
            )
        boundary = np.empty(len(dst), dtype=bool)
        boundary[0] = True
        boundary[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(boundary)
        seg_id = np.cumsum(boundary) - 1
        vids = dst[seg]
        new = np.minimum.reduceat(val, seg)
        old_min = np.minimum.reduceat(old, seg)
        changed = new < old_min
        # σ: on first discovery sum neighbor partials at the new
        # distance; afterwards keep the self row's σ (old finite rows)
        is_nbr = ~np.isfinite(old)
        at_new = is_nbr & (val == new[seg_id])
        sig_new = np.add.reduceat(np.where(at_new, sig, 0.0), seg)
        sig_keep = np.add.reduceat(np.where(~is_nbr, sig, 0.0), seg)
        sigma = np.where(changed, sig_new, sig_keep)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "dist": pa.array(np.where(changed, new, old_min)),
                "sigma": pa.array(sigma),
                "changed": pa.array(changed.astype(np.int64)),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        return metrics["changed"] == 0.0


@dataclass
class _BrandesBackward:
    """Reverse level sweep: iteration t processes level max_level − t."""

    num_parts: int
    max_level: int
    iteration: int = 0  # set by the chassis each iteration

    state_value_cols: dict = field(
        default_factory=lambda: {
            "dist": np.float64,
            "sigma": np.float64,
            "delta": np.float64,
        }
    )
    metric_cols: tuple = ()
    message_schema: pa.Schema = BWD_SCHEMA

    def init_state(self, csr, part: int):  # pragma: no cover
        raise RuntimeError("backward phase always starts from forward state")

    def scatter(self, csr, sb) -> pa.Table:
        level = float(self.max_level - self.iteration)
        dist = sb.aligned["dist"]
        sigma = sb.aligned["sigma"]
        delta = sb.aligned["delta"]
        sender = (dist == level) & sb.present & (sigma > 0)

        if len(csr.get("src_pos", ())) and sender.any():
            sp = csr["src_pos"]
            c = np.where(sender[sp], (1.0 + delta[sp]) / np.where(
                sigma[sp] > 0, sigma[sp], 1.0
            ), 0.0)
            seg_c = np.add.reduceat(c, csr["seg_start"])
            live = seg_c != 0.0
            m_part = csr["seg_dst_part"][live]
            m_dst = csr["seg_dst"][live]
            m_c = seg_c[live]
        else:
            m_part = np.empty(0, np.int32)
            m_dst = np.empty(0, np.int64)
            m_c = np.empty(0, np.float64)

        self_vids = sb.vids
        n_self = len(self_vids)
        nm = len(m_dst)
        z = np.zeros(nm, np.float64)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate([m_part, np.full(n_self, sb.part, np.int32)])
                ),
                "dst": pa.array(np.concatenate([m_dst, self_vids])),
                "c": pa.array(np.concatenate([m_c, np.zeros(n_self)])),
                "dist": pa.array(np.concatenate([z, sb.values["dist"]])),
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
        level = float(self.max_level - self.iteration)
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        dist = group.column("dist").to_numpy(zero_copy_only=False)
        sigma = group.column("sigma").to_numpy(zero_copy_only=False)
        delta = group.column("delta").to_numpy(zero_copy_only=False)
        is_self = group.column("is_self").to_numpy(zero_copy_only=False) == 1

        order = np.argsort(dst, kind="stable")
        dst, c, dist, sigma, delta, is_self = (
            x[order] for x in (dst, c, dist, sigma, delta, is_self)
        )
        if len(dst) == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "vid": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.float64()),
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
        s_dist = np.add.reduceat(np.where(is_self, dist, 0.0), seg)
        s_sigma = np.add.reduceat(np.where(is_self, sigma, 0.0), seg)
        s_delta = np.add.reduceat(np.where(is_self, delta, 0.0), seg)
        is_pred = s_dist == level - 1.0
        new_delta = np.where(is_pred, s_delta + s_sigma * c_sum, s_delta)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "dist": pa.array(s_dist),
                "sigma": pa.array(s_sigma),
                "delta": pa.array(new_delta),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        return iteration >= self.max_level - 1


def _all_vids(graph: GraphMeta) -> np.ndarray:
    """All vertex ids (driver-side; betweenness output is V rows
    anyway, and pivot selection needs the id universe)."""

    @ray.remote
    def part_vids(graph_dir: str, part: int) -> np.ndarray:
        blk = load_csr(GraphMeta.load(graph_dir), part)
        return np.asarray(blk.get("vids", np.empty(0, np.int64)))

    arrs = ray.get(
        [part_vids.remote(graph.graph_dir, p) for p in graph.parts]
    )
    return np.sort(np.concatenate(arrs)) if arrs else np.empty(0, np.int64)


def _single_source_state(
    graph: GraphMeta, source: int
) -> ray.data.Dataset:
    """(part, vid, dist, sigma, delta) full Brandes state of one
    source (forward BFS + backward dependency sweep)."""
    fwd = run_kernel(
        _BrandesForward(num_parts=graph.num_parts, source=source),
        graph,
        max_iter=100_000,
    )
    state = fwd.state

    def max_level_partial(batch: pa.Table) -> pa.Table:
        d = batch.column("dist").to_numpy(zero_copy_only=False)
        finite = d[np.isfinite(d)]
        m = float(finite.max()) if len(finite) else 0.0
        return pa.table({"m": pa.array([m], pa.float64())})

    max_level = int(
        state.map_batches(
            max_level_partial, batch_format="pyarrow", zero_copy_batch=True
        ).max("m")
        or 0
    )

    def add_delta(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "part": batch.column("part"),
                "vid": batch.column("vid"),
                "dist": batch.column("dist"),
                "sigma": batch.column("sigma"),
                "delta": pa.array(np.zeros(batch.num_rows, np.float64)),
            }
        )

    init = state.map_batches(
        add_delta, batch_format="pyarrow", zero_copy_batch=True
    )
    if max_level < 1:
        out = init
    else:
        bwd = run_kernel(
            _BrandesBackward(num_parts=graph.num_parts, max_level=max_level),
            graph,
            max_iter=max_level,
            initial_state=init,
        )
        out = bwd.state
    return out


def _single_source_dependencies(
    graph: GraphMeta, source: int
) -> ray.data.Dataset:
    """(vid, delta) dependency table of one Brandes source."""
    out = _single_source_state(graph, source)

    def project(batch: pa.Table, _src=source) -> pa.Table:
        vid = batch.column("vid").to_numpy(zero_copy_only=False)
        delta = batch.column("delta").to_numpy(zero_copy_only=False)
        keep = vid != _src  # δ_s(s) is excluded (Brandes)
        return pa.table(
            {"vid": pa.array(vid[keep]), "delta": pa.array(delta[keep])}
        )

    return out.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )


def edge_betweenness(
    graph: GraphMeta,
    edges: ray.data.Dataset,
    k: int | None = None,
    normalized: bool = True,
    directed: bool = False,
    sources: list[int] | None = None,
) -> ray.data.Dataset:
    """Rows ``(a, b, ebc)`` — unweighted edge betweenness
    (``nx.edge_betweenness_centrality`` semantics; Brandes 2001 §4):
    per source the DAG arc (v,w) with dist(w)=dist(v)+1 carries
    ``σ(v)/σ(w)·(1+δ(w))``, summed over sources and canonicalized to
    the undirected pair a<b.

    Composition, not a new kernel: each source's (dist, σ, δ) state —
    already produced by the vertex-betweenness chassis runs — is
    broadcast (``ray.put``) and joined onto the edge table with one
    vectorized searchsorted pass; contributions are pre-combined per
    (a, b) inside each batch, and one final groupby sums across
    sources.  Scale note: the broadcast is V·4 doubles per source —
    the same ≲20M-vertex broadcast bound as the vid maps; past it,
    swap the lookup for two co-partitioned hash joins (the
    ``stages/join.py`` path).

    ``edges`` is the arc table the graph was built from (either
    orientation set); it is canonicalized internally so parallel arcs
    do not double-count.
    """
    from igraph_ray.kernels.triangles import canonical_edges

    vids = _all_vids(graph)
    n = len(vids)
    if sources is None:
        if k is None or k >= n:
            sources = vids.tolist()
        else:
            order = np.argsort(hash_int64(vids), kind="stable")
            sources = np.sort(vids[order[:k]]).tolist()
    scale = 1.0
    if k is not None and 0 < k < n:
        scale *= n / float(len(sources))
    if not directed:
        scale *= 0.5
    if normalized and n > 1:
        scale *= (
            1.0 / (n * (n - 1)) if directed else 2.0 / (n * (n - 1))
        )

    simple = canonical_edges(edges).materialize()

    from concurrent.futures import ThreadPoolExecutor

    def source_contrib(s: int) -> ray.data.Dataset:
        state = _single_source_state(graph, int(s))
        tbl = pa.concat_tables(
            state.iter_batches(batch_format="pyarrow", batch_size=None)
        )
        vid = tbl.column("vid").to_numpy(zero_copy_only=False)
        order = np.argsort(vid)
        ref = ray.put(
            (
                vid[order],
                tbl.column("dist").to_numpy(zero_copy_only=False)[order],
                tbl.column("sigma").to_numpy(zero_copy_only=False)[order],
                tbl.column("delta").to_numpy(zero_copy_only=False)[order],
            )
        )

        def contrib(batch: pa.Table) -> pa.Table:
            svid, dist, sigma, delta = ray.get(ref)
            a = batch.column("src").to_numpy(zero_copy_only=False)
            b = batch.column("dst").to_numpy(zero_copy_only=False)
            # both orientations of each canonical edge
            v = np.concatenate([a, b])
            w = np.concatenate([b, a])
            pv = np.searchsorted(svid, v)
            pw = np.searchsorted(svid, w)
            m = (dist[pw] == dist[pv] + 1.0) & np.isfinite(dist[pv])
            v, w, pv, pw = v[m], w[m], pv[m], pw[m]
            val = sigma[pv] / sigma[pw] * (1.0 + delta[pw])
            lo = np.minimum(v, w)
            hi = np.maximum(v, w)
            return pa.table(
                {
                    "a": pa.array(lo),
                    "b": pa.array(hi),
                    "ebc": pa.array(val),
                }
            )

        return simple.map_batches(
            contrib, batch_format="pyarrow", zero_copy_batch=True
        )

    with ThreadPoolExecutor(max_workers=min(8, len(sources))) as pool:
        parts = list(pool.map(source_contrib, sources))

    def zero_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": pa.array(np.minimum(s, d)),
                "b": pa.array(np.maximum(s, d)),
                "ebc": pa.array(np.zeros(len(s), np.float64)),
            }
        )

    merged = simple.map_batches(
        zero_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    for d in parts:
        merged = merged.union(d)
    summed = merged.groupby(["a", "b"]).aggregate(
        Sum("ebc", alias_name="ebc_sum")
    )

    def rescale(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "ebc": pa.array(
                    batch.column("ebc_sum").to_numpy(zero_copy_only=False)
                    * scale
                ),
            }
        )

    return summed.map_batches(
        rescale, batch_format="pyarrow", zero_copy_batch=True
    )


def betweenness_centrality(
    graph: GraphMeta,
    k: int | None = None,
    normalized: bool = True,
    directed: bool = False,
    sources: list[int] | None = None,
    weighted: bool = False,
) -> ray.data.Dataset:
    """Rows ``(vid, betweenness)``.

    ``k`` samples k pivots (deterministic: the k vids with smallest
    ``splitmix64(vid)``) and rescales by ``n/k``
    (``nx.betweenness_centrality(G, k=...)`` estimator); ``sources``
    overrides pivot selection (no rescale unless ``k`` given).
    ``directed=False`` halves the sums (each undirected pair counted
    from both sides) — the graph itself must already be symmetrized.
    ``weighted=True`` uses the graph's edge weights as distances
    (``nx.betweenness_centrality(G, weight=...)``; strictly positive
    weights required) via the weighted-Brandes kernels.
    """
    if weighted:
        from igraph_ray.kernels.weighted_brandes import (
            validate_positive_weights,
        )

        validate_positive_weights(graph)
    vids = _all_vids(graph)
    n = len(vids)
    if sources is None:
        if k is None or k >= n:
            sources = vids.tolist()
        else:
            order = np.argsort(hash_int64(vids), kind="stable")
            sources = np.sort(vids[order[:k]]).tolist()
    scale = 1.0
    if k is not None and 0 < k < n:
        scale *= n / float(len(sources))
    if not directed:
        scale *= 0.5
    if normalized and n > 2:
        scale *= (
            1.0 / ((n - 1) * (n - 2))
            if directed
            else 2.0 / ((n - 1) * (n - 2))
        )

    if weighted:
        from igraph_ray.kernels.weighted_brandes import (
            single_source_weighted_dependencies as _dep_fn,
        )
    else:
        _dep_fn = _single_source_dependencies

    # each source's chassis runs are driver-side loops dominated by
    # waiting on Ray Data executions — drive several concurrently from
    # threads so per-iteration fixed costs overlap
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, len(sources))) as pool:
        deps = list(pool.map(lambda s: _dep_fn(graph, int(s)), sources))
    merged = deps[0]
    for d in deps[1:]:
        merged = merged.union(d)
    summed = merged.groupby("vid").aggregate(Sum("delta", alias_name="bc"))

    def rescale(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "betweenness": pa.array(
                    batch.column("bc").to_numpy(zero_copy_only=False) * scale
                ),
            }
        )

    return summed.map_batches(
        rescale, batch_format="pyarrow", zero_copy_batch=True
    )


def shortest_path_counts(
    graph: GraphMeta, source: int
) -> ray.data.Dataset:
    """(vid, dist, sigma) for every vertex reachable from ``source``
    in the unweighted graph — ``sigma`` is the exact number of
    distinct shortest source→vid paths (igraph
    ``get_all_shortest_paths`` cardinality / the Brandes forward
    phase exposed on its own).

    Unreachable vertices are dropped.  Counts are accumulated in
    float64 by the level-synchronous kernel and cast back to int64,
    exact while every sigma < 2**53 (far beyond any real graph's
    shortest-path multiplicity at the diameters this engine targets —
    the cast raises if exactness would be lost).
    """
    fwd = run_kernel(
        _BrandesForward(num_parts=graph.num_parts, source=source),
        graph,
        max_iter=100_000,
    )

    def project(batch: pa.Table) -> pa.Table:
        vid = batch.column("vid").to_numpy(zero_copy_only=False)
        d = batch.column("dist").to_numpy(zero_copy_only=False)
        s = batch.column("sigma").to_numpy(zero_copy_only=False)
        keep = np.isfinite(d)
        vid, d, s = vid[keep], d[keep], s[keep]
        if len(s) and float(s.max()) >= 2.0**53:  # pragma: no cover
            raise OverflowError(
                "sigma exceeds float64 integer range; counts would "
                "not be exact"
            )
        return pa.table(
            {
                "vid": pa.array(vid.astype(np.int64)),
                "dist": pa.array(d.astype(np.int64)),
                "sigma": pa.array(s.astype(np.int64)),
            }
        )

    return fwd.state.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
