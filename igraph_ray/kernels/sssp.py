"""Shortest paths: BFS hop counts and weighted SSSP (min-plus).

Covers igraph's ``igraph_distances`` / ``Graph.distances`` surface for
one or more source vertices (multi-source = min over sources), matching
``networkx.single_source_shortest_path_length`` (unweighted hops) and
``networkx.single_source_dijkstra_path_length`` (weighted) at the
converged fixed point.

Same chassis as connected components (``kernels/base.py``): per
iteration every *changed* vertex relaxes its out-edges —
``candidate(dst) = dist(src) + w`` — messages are pre-combined per
(source partition, dst) with one ``np.minimum.reduceat`` over the CSR
combine segments, and apply takes the min per destination.  This is
distributed Bellman-Ford with a frontier: iteration count is
O(shortest-path hop depth); on non-negative weights it converges to
Dijkstra's distances.  Negative cycles do not converge — guarded by
``max_iter`` (negative edge weights are allowed but unusual for this
engine's link graphs).

Unreachable vertices keep ``dist = +inf`` (networkx omits them from
its result dict; callers filter ``isfinite`` for that view).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from igraph_ray.kernels.base import KernelRun, run_kernel
from igraph_ray.stages.partition import GraphMeta

MSG_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("val", pa.float64()),
        ("old", pa.float64()),
    ]
)

_INF = np.inf


@dataclass
class SSSPKernel:
    num_parts: int
    #: sorted source vids (multi-source: dist = min over sources)
    sources: np.ndarray
    #: True → every edge counts 1 hop (BFS); False → CSR edge weights
    unit_weights: bool = False

    state_value_cols: dict = field(
        default_factory=lambda: {"dist": np.float64, "changed": np.int64}
    )
    metric_cols: tuple = ("changed",)
    message_schema: pa.Schema = MSG_SCHEMA

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        vids = csr.get("vids", np.empty(0, np.int64))
        dist = np.full(len(vids), _INF, np.float64)
        pos = np.searchsorted(vids, self.sources)
        pos_c = np.clip(pos, 0, max(0, len(vids) - 1))
        hit = (len(vids) > 0) & (vids[pos_c] == self.sources)
        dist[pos_c[hit]] = 0.0
        return {
            "dist": dist,
            "changed": (dist == 0.0).astype(np.int64),
        }

    def scatter(self, csr, sb) -> pa.Table:
        # absent rows have changed=0 (neutral fill) → contribute nothing;
        # min is idempotent so partial batches compose.
        dist = sb.aligned["dist"]
        changed = sb.aligned["changed"].astype(bool) & sb.present

        if len(csr.get("src_pos", ())):
            w = (
                np.ones(len(csr["src_pos"]), np.float64)
                if self.unit_weights
                else np.asarray(csr["w"], np.float64)
            )
            vals = np.where(
                changed[csr["src_pos"]], dist[csr["src_pos"]] + w, _INF
            )
            seg_min = np.minimum.reduceat(vals, csr["seg_start"])
            live = np.isfinite(seg_min)
            m_part = csr["seg_dst_part"][live]
            m_dst = csr["seg_dst"][live]
            m_val = seg_min[live]
        else:
            m_part = np.empty(0, np.int32)
            m_dst = np.empty(0, np.int64)
            m_val = np.empty(0, np.float64)

        self_vids = sb.vids
        self_dist = sb.values["dist"]
        n_self = len(self_vids)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate(
                        [m_part, np.full(n_self, sb.part, np.int32)]
                    )
                ),
                "dst": pa.array(np.concatenate([m_dst, self_vids])),
                "val": pa.array(np.concatenate([m_val, self_dist])),
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
        old = group.column("old").to_numpy(zero_copy_only=False)

        order = np.argsort(dst, kind="stable")
        dst, val, old = dst[order], val[order], old[order]
        if len(dst):
            boundary = np.empty(len(dst), dtype=bool)
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
            seg = np.flatnonzero(boundary)
            vids = dst[seg]
            new = np.minimum.reduceat(val, seg)
            old_min = np.minimum.reduceat(old, seg)
        else:
            vids = np.empty(0, np.int64)
            new = np.empty(0, np.float64)
            old_min = np.empty(0, np.float64)

        changed = (new < old_min).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "dist": pa.array(new),
                "changed": pa.array(changed),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        return metrics["changed"] == 0.0


def shortest_paths(
    graph: GraphMeta,
    sources: list[int] | np.ndarray,
    weighted: bool = True,
    max_iter: int = 10_000,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> KernelRun:
    """Distances from ``sources`` (min over sources when several);
    final state rows are ``(part, vid, dist, changed)`` with
    ``dist = +inf`` for unreachable vertices.

    ``weighted=False`` = BFS hop counts
    (``nx.single_source_shortest_path_length``); ``weighted=True`` uses
    the graph's edge weights
    (``nx.single_source_dijkstra_path_length`` on non-negative
    weights)."""
    src = np.unique(np.asarray(sources, np.int64))
    if len(src) == 0:
        raise ValueError("shortest_paths requires at least one source")
    kernel = SSSPKernel(
        num_parts=graph.num_parts, sources=src, unit_weights=not weighted
    )
    run = run_kernel(
        kernel,
        graph,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )
    if not run.converged:
        raise RuntimeError(
            f"shortest_paths did not converge in {max_iter} iterations "
            "(negative cycle, or raise max_iter)"
        )
    return run


PARENT_MSG_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("val", pa.float64()),
        ("parent", pa.int64()),
        ("old", pa.float64()),
        ("old_parent", pa.int64()),
    ]
)

_NO_PARENT = np.int64(-1)


@dataclass
class SSSPParentKernel(SSSPKernel):
    """SSSP with deterministic parent pointers — the
    ``igraph_get_shortest_paths`` / ``nx.single_source_dijkstra``
    predecessor surface.  Among equal-distance relaxations the parent
    is the smallest source vid (deterministic across runs, resumes and
    partitionings), so the shortest-path tree is unique."""

    message_schema: pa.Schema = PARENT_MSG_SCHEMA

    def __post_init__(self):
        self.state_value_cols = {
            "dist": np.float64,
            "parent": np.int64,
            "changed": np.int64,
        }

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        base = super().init_state(csr, part)
        base["parent"] = np.full(
            len(base["dist"]), _NO_PARENT, np.int64
        )
        return base

    def scatter(self, csr, sb) -> pa.Table:
        dist = sb.aligned["dist"]
        changed = sb.aligned["changed"].astype(bool) & sb.present

        if len(csr.get("src_pos", ())):
            w = (
                np.ones(len(csr["src_pos"]), np.float64)
                if self.unit_weights
                else np.asarray(csr["w"], np.float64)
            )
            vals = np.where(
                changed[csr["src_pos"]], dist[csr["src_pos"]] + w, _INF
            )
            seg_min = np.minimum.reduceat(vals, csr["seg_start"])
            # parent achieving the min, smallest src vid on ties: a
            # second reduceat over src vids masked to the minimal arcs
            seg_lens = np.diff(np.r_[csr["seg_start"], len(vals)])
            seg_of_arc = np.repeat(
                np.arange(len(csr["seg_start"])), seg_lens
            )
            src_vids = csr["vids"][csr["src_pos"]]
            at_min = vals == seg_min[seg_of_arc]
            big = np.int64(np.iinfo(np.int64).max)
            seg_parent = np.minimum.reduceat(
                np.where(at_min, src_vids, big), csr["seg_start"]
            )
            live = np.isfinite(seg_min)
            m_part = csr["seg_dst_part"][live]
            m_dst = csr["seg_dst"][live]
            m_val = seg_min[live]
            m_parent = seg_parent[live]
        else:
            m_part = np.empty(0, np.int32)
            m_dst = np.empty(0, np.int64)
            m_val = np.empty(0, np.float64)
            m_parent = np.empty(0, np.int64)

        n_self = len(sb.vids)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate(
                        [m_part, np.full(n_self, sb.part, np.int32)]
                    )
                ),
                "dst": pa.array(np.concatenate([m_dst, sb.vids])),
                "val": pa.array(
                    np.concatenate(
                        [m_val, np.full(n_self, _INF, np.float64)]
                    )
                ),
                "parent": pa.array(
                    np.concatenate(
                        [m_parent, np.full(n_self, _NO_PARENT)]
                    )
                ),
                "old": pa.array(
                    np.concatenate(
                        [np.full(len(m_dst), _INF), sb.values["dist"]]
                    )
                ),
                "old_parent": pa.array(
                    np.concatenate(
                        [
                            np.full(len(m_dst), _NO_PARENT),
                            sb.values["parent"],
                        ]
                    )
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        val = group.column("val").to_numpy(zero_copy_only=False)
        parent = group.column("parent").to_numpy(zero_copy_only=False)
        old = group.column("old").to_numpy(zero_copy_only=False)
        old_parent = group.column("old_parent").to_numpy(
            zero_copy_only=False
        )

        # first row per dst after this sort = (min val, min parent)
        order = np.lexsort((parent, val, dst))
        dst, val, parent, old, old_parent = (
            dst[order],
            val[order],
            parent[order],
            old[order],
            old_parent[order],
        )
        if len(dst):
            boundary = np.empty(len(dst), dtype=bool)
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
            seg = np.flatnonzero(boundary)
            vids = dst[seg]
            new = val[seg]
            new_parent = parent[seg]
            old_min = np.minimum.reduceat(old, seg)
            # the incumbent parent rides the self row (old < inf)
            inc_parent = np.minimum.reduceat(
                np.where(
                    old_parent == _NO_PARENT,
                    np.int64(np.iinfo(np.int64).max),
                    old_parent,
                ),
                seg,
            )
            inc_parent = np.where(
                inc_parent == np.iinfo(np.int64).max, _NO_PARENT, inc_parent
            )
        else:
            vids = np.empty(0, np.int64)
            new = np.empty(0, np.float64)
            new_parent = np.empty(0, np.int64)
            old_min = np.empty(0, np.float64)
            inc_parent = np.empty(0, np.int64)

        improved = new < old_min
        # equal-distance rediscovery must NOT change the parent (the
        # incumbent was chosen deterministically when dist first hit
        # this value), so ties keep the old pointer
        out_dist = np.where(improved, new, old_min)
        out_parent = np.where(improved, new_parent, inc_parent)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "dist": pa.array(out_dist),
                "parent": pa.array(out_parent),
                "changed": pa.array(improved.astype(np.int64)),
            }
        )


def shortest_path_tree(
    graph: GraphMeta,
    source: int,
    weighted: bool = True,
    max_iter: int = 10_000,
) -> KernelRun:
    """Single-source shortest-path TREE: state rows ``(vid, dist,
    parent)`` with ``parent = -1`` for the source and unreachable
    vertices.  Deterministic (smallest-parent tie-break)."""
    kernel = SSSPParentKernel(
        num_parts=graph.num_parts,
        sources=np.asarray([source], np.int64),
        unit_weights=not weighted,
    )
    run = run_kernel(kernel, graph, max_iter=max_iter)
    if not run.converged:
        raise RuntimeError(
            f"shortest_path_tree did not converge in {max_iter} iterations"
        )
    return run


def trace_path(
    state,
    source: int,
    target: int,
    max_hops: int = 100_000,
    tree_dir: str | None = None,
):
    """Walk parent pointers from ``target`` back to ``source``; returns
    the vid path source→target, or ``[]`` if unreachable.

    Below the engine-wide broadcast bound the (vid, parent) map — two
    int64 columns — is collected ONCE and the walk is pure numpy.
    Past the bound the tree is persisted ONCE as vid-range-bucketed
    parquet (``state/parent_tree.py``) and the walk reads LRU-cached
    1M-row buckets — either way exactly one dataset execution per
    path, never a per-hop filter re-execution.  Pass ``tree_dir`` to
    keep (and reuse) the persisted store across many path queries on
    the same tree; with ``tree_dir=None`` a temp store is used and
    removed after the walk."""
    from igraph_ray.stages.vertex_ids import BROADCAST_MAX_VERTICES

    state = state.materialize()
    if state.count() <= BROADCAST_MAX_VERTICES:
        import pyarrow as _pa

        tbl = _pa.concat_tables(
            state.select_columns(["vid", "parent"]).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        ).sort_by("vid")
        vids = tbl.column("vid").to_numpy(zero_copy_only=False)
        parents = tbl.column("parent").to_numpy(zero_copy_only=False)

        def _parent_of(v: int) -> int | None:
            i = int(np.searchsorted(vids, v))
            if i >= len(vids) or vids[i] != v:
                return None
            return int(parents[i])

        path = [int(target)]
        cur = int(target)
        for _ in range(max_hops):
            if cur == source:
                return list(reversed(path))
            p = _parent_of(cur)
            if p is None or p < 0:
                return []
            path.append(p)
            cur = p
        raise RuntimeError("path trace exceeded max_hops (cycle?)")

    import shutil
    import tempfile

    from igraph_ray.state.parent_tree import (
        ParentTree,
        persist_parent_tree,
        tree_fingerprint,
    )

    keep = tree_dir is not None
    # identity ties the persisted store to THIS state/source — a
    # meta.json alone is not enough (same tree_dir reused for a new
    # source or a rerun would silently trace the stale tree)
    identity = {
        "source": int(source),
        "fingerprint": tree_fingerprint(state),
    }
    if keep and os.path.exists(os.path.join(tree_dir, "meta.json")):
        tree = ParentTree(tree_dir)
        if tree.identity != identity:
            tree = persist_parent_tree(state, tree_dir, identity=identity)
    else:
        out_dir = tree_dir or tempfile.mkdtemp(prefix="igr_ptree_")
        tree = persist_parent_tree(state, out_dir, identity=identity)
    try:
        return tree.trace(source, target, max_hops=max_hops)
    finally:
        if not keep:
            shutil.rmtree(tree.tree_dir, ignore_errors=True)
