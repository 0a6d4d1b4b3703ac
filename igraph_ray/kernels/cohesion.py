"""Cohesive blocking — igraph ``cohesive_blocks`` (Moody & White
2003, "Structural cohesion and embeddedness: a hierarchical concept
of social groups"; igraph's implementation recurses on minimum-size
vertex separators).

Algorithm: starting from the whole graph, compute the vertex
connectivity k of the current block, collect minimum-size vertex
separators, remove each separator and queue every resulting
component (augmented with the separator) as a candidate child block;
recurse until blocks stop shrinking.  Post-process igraph-style:
drop blocks contained in another block of >= cohesion, dedupe, and
re-derive the parent as the smallest strictly-enclosing surviving
block.

Distributed shape — DOCUMENTED BOUNDED-GATHER operator, the same
policy as ``kernels/maxflow.py`` / CNM: the recursion interleaves
many small max-flow solves with data-dependent control flow, so the
collapsed arc table ships to ONE Ray task (``gather_max_arcs``
bound); the parallel-arc collapse shuffle runs on the cluster.
Cohesive blocking is a sociology-scale analysis (igraph documents
the same scope); at 100-TB scale run it on a community quotient.

Separator enumeration: for every Even/Whitney candidate pair (the
min-degree pivot against non-neighbours, plus pivot-neighbour
pairs) whose s-t vertex connectivity equals k, the node-split Dinic
residual yields BOTH canonical minimum cuts (source-side minimal and
sink-side minimal, Picard-Queyranne extremes).  The brute-force
oracle in ``tests/test_cohesion.py`` instead enumerates ALL
size-k separators by subset enumeration and runs the same recursion
— the fast path must reproduce its block/cohesion sets exactly on
random small graphs, so the pair-cut enumeration is empirically
complete at oracle scale (any gap would fail the gate loudly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.kernels.maxflow import _dinic_py
from igraph_ray.stages.symmetrize import symmetrize_dedup

GATHER_MAX_ARCS_CB = 2_000_000


def _components_of(n: int, adj: list[set[int]], alive: np.ndarray):
    """Connected components over ``alive`` vertices (local BFS)."""
    seen = np.zeros(n, dtype=bool)
    out = []
    for s in range(n):
        if not alive[s] or seen[s]:
            continue
        comp = [s]
        seen[s] = True
        stack = [s]
        while stack:
            v = stack.pop()
            for w in adj[v]:
                if alive[w] and not seen[w]:
                    seen[w] = True
                    comp.append(w)
                    stack.append(w)
        out.append(frozenset(comp))
    return out


def _pair_cuts(
    n: int,
    split_src: np.ndarray,
    split_dst: np.ndarray,
    internal_ok: np.ndarray,
    s: int,
    t: int,
    k_cap: int | None,
) -> tuple[int, list[frozenset]]:
    """κ(s, t) on the node-split graph plus the two Picard-Queyranne
    extreme minimum vertex cuts (source-minimal from forward residual
    reach, sink-minimal from the reverse)."""
    keep = internal_ok.copy()
    keep[s] = False
    keep[t] = False
    isrc = np.flatnonzero(keep)
    src = np.concatenate([split_src, isrc])
    dst = np.concatenate([split_dst, isrc + n])
    cap = np.ones(len(src), dtype=np.int64)
    value, _flow, reach = _dinic_py(
        2 * n, src, dst, cap, s + n, t, False, cutoff=None
    )
    cuts: list[frozenset] = []
    cut1 = frozenset(
        int(v) for v in isrc if reach[v] and not reach[v + n]
    )
    if len(cut1) == value:
        cuts.append(cut1)
    # sink-side extreme: flow on the reversed graph
    value2, _f2, reach2 = _dinic_py(
        2 * n, dst, src, cap, t, s + n, False, cutoff=None
    )
    cut2 = frozenset(
        int(v) for v in isrc if reach2[v + n] and not reach2[v]
    )
    if len(cut2) == value2 == value:
        cuts.append(cut2)
    return int(value), cuts


def _kappa_and_separators(
    vs: np.ndarray, adj_pairs: set[tuple[int, int]]
) -> tuple[int, list[frozenset]]:
    """Vertex connectivity of the induced simple graph on ``vs`` and
    the minimum separators found from the Even/Whitney pair sweep.
    Vertices are given by ORIGINAL labels; returns original-label
    cutsets."""
    n = len(vs)
    pos = {int(v): i for i, v in enumerate(vs)}
    pairs_local = [
        (pos[a], pos[b])
        for (a, b) in adj_pairs
        if a in pos and b in pos
    ]
    adj = [set() for _ in range(n)]
    for a, b in pairs_local:
        adj[a].add(b)
        adj[b].add(a)
    if n <= 1:
        return 0, []
    deg = np.array([len(x) for x in adj])
    if deg.min() == 0:
        # disconnected inside the block: separator is empty
        return 0, [frozenset()]
    if all(len(adj[v]) == n - 1 for v in range(n)):
        return n - 1, []  # complete: no separator exists
    # node-split arc table (u_out -> v_in both ways)
    e_src, e_dst = [], []
    for a, b in pairs_local:
        e_src += [a + n, b + n]
        e_dst += [b, a]
    split_src = np.asarray(e_src, np.int64)
    split_dst = np.asarray(e_dst, np.int64)
    internal_ok = np.ones(n, dtype=bool)

    v0 = int(np.lexsort((np.arange(n), deg))[0])  # min degree, min id
    cand_pairs = [
        (v0, u) for u in range(n) if u != v0 and u not in adj[v0]
    ]
    nbrs = sorted(adj[v0])
    for i, x in enumerate(nbrs):
        for y in nbrs[i + 1 :]:
            if y not in adj[x]:
                cand_pairs.append((x, y))
    k = int(deg.min())
    seps: dict[int, set[frozenset]] = {}
    for s, t in cand_pairs:
        val, cuts = _pair_cuts(
            n, split_src, split_dst, internal_ok, s, t, None
        )
        if val < k:
            k = val
        for c in cuts:
            seps.setdefault(len(c), set()).add(c)
    # a vertex of minimum degree whose whole neighbourhood is a cut
    if deg.min() == k:
        for v in np.flatnonzero(deg == deg.min()):
            if len(adj[int(v)]) < n - 1:
                seps.setdefault(k, set()).add(
                    frozenset(int(u) for u in adj[int(v)])
                )
    local = sorted(seps.get(k, set()))
    return k, [
        frozenset(int(vs[i]) for i in c) for c in local
    ]


def _cohesive_blocks_py(
    vs_all: np.ndarray, pairs: set[tuple[int, int]]
) -> tuple[list[frozenset], list[int], list[int]]:
    """The Moody-White recursion over original vertex labels.
    Returns (blocks, cohesion, parent) after igraph-style filtering
    (containment in a >=-cohesion block drops a block)."""
    adj_all: dict[int, set[int]] = {}
    for a, b in pairs:
        adj_all.setdefault(a, set()).add(b)
        adj_all.setdefault(b, set()).add(a)

    root = frozenset(int(v) for v in vs_all)
    found: dict[frozenset, int] = {}
    queue: list[frozenset] = [root]
    seen_q: set[frozenset] = {root}
    while queue:
        blk = queue.pop()
        vs = np.array(sorted(blk), np.int64)
        k, seps = _kappa_and_separators(vs, pairs)
        if blk not in found or found[blk] < k:
            found[blk] = k
        n = len(vs)
        pos = {int(v): i for i, v in enumerate(vs)}
        adj_local = [
            set(
                pos[w]
                for w in adj_all.get(int(v), ())
                if w in pos
            )
            for v in vs
        ]
        for sep in seps:
            alive = np.ones(n, dtype=bool)
            for v in sep:
                alive[pos[v]] = False
            for comp in _components_of(n, adj_local, alive):
                child = frozenset(int(vs[i]) for i in comp) | sep
                if len(child) < len(blk) and child not in seen_q:
                    seen_q.add(child)
                    queue.append(child)

    # igraph-style post-filter: drop any block contained in another
    # block of cohesion >= its own (keeps maximal cohesive blocks);
    # singletons and empty sets are never reported
    items = [
        (b, k) for b, k in found.items() if len(b) > 1
    ]
    keep: list[tuple[frozenset, int]] = []
    for b, k in items:
        dominated = any(
            b < b2 and k2 >= k for b2, k2 in items
        )
        if not dominated:
            keep.append((b, k))
    keep.sort(key=lambda x: (-len(x[0]), sorted(x[0])))
    blocks = [b for b, _ in keep]
    cohesion = [k for _, k in keep]
    parent = []
    for i, b in enumerate(blocks):
        p = -1
        for j in range(len(blocks)):
            if i != j and b < blocks[j]:
                if p == -1 or len(blocks[j]) < len(blocks[p]):
                    p = j
        parent.append(p)
    return blocks, cohesion, parent


@ray.remote
def _cb_task(blocks):
    tables = [t for t in ray.get(list(blocks)) if t.num_rows]
    tbl = pa.concat_tables(tables)
    src = tbl.column("src").to_numpy(zero_copy_only=False)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False)
    keep = src < dst
    pairs = {
        (int(a), int(b)) for a, b in zip(src[keep], dst[keep])
    }
    vs = np.unique(np.concatenate([src, dst]))
    blocks_, cohesion, parent = _cohesive_blocks_py(vs, pairs)
    out = pa.table(
        {
            "block": pa.array(
                np.repeat(
                    np.arange(len(blocks_), dtype=np.int64),
                    [len(b) for b in blocks_],
                )
            ),
            "vid": pa.array(
                np.concatenate(
                    [np.array(sorted(b), np.int64) for b in blocks_]
                )
                if blocks_
                else np.empty(0, np.int64)
            ),
        }
    )
    return out, cohesion, parent


def _component_assignment(
    arcs: ray.data.Dataset,
) -> ray.data.Dataset:
    """Distributed (vid, comp) labels of an already-symmetric arc
    table — one temp CSR build + the components kernel (min-label
    propagation); the store is removed afterwards."""
    import shutil
    import tempfile

    from igraph_ray.api import build_graph
    from igraph_ray.kernels.components import connected_components

    tmp = tempfile.mkdtemp(prefix="igr_cb_comp_")
    try:
        graph = build_graph(arcs, tmp, symmetrize=False)
        run = connected_components(graph)
        return run.state.select_columns(["vid", "comp"]).materialize()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _attach_comp(
    arcs: ray.data.Dataset, comp: ray.data.Dataset
) -> ray.data.Dataset:
    """Tag every arc with its (src's) component id.  Broadcast probe
    under the vertex broadcast bound; co-partitioned hash join past
    it (the quotient_graph mode pattern)."""
    from igraph_ray.stages.vertex_ids import BROADCAST_MAX_VERTICES

    if comp.count() <= BROADCAST_MAX_VERTICES:
        amap = pa.concat_tables(
            comp.iter_batches(batch_format="pyarrow", batch_size=None)
        ).sort_by("vid")
        ref = ray.put(
            (
                amap.column("vid").to_numpy(zero_copy_only=False),
                amap.column("comp").to_numpy(zero_copy_only=False),
            )
        )

        class Tag:
            def __init__(self):
                self.vids, self.comps = ray.get(ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                s = batch.column("src").to_numpy(zero_copy_only=False)
                c = self.comps[np.searchsorted(self.vids, s)]
                return batch.append_column(
                    "comp", pa.array(c.astype(np.int64))
                )

        return arcs.map_batches(
            Tag,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        )
    from igraph_ray.stages.join import hash_join

    def rn(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["__v" if c == "vid" else c for c in batch.column_names]
        )

    rhs = comp.map_batches(rn, batch_format="pyarrow", zero_copy_batch=True)
    return hash_join(arcs, rhs, on="src", right_on="__v")


def _cb_group(group: pa.Table) -> pa.Table:
    """Exact cohesive blocking of ONE connected component (a
    map_groups task): rows (comp, block_local, size, coh,
    parent_local, vid); block_local 0 is the component root."""
    if group.num_rows == 0:
        return pa.table(
            {
                "comp": pa.array([], pa.int64()),
                "block_local": pa.array([], pa.int64()),
                "size": pa.array([], pa.int64()),
                "coh": pa.array([], pa.int64()),
                "parent_local": pa.array([], pa.int64()),
                "vid": pa.array([], pa.int64()),
            }
        )
    comp_id = int(group.column("comp")[0].as_py())
    src = group.column("src").to_numpy(zero_copy_only=False)
    dst = group.column("dst").to_numpy(zero_copy_only=False)
    keep = src < dst
    pairs = {(int(a), int(b)) for a, b in zip(src[keep], dst[keep])}
    vs = np.unique(np.concatenate([src, dst]))
    blocks_, cohesion, parent = _cohesive_blocks_py(vs, pairs)
    sizes = [len(b) for b in blocks_]
    return pa.table(
        {
            "comp": pa.array(
                np.full(sum(sizes), comp_id, np.int64)
            ),
            "block_local": pa.array(
                np.repeat(
                    np.arange(len(blocks_), dtype=np.int64), sizes
                )
            ),
            "size": pa.array(
                np.repeat(np.array(sizes, np.int64), sizes)
            ),
            "coh": pa.array(
                np.repeat(np.array(cohesion, np.int64), sizes)
            ),
            "parent_local": pa.array(
                np.repeat(np.array(parent, np.int64), sizes)
            ),
            "vid": pa.array(
                np.concatenate(
                    [np.array(sorted(b), np.int64) for b in blocks_]
                )
                if blocks_
                else np.empty(0, np.int64)
            ),
        }
    )


def _merge_component_trees(
    percomp: ray.data.Dataset, n_components: int
) -> tuple[ray.data.Dataset, list[int], list[int]]:
    """Merge per-component block trees under one global root block
    (the whole vertex set, cohesion 0 — a disconnected graph's vertex
    connectivity).  Global ordering: (-size, min vid) root-first —
    the direct path's (-size, lexicographic members) order up to ties
    beyond the min vid."""
    from ray.data.aggregate import Min

    meta_rows = (
        percomp.select_columns(
            ["comp", "block_local", "size", "coh", "parent_local", "vid"]
        )
        .groupby(["comp", "block_local"])
        .aggregate(Min("vid"), Min("size"), Min("coh"), Min("parent_local"))
        .take_all()
    )  # one row per block — driver-sized like the returned lists
    single = n_components == 1
    metas = sorted(
        meta_rows,
        key=lambda r: (-int(r["min(size)"]), int(r["min(vid)"])),
    )
    offset = 0 if single else 1
    gid = {
        (int(r["comp"]), int(r["block_local"])): i + offset
        for i, r in enumerate(metas)
    }
    cohesion = [int(r["min(coh)"]) for r in metas]
    parent = []
    for r in metas:
        pl = int(r["min(parent_local)"])
        if pl < 0:
            parent.append(-1 if single else 0)
        else:
            parent.append(gid[(int(r["comp"]), pl)])
    if not single:
        cohesion = [0] + cohesion
        parent = [-1] + parent
    gref = ray.put(gid)

    class Remap:
        def __init__(self):
            self.gid = ray.get(gref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            comp = batch.column("comp").to_numpy(zero_copy_only=False)
            bl = batch.column("block_local").to_numpy(
                zero_copy_only=False
            )
            vid = batch.column("vid").to_numpy(zero_copy_only=False)
            blocks = np.array(
                [self.gid[(int(c), int(b))] for c, b in zip(comp, bl)],
                np.int64,
            )
            tbls = [
                pa.table(
                    {"block": pa.array(blocks), "vid": pa.array(vid)}
                )
            ]
            if not single:
                # each component root's members are also the global
                # root's members
                is_root = bl == 0
                if is_root.any():
                    tbls.append(
                        pa.table(
                            {
                                "block": pa.array(
                                    np.zeros(
                                        int(is_root.sum()), np.int64
                                    )
                                ),
                                "vid": pa.array(vid[is_root]),
                            }
                        )
                    )
            return pa.concat_tables(tbls)

    membership = percomp.map_batches(
        Remap,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    return membership, cohesion, parent


def cohesive_blocks(
    edges: ray.data.Dataset,
    gather_max_arcs: int = GATHER_MAX_ARCS_CB,
    auto_coarsen: bool = True,
) -> tuple[ray.data.Dataset, list[int], list[int]]:
    """Cohesive block structure of the undirected simple view of
    ``edges`` (igraph ``cohesive_blocks``).  Returns a
    :class:`~igraph_ray.kernels.coarsen.CommunityResult` unpacking as
    ``(membership, cohesion, parent)``: membership rows
    ``(block, vid)``; ``cohesion[i]`` = vertex connectivity of block
    i; ``parent[i]`` = index of the smallest enclosing block (-1 for
    the root).  Blocks are sorted root-first (descending size).

    Past ``gather_max_arcs`` with ``auto_coarsen=True`` (default):

    1. route per CONNECTED COMPONENT — if every component fits the
       bound, each component's block tree is computed EXACTLY in a
       distributed ``groupby(comp).map_groups`` and the trees merge
       under a global root (cohesion 0); ``approximated`` stays
       ``False``;
    2. otherwise contract to the distributed-Louvain quotient, run on
       the quotient, and project block membership back through the
       assignment (``approximated=True`` — the same recipe as
       fastgreedy/GN/walktrap/spinglass).

    ``auto_coarsen=False`` restores the loud raise."""
    from igraph_ray.kernels.coarsen import CommunityResult

    arcs = symmetrize_dedup(edges, keep_self_loops=False).materialize()
    n_arcs = arcs.count()
    if n_arcs <= gather_max_arcs:
        refs = arcs.select_columns(["src", "dst"]).to_arrow_refs()
        out, cohesion, parent = ray.get(_cb_task.remote(refs))
        return CommunityResult(
            (ray.data.from_arrow(out), cohesion, parent),
            approximated=False,
        )
    if not auto_coarsen:
        raise NotImplementedError(
            f"cohesive_blocks bounded-gather limit: {n_arcs} arcs > "
            f"{gather_max_arcs}; run on a quotient/component subgraph "
            "or raise gather_max_arcs"
        )

    # tier 1: per-connected-component routing (exact)
    comp = _component_assignment(arcs)
    tagged = _attach_comp(arcs, comp).materialize()
    from ray.data.aggregate import Count

    over = (
        tagged.groupby("comp")
        .aggregate(Count())
        .filter(lambda r: r["count()"] > gather_max_arcs)
        .count()
    )
    if over == 0:
        n_components = comp.groupby("comp").count().count()
        percomp = (
            tagged.groupby("comp")
            .map_groups(_cb_group, batch_format="pyarrow")
            .materialize()
        )
        membership, cohesion, parent = _merge_component_trees(
            percomp, n_components
        )
        return CommunityResult(
            (membership, cohesion, parent), approximated=False
        )

    # tier 2: Louvain-quotient approximation
    from igraph_ray.kernels.coarsen import louvain_quotient

    coarse_edges, assignment = louvain_quotient(arcs)
    qres = cohesive_blocks(
        coarse_edges, gather_max_arcs, auto_coarsen=False
    )
    qmem, cohesion, parent = qres
    qtbl = pa.concat_tables(
        [
            t
            for t in qmem.iter_batches(
                batch_format="pyarrow", batch_size=None
            )
            if t.num_rows
        ]
        or [
            pa.table(
                {
                    "block": pa.array([], pa.int64()),
                    "vid": pa.array([], pa.int64()),
                }
            )
        ]
    )
    order = np.argsort(
        qtbl.column("vid").to_numpy(zero_copy_only=False), kind="stable"
    )
    q_vid = qtbl.column("vid").to_numpy(zero_copy_only=False)[order]
    q_blk = qtbl.column("block").to_numpy(zero_copy_only=False)[order]
    pref = ray.put((q_vid, q_blk))

    class Project:
        """(vid, community) -> one (block, vid) row per quotient
        block containing the vertex's community (ragged gather)."""

        def __init__(self):
            self.q_vid, self.q_blk = ray.get(pref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vid = batch.column("vid").to_numpy(zero_copy_only=False)
            com = batch.column("community").to_numpy(
                zero_copy_only=False
            )
            lo = np.searchsorted(self.q_vid, com, "left")
            hi = np.searchsorted(self.q_vid, com, "right")
            lens = hi - lo
            total = int(lens.sum())
            if total == 0:
                return pa.table(
                    {
                        "block": pa.array([], pa.int64()),
                        "vid": pa.array([], pa.int64()),
                    }
                )
            out_vid = np.repeat(vid, lens)
            cum = np.concatenate([[0], np.cumsum(lens)[:-1]])
            idx = (
                np.repeat(lo, lens)
                + np.arange(total)
                - np.repeat(cum, lens)
            )
            return pa.table(
                {
                    "block": pa.array(self.q_blk[idx]),
                    "vid": pa.array(out_vid),
                }
            )

    membership = assignment.map_batches(
        Project,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    return CommunityResult(
        (membership, cohesion, parent), approximated=True
    )
