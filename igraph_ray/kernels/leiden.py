"""Leiden community detection (deterministic distributed variant).

Reference semantics: Traag, Waltman & van Eck, *From Louvain to
Leiden: guaranteeing well-connected communities* (Sci. Rep. 9:5233,
2019) — the algorithm Graphina/igraph expose as
``community_leiden``.  networkx 3.6 ships no Leiden, so validation
(tests/test_leiden.py) is against the paper's structural guarantee —
every refined sub-community's induced subgraph is CONNECTED, the
property plain Louvain lacks — plus modularity parity with our
Louvain kernel and exact recovery on unambiguous fixtures.

Per level (Louvain's two phases become three):

1. **local moves** — identical machinery to
   ``kernels/louvain.py:_one_level`` (synchronous parity-scheduled
   rounds, deterministic smallest-id tie-breaks), seeded with the
   previous level's community constraint instead of singletons;
2. **refinement** — within each local-move community, restart from
   singletons and let each still-singleton vertex merge into the
   neighbouring sub-community (same community only) with the best
   positive modularity gain ``w(v,C)/m − γ·k_v·K_C/(2m²)``.  A vertex
   only ever merges along an incident edge, so every sub-community is
   connected by induction — the paper's guarantee.  Deliberate
   deviation (SURVEY.md §2.3(1) precedent): the paper samples the
   target sub-community randomly ∝ exp(ΔQ/θ); a distributed engine
   cannot replay that sequential RNG, so we take the deterministic
   argmax (ties → smallest sub id), which the paper notes as the
   θ→0 limit;
3. **coarsen on the REFINED partition** — sub-communities become
   vertices (weights sum, internal weight → self-loop, exactly
   ``louvain.py:_gen_graph`` semantics), and the next level's local
   moves start from the constraint "each sub-community belongs to its
   local-move community".

Distributed shape: local moves reuse the Louvain chassis (arcs
hash-partitioned by src once per level, shuffle-free rounds).
Refinement groups the level's intra-community arcs by community
(``groupby("comm").map_groups``) — every community refines
independently and in parallel, with only the O(V-per-community)
subgraph in memory; the global (vid → weighted-degree) map is
broadcast once per level via ``ray.put``.  Communities larger than
``refine_group_cap`` arcs skip refinement (identity sub-partition —
still a valid partition, documented skew guard).  Like Louvain's
broadcast mode, the driver holds O(V) label arrays per level; the
same ``BROADCAST_MAX_VERTICES`` bound applies (join-mode Leiden is
future work — the constraint map adds two joins per round to the
Louvain join path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.kernels.louvain import (
    BROADCAST_MAX_VERTICES,
    _graph_size_m,
    _internal_weight,
    _one_level,
    _stot_arrays,
)
from igraph_ray.stages.symmetrize import symmetrize_dedup


def _refine_community(
    group: pa.Table,
    k_ref,
    m: float,
    gamma: float,
    cap: int,
) -> pa.Table:
    """Refine ONE community's intra-community subgraph (arcs in both
    directions, no self-loops): one deterministic pass over member
    vertices in ascending vid; a vertex still alone in its
    sub-community may merge into the neighbouring sub with the best
    positive gain.  Returns ``(vid, sub)`` for every member that has
    at least one intra-community edge (isolated members stay
    singleton by default on the driver side)."""
    src = group.column("src").to_numpy(zero_copy_only=False)
    dst = group.column("dst").to_numpy(zero_copy_only=False)
    w = group.column("weight").to_numpy(zero_copy_only=False)

    nodes = np.unique(src)  # arcs are bidirectional → every member
    if group.num_rows > cap:  # skew guard: identity refinement
        return pa.table(
            {"vid": pa.array(nodes), "sub": pa.array(nodes)}
        )

    vids_all, k_all = ray.get(k_ref)
    k_nodes = k_all[np.searchsorted(vids_all, nodes)]

    order = np.lexsort((dst, src))
    s2, d2, w2 = src[order], dst[order], w[order]
    lo = np.searchsorted(s2, nodes, side="left")
    hi = np.searchsorted(s2, nodes, side="right")
    d2_idx = np.searchsorted(nodes, d2)  # neighbour → position

    n = len(nodes)
    sub_pos = np.arange(n)  # position of each vertex's sub label
    size = np.ones(n, dtype=np.int64)
    ktot = k_nodes.copy()  # Σ k over each sub (indexed by label pos)

    inv2m2 = gamma / (2.0 * m * m)
    for i in range(n):
        if size[i] != 1:  # only still-singleton vertices move
            continue
        nb_pos = d2_idx[lo[i] : hi[i]]
        nb_w = w2[lo[i] : hi[i]]
        cand_pos = sub_pos[nb_pos]
        uniq, inv = np.unique(cand_pos, return_inverse=True)
        w2s = np.bincount(inv, weights=nb_w)
        gain = w2s / m - ktot[uniq] * (k_nodes[i] * inv2m2)
        best = int(np.argmax(gain))  # ties → first = smallest label
        if gain[best] <= 1e-15:
            continue
        tgt = int(uniq[best])
        sub_pos[i] = tgt
        size[i] = 0  # i's own (now empty) label slot
        size[tgt] += 1
        ktot[tgt] += k_nodes[i]

    return pa.table(
        {"vid": pa.array(nodes), "sub": pa.array(nodes[sub_pos])}
    )


def _refine(
    arcs: ray.data.Dataset,
    vids: np.ndarray,
    comm: np.ndarray,
    k: np.ndarray,
    m: float,
    gamma: float,
    cap: int,
) -> np.ndarray:
    """Refined sub-partition of the local-move partition; returns the
    ``sub`` label array aligned to ``vids`` (label = member vid)."""
    comm_ref = ray.put((vids, comm))
    k_ref = ray.put((vids, k))

    def intra(batch: pa.Table) -> pa.Table:
        v_all, c_all = ray.get(comm_ref)
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        w = batch.column("weight").to_numpy(zero_copy_only=False)
        keep = src != dst
        src, dst, w = src[keep], dst[keep], w[keep]
        cs = c_all[np.searchsorted(v_all, src)]
        cd = c_all[np.searchsorted(v_all, dst)]
        same = cs == cd
        return pa.table(
            {
                "comm": pa.array(cs[same]),
                "src": pa.array(src[same]),
                "dst": pa.array(dst[same]),
                "weight": pa.array(w[same]),
            }
        )

    def refine_fn(group: pa.Table) -> pa.Table:
        return _refine_community(group, k_ref, m, gamma, cap)

    out = (
        arcs.map_batches(intra, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("comm")
        .map_groups(refine_fn, batch_format="pyarrow")
    )
    sub = vids.copy()  # isolated-in-community members stay singleton
    for batch in out.iter_batches(batch_format="pyarrow", batch_size=None):
        bv = batch.column("vid").to_numpy(zero_copy_only=False)
        bs = batch.column("sub").to_numpy(zero_copy_only=False)
        sub[np.searchsorted(vids, bv)] = bs
    return sub


def leiden(
    edges: ray.data.Dataset,
    resolution: float = 1.0,
    threshold: float = 1e-7,
    max_levels: int = 10,
    max_rounds_per_level: int = 50,
    refine_group_cap: int = 5_000_000,
) -> tuple[ray.data.Dataset, list[float]]:
    """Leiden communities over the undirected weighted view of
    ``edges`` (parallel arcs collapse with summed weight, self-loops
    kept — the Louvain kernel's conventions).

    Returns ``(assignment, level_modularities)``: ``assignment`` has
    rows ``(vid, community)`` where community labels are member vids
    of the final local-move partition; ``level_modularities`` is the
    modularity of the local-move partition after each level
    (``nx.community.modularity(..., weight='weight')`` semantics).
    """
    arcs = symmetrize_dedup(edges, keep_self_loops=True).materialize()
    m = _graph_size_m(arcs)
    if m <= 0:
        raise ValueError("leiden requires a non-empty weighted graph")

    assign_v: np.ndarray | None = None  # level-0 vids (sorted)
    assign_cur: np.ndarray | None = None  # level-0 vid → current vertex
    out_comm: np.ndarray | None = None
    mods: list[float] = []
    prev_q = -np.inf
    init_comm: tuple[np.ndarray, np.ndarray] | None = None

    for _level in range(max_levels):
        vids, comm, k, improved = _one_level(
            arcs, m, resolution, max_rounds_per_level, init_comm=init_comm
        )
        if len(vids) > BROADCAST_MAX_VERTICES:  # pragma: no cover
            raise NotImplementedError(
                "leiden level exceeds the broadcast vid→comm bound; "
                "join-mode leiden is not implemented"
            )
        internal = _internal_weight(arcs, ray.put((vids, comm)))
        _ids, stot, _size = _stot_arrays(vids, comm, k)
        q = internal / m - resolution * float((stot**2).sum()) / (
            4.0 * m * m
        )
        mods.append(q)

        if assign_v is None:
            assign_v = vids.copy()
            assign_cur = vids.copy()
            out_comm = comm.copy()
        else:
            pos = np.searchsorted(vids, assign_cur)
            out_comm = comm[pos]

        if not improved or q - prev_q <= threshold:
            break
        prev_q = q

        sub = _refine(arcs, vids, comm, k, m, resolution, refine_group_cap)
        pos = np.searchsorted(vids, assign_cur)
        assign_cur = sub[pos]
        uniq_sub, first_idx = np.unique(sub, return_index=True)
        init_comm = (uniq_sub, comm[first_idx])

        # coarsen on the refined partition (communities → vertices,
        # weights sum, internal weight → self-loop; _gen_graph rule)
        lvl_ref = ray.put((vids, sub))

        def coarse(batch: pa.Table, _r=lvl_ref) -> pa.Table:
            v_all, s_all = ray.get(_r)
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            w = batch.column("weight").to_numpy(zero_copy_only=False)
            keep = src <= dst  # one-arc view of the level graph
            src, dst, w = src[keep], dst[keep], w[keep]
            cs = s_all[np.searchsorted(v_all, src)]
            cd = s_all[np.searchsorted(v_all, dst)]
            return pa.table(
                {
                    "src": pa.array(np.minimum(cs, cd)),
                    "dst": pa.array(np.maximum(cs, cd)),
                    "weight": pa.array(w),
                }
            )

        arcs = symmetrize_dedup(
            arcs.map_batches(
                coarse, batch_format="pyarrow", zero_copy_batch=True
            ),
            keep_self_loops=True,
        ).materialize()

    assignment = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(assign_v),
                "community": pa.array(out_comm),
            }
        )
    )
    return assignment, mods
