"""Maximal matching — parallel greedy local-max (Luby-style on the
line graph).

Semantics: ``nx.maximal_matching`` flavour — a set of vertex-disjoint
edges that cannot be extended (every non-matched edge shares an
endpoint with a matched one).  Maximal, not maximum; any maximal
matching is a 2-approximation of the maximum.  The reference greedy is
sequential, so this kernel uses the standard parallel reduction: per
round every remaining edge draws a deterministic 64-bit priority
(splitmix of (endpoints, round)); an edge whose priority is the
maximum at BOTH endpoints joins the matching (such edges form an
independent set in the line graph, so no conflicts), then every edge
touching a matched vertex drops.  Expected O(log E) rounds.

Deterministic across runs/cluster sizes: priorities are hashes of
(a, b, round), never RNG draws.

Scale shape: the distributed path is two hash-partitioned
segment-vectorized groupbys per round (per-vertex max, per-edge
both-max check + vertex-kill); the single-task fast path runs the
whole loop in one numpy block when the edge table fits a worker
(same switch as kernels/bridges.py).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Max

from igraph_ray.utils import hash_int64

_GOLD = np.int64(-0x61C8864680B583EB)


def _edge_priority(a: np.ndarray, b: np.ndarray, rnd: int) -> np.ndarray:
    return hash_int64(
        hash_int64(a + np.int64(rnd) * _GOLD).astype(np.int64)
        ^ (b * _GOLD)
    )


def _parts_for(n: int) -> int:
    return int(max(2, min(256, math.ceil(max(1, n) / 500_000))))


def _canon_pairs(edges: ray.data.Dataset) -> ray.data.Dataset:
    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {
                "a": pa.array(np.minimum(s, d)),
                "b": pa.array(np.maximum(s, d)),
            }
        )

    return (
        edges.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .aggregate(Max("a", alias_name="_d"))
        .select_columns(["a", "b"])
    )


def maximal_matching(
    edges: ray.data.Dataset,
    max_rounds: int = 64,
    single_task_max: int = 5_000_000,
) -> ray.data.Dataset:
    """(src, dst) canonical edges of a maximal matching of the
    undirected edge table (loops dropped, multi-edges collapsed)."""
    pairs = _canon_pairs(edges).materialize()
    n_pairs = pairs.count()

    if n_pairs <= single_task_max:

        def match_all(batch: pa.Table) -> pa.Table:
            a = batch.column("a").to_numpy(zero_copy_only=False)
            b = batch.column("b").to_numpy(zero_copy_only=False)
            if len(a) == 0:
                return pa.table(
                    {
                        "src": pa.array([], pa.int64()),
                        "dst": pa.array([], pa.int64()),
                    }
                )
            allv = np.unique(np.concatenate([a, b]))
            ai = np.searchsorted(allv, a)
            bi = np.searchsorted(allv, b)
            alive = np.ones(len(a), dtype=bool)
            in_match = np.zeros(len(a), dtype=bool)
            vdead = np.zeros(len(allv), dtype=bool)
            rnd = 0
            while alive.any():
                rnd += 1
                if rnd > max_rounds:  # pragma: no cover
                    raise RuntimeError("matching did not converge")
                p = _edge_priority(a, b, rnd)
                pmax = np.zeros(len(allv), np.uint64)
                np.maximum.at(pmax, ai[alive], p[alive])
                np.maximum.at(pmax, bi[alive], p[alive])
                won = alive & (p == pmax[ai]) & (p == pmax[bi])
                in_match |= won
                vdead[ai[won]] = True
                vdead[bi[won]] = True
                alive &= ~(vdead[ai] | vdead[bi])
            return pa.table(
                {"src": pa.array(a[in_match]), "dst": pa.array(b[in_match])}
            )

        return pairs.repartition(1).map_batches(
            match_all, batch_format="pyarrow", batch_size=None
        )

    # ---- distributed rounds -----------------------------------------
    np_parts = np.uint64(_parts_for(n_pairs))
    matched_parts: list[ray.data.Dataset] = []
    alive = pairs

    def vid_part(batch: pa.Table) -> pa.Table:
        v = batch.column("vid").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "hpart", pa.array((hash_int64(v) % np_parts).astype(np.int32))
        )

    for rnd in range(1, max_rounds + 1):
        if alive.count() == 0:
            break

        def arcs_of(batch: pa.Table, _r=rnd) -> pa.Table:
            a = batch.column("a").to_numpy(zero_copy_only=False)
            b = batch.column("b").to_numpy(zero_copy_only=False)
            p = _edge_priority(a, b, _r).view(np.int64)
            vid = np.concatenate([a, b])
            return pa.table(
                {
                    "hpart": pa.array(
                        (hash_int64(vid) % np_parts).astype(np.int32)
                    ),
                    "vid": pa.array(vid),
                    "oa": pa.array(np.concatenate([a, a])),
                    "ob": pa.array(np.concatenate([b, b])),
                    "p": pa.array(np.concatenate([p, p])),
                }
            )

        def local_max(group: pa.Table) -> pa.Table:
            vid = group.column("vid").to_numpy(zero_copy_only=False)
            oa = group.column("oa").to_numpy(zero_copy_only=False)
            ob = group.column("ob").to_numpy(zero_copy_only=False)
            p = group.column("p").to_numpy(zero_copy_only=False).view(np.uint64)
            order = np.argsort(vid, kind="stable")
            vid, oa, ob, p = vid[order], oa[order], ob[order], p[order]
            boundary = np.empty(len(vid), dtype=bool)
            boundary[0] = True
            boundary[1:] = vid[1:] != vid[:-1]
            starts = np.flatnonzero(boundary)
            segmax = np.maximum.reduceat(p, starts)
            smax = np.repeat(segmax, np.diff(np.append(starts, len(vid))))
            return pa.table(
                {
                    "a": pa.array(oa),
                    "b": pa.array(ob),
                    "is_max": pa.array((p == smax).astype(np.int8), pa.int8()),
                }
            )

        def edge_part(batch: pa.Table) -> pa.Table:
            a = batch.column("a").to_numpy(zero_copy_only=False)
            b = batch.column("b").to_numpy(zero_copy_only=False)
            part = (
                (hash_int64(a) ^ hash_int64(b * _GOLD)) % np_parts
            ).astype(np.int32)
            return batch.append_column("hpart", pa.array(part))

        flagged = (
            alive.map_batches(
                arcs_of, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("hpart")
            .map_groups(local_max, batch_format="pyarrow")
        )

        def decide(group: pa.Table) -> pa.Table:
            a = group.column("a").to_numpy(zero_copy_only=False)
            b = group.column("b").to_numpy(zero_copy_only=False)
            m = group.column("is_max").to_numpy(zero_copy_only=False)
            order = np.lexsort((b, a))
            a, b, m = a[order], b[order], m[order]
            starts = np.flatnonzero(
                np.concatenate(
                    [[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
                )
            )
            ends = np.append(starts[1:], len(a))
            won = np.add.reduceat(m.astype(np.int64), starts) == (
                ends - starts
            )  # both endpoint rows are maxima
            return pa.table(
                {"src": pa.array(a[starts][won]), "dst": pa.array(b[starts][won])}
            )

        won_edges = (
            flagged.map_batches(
                edge_part, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("hpart")
            .map_groups(decide, batch_format="pyarrow")
            .materialize()
        )
        matched_parts.append(won_edges)

        # kill every edge touching a matched vertex (tagged groupby)
        def match_vids(batch: pa.Table) -> pa.Table:
            s = batch.column("src").combine_chunks()
            d = batch.column("dst").combine_chunks()
            return pa.table(
                {
                    "vid": pa.concat_arrays([s, d]),
                    "oa": pa.array(
                        np.full(2 * batch.num_rows, -1, np.int64)
                    ),
                    "ob": pa.array(
                        np.full(2 * batch.num_rows, -1, np.int64)
                    ),
                }
            )

        def alive_arcs(batch: pa.Table) -> pa.Table:
            a = batch.column("a").to_numpy(zero_copy_only=False)
            b = batch.column("b").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "vid": pa.array(np.concatenate([a, b])),
                    "oa": pa.array(np.concatenate([a, a])),
                    "ob": pa.array(np.concatenate([b, b])),
                }
            )

        def survivors(group: pa.Table) -> pa.Table:
            vid = group.column("vid").to_numpy(zero_copy_only=False)
            oa = group.column("oa").to_numpy(zero_copy_only=False)
            ob = group.column("ob").to_numpy(zero_copy_only=False)
            # vertices killed this round = rows with oa == -1
            killed = np.unique(vid[oa == -1])
            arc = oa != -1
            hit = np.isin(vid[arc], killed)
            return pa.table(
                {
                    "a": pa.array(oa[arc][~hit]),
                    "b": pa.array(ob[arc][~hit]),
                    "half": pa.array(np.ones((~hit).sum(), np.int64)),
                }
            )

        halves = (
            alive.map_batches(
                alive_arcs, batch_format="pyarrow", zero_copy_batch=True
            )
            .union(
                won_edges.map_batches(
                    match_vids, batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .map_batches(vid_part, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("hpart")
            .map_groups(survivors, batch_format="pyarrow")
        )
        # an edge survives only if BOTH halves survived their vertex
        from ray.data.aggregate import Sum

        alive = (
            halves.groupby(["a", "b"])
            .aggregate(Sum("half", alias_name="half"))
            .map_batches(
                lambda t: t.filter(pc.equal(t.column("half"), 2)).select(
                    ["a", "b"]
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()
        )
    else:  # pragma: no cover
        raise RuntimeError(f"matching did not converge in {max_rounds} rounds")

    if not matched_parts:
        return ray.data.from_arrow(
            pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        )
    out = matched_parts[0]
    for p in matched_parts[1:]:
        out = out.union(p)
    return out
