"""Bridges and 2-edge-connected components.

Semantics: igraph ``igraph_bridges`` / ``nx.bridges`` — an undirected
edge is a bridge iff removing it disconnects its endpoints (i.e. it
lies on no cycle).  2-edge-connected components = connected components
after bridge removal (igraph ``igraph_biconnected_components``' edge
variant / ``nx.k_edge_components(k=2)`` on simple graphs, up to the
singleton-vertex convention noted on :func:`two_edge_components`).

The reference algorithms are DFS chain decompositions — inherently
sequential — so this kernel uses the distributed **cycle-space XOR**
construction instead (the standard parallel/streaming approach, cf.
Pritchard's cycle-space sampling):

1. build a spanning forest with the Borůvka kernel (unit weights);
2. give every distinct NON-forest pair a deterministic 64-bit tag
   (splitmix of the endpoint hash); each vertex starts with the XOR of
   its incident non-forest tags;
3. peel the forest leaves round by round: a leaf's accumulated XOR is
   exactly the XOR of tags crossing its subtree's cut (tags with both
   endpoints inside the subtree cancel), so the removed tree edge's
   cover is the leaf's accumulator, pushed onto the surviving endpoint;
4. a tree edge is a bridge iff its cover is zero (Monte-Carlo exact up
   to a ~#edges/2^64 collision probability, deterministic across runs
   because the tags are hashes, not RNG draws) AND the pair has input
   multiplicity 1 (a parallel copy is itself a covering cycle).

Every phase is a hash-partitioned groupby with segment-vectorized
numpy processing.  Rounds = forest radius (each round removes every
current leaf); ``max_rounds`` guards pathological path graphs the same
way the toposort kernel does.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max

from igraph_ray.utils import hash_int64

_GOLD = np.int64(-0x61C8864680B583EB)  # 0x9E3779B97F4A7C15 as int64


def _pair_tags(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit tag per canonical pair (uint64)."""
    return hash_int64(
        (hash_int64(a).astype(np.int64)) ^ (b * _GOLD)
    )


def _parts_for(n_rows: int) -> int:
    return int(max(2, min(256, math.ceil(max(1, n_rows) / 500_000))))


def _seg_starts(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    boundary = np.empty(len(key), dtype=bool)
    boundary[0] = True
    boundary[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(boundary)
    return starts, np.append(starts[1:], len(key))


def _canonical_mult(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(a, b, mult) — canonical distinct pairs with multiplicity,
    self-loops dropped."""

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
        .aggregate(Count("a", alias_name="mult"))
    )


def bridge_covers(
    edges: ray.data.Dataset,
    work_dir: str | None = None,
    max_rounds: int = 4096,
    single_task_max: int = 5_000_000,
) -> ray.data.Dataset:
    """(src, dst, cover, mult) for every spanning-forest edge of the
    undirected edge table — ``cover`` is the cycle-space XOR over the
    edge's cut, ``mult`` the input multiplicity.  Bridges are the rows
    with ``cover == 0 AND mult == 1`` (see module docstring); non-forest
    edges always lie on a cycle and are omitted."""
    import tempfile

    from igraph_ray.kernels.mst import minimum_spanning_forest

    work_dir = work_dir or tempfile.mkdtemp(prefix="igr_br_")
    pairs = _canonical_mult(edges).materialize()

    def unit_weight(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch.column("a"),
                "dst": batch.column("b"),
                "weight": pa.array(np.ones(batch.num_rows)),
            }
        )

    forest = minimum_spanning_forest(
        pairs.map_batches(
            unit_weight, batch_format="pyarrow", zero_copy_batch=True
        ),
        work_dir=work_dir,
    ).materialize()

    # ---- split pairs into forest / non-forest; init vertex accs -----
    def tag_forest(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": batch.column("src"),
                "b": batch.column("dst"),
                "mult": pa.array(np.zeros(batch.num_rows, np.int64)),
                "in_forest": pa.array(np.ones(batch.num_rows, np.int8), pa.int8()),
            }
        )

    def tag_pair(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "mult": batch.column("mult"),
                "in_forest": pa.array(
                    np.zeros(batch.num_rows, np.int8), pa.int8()
                ),
            }
        )

    n_pairs = pairs.count()
    np_parts = np.uint64(_parts_for(n_pairs))

    def add_part(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        part = ((hash_int64(a) ^ hash_int64(b * _GOLD)) % np_parts).astype(
            np.int32
        )
        return batch.append_column("hpart", pa.array(part))

    tagged = (
        pairs.map_batches(
            tag_pair, batch_format="pyarrow", zero_copy_batch=True
        )
        .union(
            forest.map_batches(
                tag_forest, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    )

    def split(group: pa.Table) -> pa.Table:
        """Merge the forest marker onto pairs; emit per-pair rows
        (a, b, mult, in_forest) and, for non-forest pairs, two vertex
        acc contributions (kind 1)."""
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        mult = group.column("mult").to_numpy(zero_copy_only=False)
        inf = group.column("in_forest").to_numpy(zero_copy_only=False)
        order = np.lexsort((inf, b, a))
        a, b, mult, inf = a[order], b[order], mult[order], inf[order]
        boundary = np.empty(len(a), dtype=bool)
        boundary[0] = True
        boundary[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(boundary)
        ends = np.append(starts[1:], len(a))
        last = ends - 1
        seg_forest = inf[last] == 1
        seg_a, seg_b = a[starts], b[starts]
        seg_mult = mult[starts]  # pair row sorts first (in_forest=0)
        tags = _pair_tags(seg_a, seg_b).view(np.int64)
        nf = ~seg_forest
        # vertex acc contributions from non-forest pairs
        vid = np.concatenate([seg_a[nf], seg_b[nf]])
        acc = np.concatenate([tags[nf], tags[nf]])
        k = len(seg_a)
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(k, np.int8), np.ones(len(vid), np.int8)]
                    ),
                    pa.int8(),
                ),
                "a": pa.array(np.concatenate([seg_a, vid])),
                "b": pa.array(np.concatenate([seg_b, np.zeros(len(vid), np.int64)])),
                "mult": pa.array(
                    np.concatenate([seg_mult, np.zeros(len(vid), np.int64)])
                ),
                "forest": pa.array(
                    np.concatenate(
                        [seg_forest.astype(np.int8), np.zeros(len(vid), np.int8)]
                    ),
                    pa.int8(),
                ),
                "val": pa.array(np.concatenate([np.zeros(k, np.int64), acc])),
            }
        )

    merged = tagged.groupby("hpart").map_groups(
        split, batch_format="pyarrow"
    ).materialize()

    tree = merged.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t.column("kind"), 0), pc.equal(t.column("forest"), 1))
        ).select(["a", "b", "mult"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    # initial vertex accumulators: XOR of incident non-forest tags,
    # combined per vid with segment XOR (no per-row Python)
    acc_contrib = merged.map_batches(
        lambda t: pa.table(
            {
                "vid": t.filter(pc.equal(t.column("kind"), 1)).column("a"),
                "acc": t.filter(pc.equal(t.column("kind"), 1)).column("val"),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def xor_by_vid(group: pa.Table) -> pa.Table:
        vid = group.column("vid").to_numpy(zero_copy_only=False)
        acc = group.column("acc").to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.argsort(vid, kind="stable")
        vid, acc = vid[order], acc[order]
        starts, ends = _seg_starts(vid)
        out = np.bitwise_xor.reduceat(acc, starts)
        return pa.table(
            {
                "vid": pa.array(vid[starts]),
                "acc": pa.array(out.view(np.int64)),
            }
        )

    def vid_part(batch: pa.Table) -> pa.Table:
        v = batch.column("vid").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "hpart", pa.array((hash_int64(v) % np_parts).astype(np.int32))
        )

    acc = (
        acc_contrib.map_batches(
            vid_part, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("hpart")
        .map_groups(xor_by_vid, batch_format="pyarrow")
        .materialize()
    )

    # ---- fast path: whole-forest peel in ONE task when the forest +
    # accumulators fit a worker (repo's standard broadcast-vs-distributed
    # switch, cf. triangles' broadcast close).  The distributed round
    # loop below is the beyond-memory scale path.
    if tree.count() <= single_task_max:

        def tree_rows(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "a": batch.column("a"),
                    "b": batch.column("b"),
                    "mult": batch.column("mult"),
                    "val": pa.array(np.zeros(batch.num_rows, np.int64)),
                    "kind": pa.array(
                        np.zeros(batch.num_rows, np.int8), pa.int8()
                    ),
                }
            )

        def acc_rows0(batch: pa.Table) -> pa.Table:
            z = np.zeros(batch.num_rows, np.int64)
            return pa.table(
                {
                    "a": batch.column("vid"),
                    "b": pa.array(z),
                    "mult": pa.array(z),
                    "val": batch.column("acc"),
                    "kind": pa.array(
                        np.ones(batch.num_rows, np.int8), pa.int8()
                    ),
                }
            )

        def peel_all(batch: pa.Table) -> pa.Table:
            kind = batch.column("kind").to_numpy(zero_copy_only=False)
            av = batch.column("a").to_numpy(zero_copy_only=False)
            bv = batch.column("b").to_numpy(zero_copy_only=False)
            multv = batch.column("mult").to_numpy(zero_copy_only=False)
            valv = batch.column("val").to_numpy(zero_copy_only=False)
            em = kind == 0
            ea, eb, emult = av[em], bv[em], multv[em]
            if len(ea) == 0:
                return pa.table(
                    {
                        "src": pa.array([], pa.int64()),
                        "dst": pa.array([], pa.int64()),
                        "cover": pa.array([], pa.int64()),
                        "mult": pa.array([], pa.int64()),
                    }
                )
            allv = np.unique(np.concatenate([ea, eb, av[~em]]))
            n = len(allv)
            ai = np.searchsorted(allv, ea)
            bi = np.searchsorted(allv, eb)
            accw = np.zeros(n, np.uint64)
            accw[np.searchsorted(allv, av[~em])] = valv[~em].view(np.uint64)
            deg = (
                np.bincount(ai, minlength=n) + np.bincount(bi, minlength=n)
            ).astype(np.int64)
            alive = np.ones(len(ea), dtype=bool)
            cover = np.zeros(len(ea), np.uint64)
            while alive.any():
                leaf = deg == 1
                rm = alive & (leaf[ai] | leaf[bi])
                if not rm.any():  # pragma: no cover - forests always peel
                    raise RuntimeError("bridge peel stalled (cycle?)")
                la = leaf[ai[rm]]
                cover[rm] = np.where(la, accw[ai[rm]], accw[bi[rm]])
                both = la & leaf[bi[rm]]
                tgt = np.where(la, bi[rm], ai[rm])[~both]
                np.bitwise_xor.at(accw, tgt, cover[rm][~both])
                np.subtract.at(deg, ai[rm], 1)
                np.subtract.at(deg, bi[rm], 1)
                alive[rm] = False
            return pa.table(
                {
                    "src": pa.array(ea),
                    "dst": pa.array(eb),
                    "cover": pa.array(cover.view(np.int64)),
                    "mult": pa.array(emult),
                }
            )

        return (
            tree.map_batches(
                tree_rows, batch_format="pyarrow", zero_copy_batch=True
            )
            .union(
                acc.map_batches(
                    acc_rows0, batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .repartition(1)
            .map_batches(peel_all, batch_format="pyarrow", batch_size=None)
        )

    removed: list[ray.data.Dataset] = []
    for _ in range(max_rounds):
        n_tree = tree.count()
        if n_tree == 0:
            break
        # ---- phase A: per-vertex degree; leaves claim their edge ----
        def arcs_of(batch: pa.Table) -> pa.Table:
            a = batch.column("a").to_numpy(zero_copy_only=False)
            b = batch.column("b").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "vid": pa.array(np.concatenate([a, b])),
                    "other": pa.array(np.concatenate([b, a])),
                    "acc": pa.array(np.zeros(2 * len(a), np.int64)),
                    "is_acc": pa.array(
                        np.zeros(2 * len(a), np.int8), pa.int8()
                    ),
                }
            )

        def acc_rows(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "vid": batch.column("vid"),
                    "other": pa.array(np.zeros(batch.num_rows, np.int64)),
                    "acc": batch.column("acc"),
                    "is_acc": pa.array(
                        np.ones(batch.num_rows, np.int8), pa.int8()
                    ),
                }
            )

        phase_a_in = tree.map_batches(
            arcs_of, batch_format="pyarrow", zero_copy_batch=True
        ).union(
            acc.map_batches(
                acc_rows, batch_format="pyarrow", zero_copy_batch=True
            )
        ).map_batches(
            vid_part, batch_format="pyarrow", zero_copy_batch=True
        )

        def leaves_and_survivors(group: pa.Table) -> pa.Table:
            vid = group.column("vid").to_numpy(zero_copy_only=False)
            other = group.column("other").to_numpy(zero_copy_only=False)
            accv = group.column("acc").to_numpy(zero_copy_only=False)
            is_acc = group.column("is_acc").to_numpy(zero_copy_only=False)
            order = np.lexsort((is_acc, vid))
            vid, other, accv, is_acc = (
                vid[order], other[order], accv[order], is_acc[order],
            )
            starts, ends = _seg_starts(vid)
            last = ends - 1
            has_acc = is_acc[last] == 1
            seg_acc = np.where(has_acc, accv[last], 0)
            deg = (ends - starts) - has_acc.astype(np.int64)
            seg_vid = vid[starts]
            leaf = deg == 1
            # claim rows: the leaf's single arc row is at position
            # starts for leaf segments (arc rows sort before acc rows)
            lv = seg_vid[leaf]
            lo = other[starts[leaf]]
            claims_a = np.minimum(lv, lo)
            claims_b = np.maximum(lv, lo)
            # surviving acc rows: non-leaf vertices with deg > 0
            keep = (~leaf) & (deg > 0)
            kv = seg_vid[keep]
            ka = seg_acc[keep]
            return pa.table(
                {
                    "kind": pa.array(
                        np.concatenate(
                            [
                                np.zeros(len(lv), np.int8),
                                np.ones(len(kv), np.int8),
                            ]
                        ),
                        pa.int8(),
                    ),
                    "a": pa.array(np.concatenate([claims_a, kv])),
                    "b": pa.array(
                        np.concatenate([claims_b, np.zeros(len(kv), np.int64)])
                    ),
                    "leaf_vid": pa.array(
                        np.concatenate([lv, np.zeros(len(kv), np.int64)])
                    ),
                    "val": pa.array(
                        np.concatenate([seg_acc[leaf], ka])
                    ),
                }
            )

        phase_a = phase_a_in.groupby("hpart").map_groups(
            leaves_and_survivors, batch_format="pyarrow"
        ).materialize()

        claims = phase_a.map_batches(
            lambda t: t.filter(pc.equal(t.column("kind"), 0)).select(
                ["a", "b", "leaf_vid", "val"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        survivors = phase_a.map_batches(
            lambda t: pa.table(
                {
                    "vid": t.filter(pc.equal(t.column("kind"), 1)).column("a"),
                    "acc": t.filter(pc.equal(t.column("kind"), 1)).column(
                        "val"
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

        # ---- phase B: resolve claims per edge ----
        def edge_rows(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "a": batch.column("a"),
                    "b": batch.column("b"),
                    "leaf_vid": pa.array(
                        np.full(batch.num_rows, -1, np.int64)
                    ),
                    "val": batch.column("mult"),
                }
            )

        phase_b_in = claims.union(
            tree.map_batches(
                edge_rows, batch_format="pyarrow", zero_copy_batch=True
            )
        ).map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)

        def resolve(group: pa.Table) -> pa.Table:
            a = group.column("a").to_numpy(zero_copy_only=False)
            b = group.column("b").to_numpy(zero_copy_only=False)
            lv = group.column("leaf_vid").to_numpy(zero_copy_only=False)
            val = group.column("val").to_numpy(zero_copy_only=False)
            order = np.lexsort((lv, b, a))  # edge row (lv=-1) first
            a, b, lv, val = a[order], b[order], lv[order], val[order]
            boundary = np.empty(len(a), dtype=bool)
            boundary[0] = True
            boundary[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            starts = np.flatnonzero(boundary)
            ends = np.append(starts[1:], len(a))
            n_claims = (ends - starts) - 1  # first row is the edge row
            seg_a, seg_b = a[starts], b[starts]
            seg_mult = val[starts]
            # removed edges (>=1 claim): cover from the smallest
            # claiming leaf (covers agree when both endpoints claim)
            rm = n_claims >= 1
            first_claim = starts + 1
            cover = np.where(rm, val[np.minimum(first_claim, len(a) - 1)], 0)
            # push rows: exactly one claim -> other endpoint gets val
            one = n_claims == 1
            leaf = lv[np.minimum(first_claim, len(a) - 1)]
            push_to = np.where(seg_a == leaf, seg_b, seg_a)[one]
            push_val = cover[one]
            # surviving edges
            sv = ~rm
            k_rm, k_push, k_sv = int(rm.sum()), len(push_to), int(sv.sum())
            return pa.table(
                {
                    "kind": pa.array(
                        np.concatenate(
                            [
                                np.zeros(k_rm, np.int8),
                                np.ones(k_push, np.int8),
                                np.full(k_sv, 2, np.int8),
                            ]
                        ),
                        pa.int8(),
                    ),
                    "a": pa.array(
                        np.concatenate([seg_a[rm], push_to, seg_a[sv]])
                    ),
                    "b": pa.array(
                        np.concatenate(
                            [seg_b[rm], np.zeros(k_push, np.int64), seg_b[sv]]
                        )
                    ),
                    "mult": pa.array(
                        np.concatenate(
                            [seg_mult[rm], np.zeros(k_push, np.int64), seg_mult[sv]]
                        )
                    ),
                    "val": pa.array(
                        np.concatenate([cover[rm], push_val, np.zeros(k_sv, np.int64)])
                    ),
                }
            )

        phase_b = phase_b_in.groupby("hpart").map_groups(
            resolve, batch_format="pyarrow"
        ).materialize()

        removed.append(
            phase_b.map_batches(
                lambda t: pa.table(
                    {
                        "src": t.filter(pc.equal(t.column("kind"), 0)).column("a"),
                        "dst": t.filter(pc.equal(t.column("kind"), 0)).column("b"),
                        "cover": t.filter(pc.equal(t.column("kind"), 0)).column("val"),
                        "mult": t.filter(pc.equal(t.column("kind"), 0)).column("mult"),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).materialize()
        )
        tree = phase_b.map_batches(
            lambda t: pa.table(
                {
                    "a": t.filter(pc.equal(t.column("kind"), 2)).column("a"),
                    "b": t.filter(pc.equal(t.column("kind"), 2)).column("b"),
                    "mult": t.filter(pc.equal(t.column("kind"), 2)).column("mult"),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()

        # ---- phase C: fold pushes into surviving accumulators ----
        pushes = phase_b.map_batches(
            lambda t: pa.table(
                {
                    "vid": t.filter(pc.equal(t.column("kind"), 1)).column("a"),
                    "acc": t.filter(pc.equal(t.column("kind"), 1)).column("val"),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        acc = (
            survivors.union(pushes)
            .map_batches(vid_part, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("hpart")
            .map_groups(xor_by_vid, batch_format="pyarrow")
            .materialize()
        )
    else:  # pragma: no cover
        raise RuntimeError(
            f"bridge peeling did not converge in {max_rounds} rounds; "
            "raise max_rounds (rounds scale with the forest radius)"
        )

    if not removed:
        return ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "cover": pa.array([], pa.int64()),
                    "mult": pa.array([], pa.int64()),
                }
            )
        )
    out = removed[0]
    for p in removed[1:]:
        out = out.union(p)
    return out


def bridges(
    edges: ray.data.Dataset,
    work_dir: str | None = None,
    max_rounds: int = 4096,
    single_task_max: int = 5_000_000,
) -> ray.data.Dataset:
    """(src, dst) canonical bridge edges of the undirected edge table
    (igraph_bridges / nx.bridges semantics; parallel edges make a pair
    non-bridge)."""
    covers = bridge_covers(
        edges,
        work_dir=work_dir,
        max_rounds=max_rounds,
        single_task_max=single_task_max,
    )
    return covers.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.equal(t.column("cover"), 0), pc.equal(t.column("mult"), 1)
            )
        ).select(["src", "dst"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def two_edge_components(
    edges: ray.data.Dataset,
    graph_dir: str,
    vertices: ray.data.Dataset | None = None,
    max_rounds: int = 4096,
    single_task_max: int = 5_000_000,
) -> ray.data.Dataset:
    """(vid, comp) — 2-edge-connected components: connected components
    (min-vid labels) after removing every bridge.  Vertices isolated by
    bridge removal become singleton components (``vertices`` adds truly
    isolated vertices, as in ``build_graph``)."""
    import os


    from igraph_ray.api import build_graph
    from igraph_ray.kernels.components import connected_components

    br = bridges(
        edges,
        work_dir=os.path.join(graph_dir, "msf"),
        max_rounds=max_rounds,
        single_task_max=single_task_max,
    )

    def tag(flag: int):
        def _f(batch: pa.Table) -> pa.Table:
            s = batch.column("src").to_numpy(zero_copy_only=False)
            d = batch.column("dst").to_numpy(zero_copy_only=False)
            keep = s != d
            s, d = s[keep], d[keep]
            return pa.table(
                {
                    "a": pa.array(np.minimum(s, d)),
                    "b": pa.array(np.maximum(s, d)),
                    "is_bridge": pa.array(
                        np.full(len(s), flag, np.int64)
                    ),
                }
            )

        return _f

    marked = (
        edges.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True)
        .union(
            br.map_batches(
                tag(1), batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby(["a", "b"])
        .aggregate(Max("is_bridge", alias_name="is_bridge"))
    )
    kept = marked.map_batches(
        lambda t: pa.table(
            {
                "src": t.filter(pc.equal(t.column("is_bridge"), 0)).column("a"),
                "dst": t.filter(pc.equal(t.column("is_bridge"), 0)).column("b"),
                "weight": pa.array(
                    np.ones(
                        t.filter(pc.equal(t.column("is_bridge"), 0)).num_rows
                    )
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # endpoints of ALL edges (plus optional vertices) so bridge-isolated
    # vertices appear as singletons
    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": pa.concat_arrays(
                    [
                        batch.column("src").cast(pa.int64()).combine_chunks(),
                        batch.column("dst").cast(pa.int64()).combine_chunks(),
                    ]
                )
            }
        )

    vset = edges.map_batches(
        endpoints, batch_format="pyarrow", zero_copy_batch=True
    )
    if vertices is not None:
        vset = vset.union(vertices.select_columns(["vid"]))
    from ray.data.aggregate import Min

    vset = (
        vset.groupby("vid")
        .aggregate(Min("vid", alias_name="_d"))
        .select_columns(["vid"])
    )

    graph = build_graph(
        kept,
        os.path.join(graph_dir, "g2ec"),
        vertices=vset,
        symmetrize=True,
    )
    return connected_components(graph).state.select_columns(["vid", "comp"])
