"""Degree-preserving graph rewiring (igraph ``igraph_rewire`` /
``nx.double_edge_swap`` semantics, made deterministic and
distributed).

Classic rewiring draws two random edges (a,b),(c,d) and swaps them to
(a,d),(c,b), rejecting swaps that create self-loops or multi-edges —
every vertex keeps its exact degree.  A sequential seeded RNG does not
distribute, so this implementation replaces "random draw" with
hash-seeded pairing (the engine's standard determinism device, cf.
``stages/sample.py``):

per round
  1. every edge gets ``h = splitmix64(edge ⊕ seed ⊕ round)``; edges
     are hash-bucketed and paired inside each bucket in ``h`` order
     (ONE shuffle on the bucket key, numpy pairing inside
     ``map_groups`` — no per-row Python),
  2. each pair proposes the swap whose orientation a hash bit picks;
     self-loop proposals are rejected locally,
  3. global validity is exact, not probabilistic: a proposal is
     rejected if its new edge collides with another proposal (one
     ``groupby`` multiplicity count) or with an untouched edge (one
     hash semi-join).  Rejected swaps keep their original edges, so
     the graph stays simple and the degree sequence is preserved
     EXACTLY — the property the SQL twin checks bitwise.

Rejected-swap ids are O(hash collisions) per round — a tiny driver
gather broadcast back as a numpy set (the engine's small-side rule).
Rounds are sequential by nature (each consumes the previous round's
edge set); ``rounds=3`` already rewires >80% of edges on
non-degenerate graphs.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.utils import hash_int64

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _edge_hash(s: np.ndarray, d: np.ndarray, salt: int) -> np.ndarray:
    """uint64 hash of canonical (s, d) edge pairs."""
    with np.errstate(over="ignore"):
        z = (
            hash_int64(s)
            ^ (d.astype(np.uint64) * _MIX)
            ^ np.uint64(np.int64(salt).view(np.uint64))
        )
    return hash_int64(z)


def _np_parts(n_rows: int) -> int:
    return int(max(2, min(256, math.ceil(max(1, n_rows) / 250_000))))


def rewire_edges(
    pairs: ray.data.Dataset,
    rounds: int = 3,
    seed: int = 0,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Rewire an unordered simple edge table (``src`` < ``dst``
    canonical int64 pairs, no self-loops) preserving every vertex
    degree exactly.  Deterministic in (edge set, rounds, seed)."""
    if num_parts is None:
        num_parts = _np_parts(pairs.count())
    np_parts = np.uint64(num_parts)
    edges = pairs.select_columns(["src", "dst"]).materialize()

    for rnd in range(rounds):
        salt = (seed << 8) | rnd

        def tag(batch: pa.Table, salt=salt) -> pa.Table:
            s = batch.column("src").to_numpy(zero_copy_only=False)
            d = batch.column("dst").to_numpy(zero_copy_only=False)
            h = _edge_hash(s, d, salt)
            return pa.table(
                {
                    "bucket": pa.array(
                        (h % np_parts).astype(np.int32)
                    ),
                    "h": pa.array(h.astype(np.int64)),
                    "src": pa.array(s.astype(np.int64)),
                    "dst": pa.array(d.astype(np.int64)),
                }
            )

        def propose(group: pa.Table, salt=salt) -> pa.Table:
            """Pair edges in h order; emit kind=0 keep rows and, per
            locally-valid swap, kind=1 candidate rows (2 per swap) +
            kind=2 original rows (2 per swap, for restore)."""
            s = group.column("src").to_numpy(zero_copy_only=False)
            d = group.column("dst").to_numpy(zero_copy_only=False)
            h = group.column("h").to_numpy(zero_copy_only=False)
            order = np.argsort(h, kind="stable")
            s, d, h = s[order], d[order], h[order]
            m = len(s)
            npair = m // 2
            ks, kd = [s[2 * npair:]], [d[2 * npair:]]  # odd leftover
            if npair:
                a, b = s[0 : 2 * npair : 2], d[0 : 2 * npair : 2]
                c, dd = s[1 : 2 * npair : 2], d[1 : 2 * npair : 2]
                # orientation bit: (a,d),(c,b) vs (a,c),(b,d)
                bit = (
                    hash_int64(h[0 : 2 * npair : 2] ^ np.int64(salt)) & 1
                ).astype(bool)
                n1s = a
                n1d = np.where(bit, dd, c)
                n2s = np.where(bit, c, b)
                n2d = np.where(bit, b, dd)
                e1s, e1d = np.minimum(n1s, n1d), np.maximum(n1s, n1d)
                e2s, e2d = np.minimum(n2s, n2d), np.maximum(n2s, n2d)
                ok = (
                    (e1s != e1d)
                    & (e2s != e2d)
                    & ~((e1s == e2s) & (e1d == e2d))
                )
                # locally-rejected swaps keep their originals
                ks.append(a[~ok])
                kd.append(b[~ok])
                ks.append(c[~ok])
                kd.append(dd[~ok])
                sid = hash_int64(
                    h[0 : 2 * npair : 2].astype(np.int64)
                ).astype(np.int64)[ok]
                e1s, e1d, e2s, e2d = e1s[ok], e1d[ok], e2s[ok], e2d[ok]
                a, b, c, dd = a[ok], b[ok], c[ok], dd[ok]
                nk = len(sid)
                kind = np.concatenate(
                    [np.ones(2 * nk, np.int8), np.full(2 * nk, 2, np.int8)]
                )
                osid = np.concatenate([sid, sid, sid, sid])
                osrc = np.concatenate([e1s, e2s, a, c])
                odst = np.concatenate([e1d, e2d, b, dd])
            else:
                kind = np.empty(0, np.int8)
                osid = np.empty(0, np.int64)
                osrc = np.empty(0, np.int64)
                odst = np.empty(0, np.int64)
            keep_s = np.concatenate(ks) if ks else np.empty(0, np.int64)
            keep_d = np.concatenate(kd) if kd else np.empty(0, np.int64)
            return pa.table(
                {
                    "kind": pa.array(
                        np.concatenate(
                            [np.zeros(len(keep_s), np.int8), kind]
                        )
                    ),
                    "sid": pa.array(
                        np.concatenate(
                            [np.zeros(len(keep_s), np.int64), osid]
                        )
                    ),
                    "src": pa.array(
                        np.concatenate([keep_s.astype(np.int64), osrc])
                    ),
                    "dst": pa.array(
                        np.concatenate([keep_d.astype(np.int64), odst])
                    ),
                }
            )

        tagged = edges.map_batches(
            tag, batch_format="pyarrow", zero_copy_batch=True
        )
        prop = (
            tagged.groupby("bucket")
            .map_groups(propose, batch_format="pyarrow")
            .materialize()
        )

        # global validity: candidate (kind=1) edges must be unique
        # among themselves AND absent from keep (kind=0) edges AND
        # from every paired original (kind=2) — the last because a
        # REJECTED swap restores its originals, which must not collide
        # with an accepted candidate (conservative over-rejection on
        # hash collision or swapped-away originals is safe: restoring
        # a swap is always valid).  Bad swap-ids are O(collisions):
        # tiny driver gather.
        def conflict_partial(batch: pa.Table) -> pa.Table:
            k = batch.column("kind").to_numpy(zero_copy_only=False)
            s = batch.column("src").to_numpy(zero_copy_only=False)
            d = batch.column("dst").to_numpy(zero_copy_only=False)
            eh = _edge_hash(s, d, -1)
            return pa.table(
                {
                    "eh": pa.array(eh.astype(np.int64)),
                    "iscand": pa.array((k == 1).astype(np.int8)),
                    "sid": pa.array(
                        batch.column("sid")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64)
                    ),
                }
            )

        hashes = prop.map_batches(
            conflict_partial, batch_format="pyarrow", zero_copy_batch=True
        )

        def find_bad(group: pa.Table) -> pa.Table:
            eh = group.column("eh").to_numpy(zero_copy_only=False)
            cand = group.column("iscand").to_numpy(zero_copy_only=False)
            sid = group.column("sid").to_numpy(zero_copy_only=False)
            order = np.argsort(eh, kind="stable")
            eh, cand, sid = eh[order], cand[order], sid[order]
            new = np.empty(len(eh), bool)
            if len(eh):
                new[0] = True
                new[1:] = eh[1:] != eh[:-1]
            seg = np.cumsum(new) - 1
            seg_n = np.bincount(seg) if len(eh) else np.empty(0, np.int64)
            dup = seg_n[seg] > 1  # hash shared by >1 row (cand or keep)
            bad = np.unique(sid[(cand == 1) & dup])
            return pa.table({"bad_sid": pa.array(bad.astype(np.int64))})

        def conflict_bucket(batch: pa.Table) -> pa.Table:
            eh = batch.column("eh").to_numpy(zero_copy_only=False)
            return batch.append_column(
                "cb",
                pa.array(
                    (eh.astype(np.uint64) % np_parts).astype(np.int32)
                ),
            )

        bad_tbl = (
            hashes.map_batches(
                conflict_bucket, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("cb")
            .map_groups(find_bad, batch_format="pyarrow")
            .take_all()
        )
        bad = np.sort(
            np.unique(np.array([r["bad_sid"] for r in bad_tbl], np.int64))
        )
        bad_ref = ray.put(bad)

        def resolve(batch: pa.Table) -> pa.Table:
            badset = ray.get(bad_ref)
            k = batch.column("kind").to_numpy(zero_copy_only=False)
            sid = batch.column("sid").to_numpy(zero_copy_only=False)
            isbad = np.zeros(len(k), bool)
            if len(badset):
                pos = np.searchsorted(badset, sid)
                pos = np.minimum(pos, len(badset) - 1)
                isbad = badset[pos] == sid
            take = (
                (k == 0) | ((k == 1) & ~isbad) | ((k == 2) & isbad)
            )
            return pa.table(
                {
                    "src": batch.column("src").filter(pa.array(take)),
                    "dst": batch.column("dst").filter(pa.array(take)),
                }
            )

        edges = prop.map_batches(
            resolve, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    return edges
