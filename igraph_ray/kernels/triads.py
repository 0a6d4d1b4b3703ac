"""Dyad census, triad census and cocitation / bibliographic coupling.

Semantics matched (public references):

* ``dyad_census`` — igraph ``igraph_dyad_census`` / Holland-Leinhardt
  MAN counts: the number of unordered vertex pairs whose dyad is
  mutual (both arcs), asymmetric (exactly one arc) or null (no arc).
  Loops and duplicate arcs are ignored.
* ``triad_census`` — igraph ``igraph_triad_census`` / networkx
  ``triadic_census``: the 16 Holland-Leinhardt MAN triad-isomorphism
  classes over every unordered vertex triple.  Computed with the
  Batagelj-Mrvar (2001, "A subquadratic triad census algorithm")
  scheme: only CONNECTED triples (>= 2 linked pairs) are enumerated —
  via wedges through each center vertex — while the 012/102 classes
  come from per-linked-pair closed forms and 003 by subtraction from
  C(n,3).  Work is O(sum deg(w)^2) like triangle counting, never
  O(n^3).
* ``cocitation_counts`` — igraph ``igraph_cocitation`` /
  ``igraph_bibcoupling``: for vertex pairs, the number of common
  in-neighbours (``mode="cocitation"``: w->u and w->v) or common
  out-neighbours (``mode="bibcoupling"``: u->w and v->w).  Only pairs
  with a non-zero count are returned (the full matrix is O(n^2)).

Scale notes: every stage is a hash-partitioned groupby with
partition-vectorized numpy segment processing (no per-row Python, no
per-pair tiny groups); the wedge volume is the triangle-counting bound
Σ deg(w)²; the only O(V) side table is the linked-degree map attached
via the capped broadcast in :func:`metrics.attach_degrees` (join
fallback documented there).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Max, Sum

from igraph_ray.utils import hash_int64

# Triad type of each 6-bit arc code over an ordered triple (x, y, z):
# bit 1 = x->y, 2 = y->x, 4 = x->z, 8 = z->x, 16 = y->z, 32 = z->y.
# This is the Batagelj-Mrvar tricode lookup; the 64 entries were
# derived from the published MAN classification (verified against
# networkx.triadic_census on all 64 single-triad digraphs in
# tests/test_triads.py).
TRICODE_TYPE = (
    "003", "012", "012", "102", "012", "021D", "021C", "111U",
    "012", "021C", "021U", "111D", "102", "111U", "111D", "201",
    "012", "021C", "021D", "111U", "021U", "030T", "030T", "120U",
    "021C", "030C", "030T", "120C", "111D", "120C", "120D", "210",
    "012", "021U", "021C", "111D", "021C", "030T", "030C", "120C",
    "021D", "030T", "030T", "120D", "111U", "120U", "120C", "210",
    "102", "111D", "111U", "201", "111D", "120D", "120C", "210",
    "111U", "120C", "120U", "210", "201", "210", "210", "300",
)

TRIAD_TYPES = (
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
)
_TYPE_IDX = {t: i for i, t in enumerate(TRIAD_TYPES)}
_TRICODE_IDX = np.array([_TYPE_IDX[t] for t in TRICODE_TYPE], np.int64)

# wedge centers per connected triple = vertices incident to >= 2
# linked pairs: triples with exactly 2 linked pairs have ONE center
# (the shared vertex); triples with 3 linked pairs have all three
_LINKED_PAIRS = {
    "003": 0, "012": 1, "102": 1,
    "021D": 2, "021U": 2, "021C": 2, "111D": 2, "111U": 2, "201": 2,
    "030T": 3, "030C": 3, "120D": 3, "120U": 3, "120C": 3,
    "210": 3, "300": 3,
}
_DIVISOR = np.array(
    [3 if _LINKED_PAIRS[t] == 3 else 1 for t in TRIAD_TYPES], np.int64
)


def pair_states(
    arcs: ray.data.Dataset, src: str = "src", dst: str = "dst"
) -> ray.data.Dataset:
    """Distinct linked unordered pairs ``(a < b, fwd, bwd)`` of a
    directed int64 arc table; loops dropped, duplicate arcs collapsed.
    ``fwd`` = arc a->b present, ``bwd`` = arc b->a present."""

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column(src).to_numpy(zero_copy_only=False)
        d = batch.column(dst).to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        fwd = (s < d).astype(np.int64)
        return pa.table(
            {
                "a": pa.array(a),
                "b": pa.array(b),
                "fwd": pa.array(fwd),
                "bwd": pa.array(1 - fwd),
            }
        )

    return (
        arcs.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .aggregate(Max("fwd", alias_name="fwd"), Max("bwd", alias_name="bwd"))
    )


def dyad_census(
    arcs: ray.data.Dataset, n_vertices: int
) -> pa.Table:
    """3-row table ``(dyad_type in {mut, asym, null}, n)`` — the
    Holland-Leinhardt dyad census (igraph ``igraph_dyad_census``)."""

    def partial(batch: pa.Table) -> pa.Table:
        f = batch.column("fwd").to_numpy(zero_copy_only=False)
        b = batch.column("bwd").to_numpy(zero_copy_only=False)
        both = (f > 0) & (b > 0)
        return pa.table(
            {
                "mut": pa.array([int(both.sum())], pa.int64()),
                "asym": pa.array([int(len(f) - both.sum())], pa.int64()),
            }
        )

    res = (
        pair_states(arcs)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(Sum("mut", alias_name="mut"), Sum("asym", alias_name="asym"))
    ) or {}
    mut = int(res.get("mut") or 0)
    asym = int(res.get("asym") or 0)
    null = n_vertices * (n_vertices - 1) // 2 - mut - asym
    return pa.table(
        {
            "dyad_type": pa.array(["mut", "asym", "null"], pa.string()),
            "n": pa.array([mut, asym, null], pa.int64()),
        }
    )


def _num_parts(n_rows: int) -> int:
    return int(max(2, min(256, math.ceil(max(1, n_rows) / 250_000))))


def triad_census(
    arcs: ray.data.Dataset,
    n_vertices: int,
    num_parts: int | None = None,
) -> pa.Table:
    """16-row table ``(triad_type, n)`` — the MAN triad census of the
    int64 directed arc table over ``n_vertices`` vertices (isolated
    vertices included via ``n_vertices``), igraph
    ``igraph_triad_census`` / ``nx.triadic_census`` parity.

    Connected triples are enumerated as wedges through each center
    (volume Σ deg(w)²), classified by the 6-bit tricode after a
    co-partitioned merge with the third pair's state; triangles are
    triple-counted by construction and divided by their 3 centers.
    012/102 use the closed form Σ over linked pairs of
    ``n - deg(a) - deg(b) + common(a, b)``; 003 is the remainder of
    C(n, 3).  All counts are exact integers.
    """
    from igraph_ray.kernels.metrics import attach_degrees, _degree_map

    pairs = pair_states(arcs).materialize()
    n_pairs = pairs.count()
    if num_parts is None:
        num_parts = _num_parts(n_pairs)
    np_parts = np.uint64(num_parts)

    # --- wedge emission: one row per (center u, neighbour pair x<y) --
    def star_arcs(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        f = batch.column("fwd").to_numpy(zero_copy_only=False)
        w = batch.column("bwd").to_numpy(zero_copy_only=False)
        st = (f + 2 * w).astype(np.int64)  # canonical (min->max, max->min)
        u = np.concatenate([a, b])
        v = np.concatenate([b, a])
        s2 = np.concatenate([st, st])
        part = (hash_int64(u) % np_parts).astype(np.int32)
        return pa.table(
            {
                "hpart": pa.array(part),
                "u": pa.array(u),
                "v": pa.array(v),
                "st": pa.array(s2),
            }
        )

    stars = pairs.map_batches(
        star_arcs, batch_format="pyarrow", zero_copy_batch=True
    )

    def wedges(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        st = group.column("st").to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        u, v, st = u[order], v[order], st[order]
        boundary = np.empty(len(u), dtype=bool)
        if len(u):
            boundary[0] = True
            boundary[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(boundary)
        ends = np.append(starts[1:], len(u))
        cs, xs, ys, sx, sy = [], [], [], [], []
        for s0, e0 in zip(starts, ends):
            d = e0 - s0
            if d < 2:
                continue
            o = np.argsort(v[s0:e0], kind="stable")
            nb, ns = v[s0:e0][o], st[s0:e0][o]
            ii, jj = np.triu_indices(d, k=1)
            cs.append(np.full(len(ii), u[s0], np.int64))
            xs.append(nb[ii])
            ys.append(nb[jj])
            sx.append(ns[ii])
            sy.append(ns[jj])
        if cs:
            c = np.concatenate(cs)
            x = np.concatenate(xs)
            y = np.concatenate(ys)
            stx = np.concatenate(sx)
            sty = np.concatenate(sy)
        else:
            c = x = y = stx = sty = np.empty(0, np.int64)
        # missing pair = (x, y) (x < y by construction); slot layout of
        # the sorted triple (t0<t1<t2): s01, s02, s12.  The center c is
        # before, between, or after x..y — the missing (x, y) pair
        # occupies slot 12, 02, or 01 respectively; the center's two
        # known states fill the remaining slots in canonical order.
        s01 = np.empty(len(c), np.int64)
        s02 = np.empty(len(c), np.int64)
        s12 = np.empty(len(c), np.int64)
        lo = c < x
        hi = c > y
        mid = ~lo & ~hi
        # c < x < y: triple (c,x,y); (c,x)=slot01, (c,y)=slot02
        s01[lo], s02[lo], s12[lo] = stx[lo], sty[lo], -1
        # x < c < y: triple (x,c,y); (c,x)=slot01, (c,y)=slot12
        s01[mid], s02[mid], s12[mid] = stx[mid], -1, sty[mid]
        # x < y < c: triple (x,y,c); (c,x)=slot02, (c,y)=slot12
        s01[hi], s02[hi], s12[hi] = -1, stx[hi], sty[hi]
        part = (
            (hash_int64(x) ^ hash_int64(y + np.int64(0x9E3779B9))) % np_parts
        ).astype(np.int32)
        return pa.table(
            {
                "mpart": pa.array(part),
                "mpa": pa.array(x),
                "mpb": pa.array(y),
                "s01": pa.array(s01),
                "s02": pa.array(s02),
                "s12": pa.array(s12),
                "kind": pa.array(np.zeros(len(c), np.int8), pa.int8()),
            }
        )

    wedge_rows = stars.groupby("hpart").map_groups(
        wedges, batch_format="pyarrow"
    )

    def state_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        f = batch.column("fwd").to_numpy(zero_copy_only=False)
        w = batch.column("bwd").to_numpy(zero_copy_only=False)
        st = (f + 2 * w).astype(np.int64)
        part = (
            (hash_int64(a) ^ hash_int64(b + np.int64(0x9E3779B9))) % np_parts
        ).astype(np.int32)
        return pa.table(
            {
                "mpart": pa.array(part),
                "mpa": pa.array(a),
                "mpb": pa.array(b),
                "s01": pa.array(st),  # carries the pair's own state
                "s02": pa.array(np.zeros(len(a), np.int64)),
                "s12": pa.array(np.zeros(len(a), np.int64)),
                "kind": pa.array(np.ones(len(a), np.int8), pa.int8()),
            }
        )

    tagged = wedge_rows.union(
        pairs.map_batches(
            state_rows, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    # --- per missing-pair merge: fill the third state, classify, and
    # emit (a) 16 census partial counts and (b) per-linked-pair
    # (a, b, st, common) stats for the 012/102 closed forms -----------
    def classify(group: pa.Table) -> pa.Table:
        mpa = group.column("mpa").to_numpy(zero_copy_only=False)
        mpb = group.column("mpb").to_numpy(zero_copy_only=False)
        s01 = group.column("s01").to_numpy(zero_copy_only=False)
        s02 = group.column("s02").to_numpy(zero_copy_only=False)
        s12 = group.column("s12").to_numpy(zero_copy_only=False)
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        if len(mpa) == 0:  # pragma: no cover - map_groups skips empties
            return pa.table(
                {
                    "kind": pa.array([], pa.int8()),
                    "k1": pa.array([], pa.int64()),
                    "k2": pa.array([], pa.int64()),
                    "v1": pa.array([], pa.int64()),
                    "v2": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((kind, mpb, mpa))
        mpa, mpb = mpa[order], mpb[order]
        s01, s02, s12 = s01[order], s02[order], s12[order]
        kind = kind[order]
        boundary = np.empty(len(mpa), dtype=bool)
        if len(mpa):
            boundary[0] = True
            boundary[1:] = (mpa[1:] != mpa[:-1]) | (mpb[1:] != mpb[:-1])
        starts = np.flatnonzero(boundary)
        ends = np.append(starts[1:], len(mpa))
        seg_len = ends - starts
        # state row, if present, sorts LAST within its segment
        has_state = np.zeros(len(starts), dtype=bool)
        seg_state = np.zeros(len(starts), np.int64)
        if len(mpa):
            last = ends - 1
            has_state = kind[last] == 1
            seg_state[has_state] = s01[last[has_state]]
        n_wedge = seg_len - has_state.astype(np.int64)
        # fill each wedge row's missing slot with its segment's state
        fill = np.repeat(seg_state, seg_len)
        wmask = kind == 0
        s01 = np.where(wmask & (s01 < 0), fill, s01)
        s02 = np.where(wmask & (s02 < 0), fill, s02)
        s12 = np.where(wmask & (s12 < 0), fill, s12)
        code = (
            (s01 & 1) + 2 * (s01 >> 1)
            + 4 * (s02 & 1) + 8 * (s02 >> 1)
            + 16 * (s12 & 1) + 32 * (s12 >> 1)
        )
        counts = np.bincount(
            _TRICODE_IDX[code[wmask]], minlength=len(TRIAD_TYPES)
        ).astype(np.int64)
        # linked-pair stats: (a, b, st, common = wedge rows in segment)
        a_s = mpa[starts[has_state]]
        b_s = mpb[starts[has_state]]
        st_s = seg_state[has_state]
        common = n_wedge[has_state]
        k = len(TRIAD_TYPES)
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(k, np.int8), np.ones(len(a_s), np.int8)]
                    ),
                    pa.int8(),
                ),
                "k1": pa.array(
                    np.concatenate([np.arange(k, dtype=np.int64), a_s])
                ),
                "k2": pa.array(
                    np.concatenate([np.zeros(k, np.int64), b_s])
                ),
                "v1": pa.array(np.concatenate([counts, st_s])),
                "v2": pa.array(np.concatenate([np.zeros(k, np.int64), common])),
            }
        )

    merged = tagged.groupby("mpart").map_groups(
        classify, batch_format="pyarrow"
    ).materialize()

    # --- census totals for connected classes -------------------------
    def census_part(batch: pa.Table) -> pa.Table:
        m = batch.filter(pc.equal(batch.column("kind"), 0))
        idx = m.column("k1").to_numpy(zero_copy_only=False)
        cnt = m.column("v1").to_numpy(zero_copy_only=False)
        tot = np.zeros(len(TRIAD_TYPES), np.int64)
        np.add.at(tot, idx, cnt)  # int-exact (bincount weights are f64)
        return pa.table(
            {
                f"t{i}": pa.array([int(tot[i])], pa.int64())
                for i in range(len(TRIAD_TYPES))
            }
        )

    cens = merged.map_batches(
        census_part, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(
        *[Sum(f"t{i}", alias_name=f"t{i}") for i in range(len(TRIAD_TYPES))]
    ) or {}
    counts = np.array(
        [int(cens.get(f"t{i}") or 0) for i in range(len(TRIAD_TYPES))],
        np.int64,
    )
    counts //= _DIVISOR  # triangles are seen once per linked pair

    # --- 012 / 102 closed forms over linked pairs --------------------
    def pair_rows(batch: pa.Table) -> pa.Table:
        m = batch.filter(pc.equal(batch.column("kind"), 1))
        return pa.table(
            {
                "src": m.column("k1"),
                "dst": m.column("k2"),
                "st": m.column("v1"),
                "common": m.column("v2"),
            }
        )

    stats = merged.map_batches(
        pair_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    degs = _degree_map(pairs.select_columns(["a", "b"]).rename_columns(
        {"a": "src", "b": "dst"}
    ))
    with_deg = attach_degrees(stats, degs)

    def closed_form(batch: pa.Table) -> pa.Table:
        st = batch.column("st").to_numpy(zero_copy_only=False)
        cm = batch.column("common").to_numpy(zero_copy_only=False)
        da = batch.column("deg_src").to_numpy(zero_copy_only=False)
        db = batch.column("deg_dst").to_numpy(zero_copy_only=False)
        third = n_vertices - da - db + cm  # vertices adjacent to neither
        mut = st == 3
        return pa.table(
            {
                "n102": pa.array([int(third[mut].sum())], pa.int64()),
                "n012": pa.array([int(third[~mut].sum())], pa.int64()),
            }
        )

    cf = with_deg.map_batches(
        closed_form, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(
        Sum("n102", alias_name="n102"), Sum("n012", alias_name="n012")
    ) or {}
    counts[_TYPE_IDX["102"]] = int(cf.get("n102") or 0)
    counts[_TYPE_IDX["012"]] = int(cf.get("n012") or 0)

    total = (
        n_vertices * (n_vertices - 1) * (n_vertices - 2) // 6
        if n_vertices >= 3
        else 0
    )
    counts[_TYPE_IDX["003"]] = total - int(
        counts.sum() - counts[_TYPE_IDX["003"]]
    )
    return pa.table(
        {
            "triad_type": pa.array(list(TRIAD_TYPES), pa.string()),
            "n": pa.array(counts, pa.int64()),
        }
    )


def cocitation_counts(
    arcs: ray.data.Dataset,
    mode: str = "cocitation",
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(a, b, common) for every unordered vertex pair with >= 1 common
    in-neighbour (``mode="cocitation"``, igraph ``igraph_cocitation``)
    or common out-neighbour (``mode="bibcoupling"``,
    ``igraph_bibcoupling``).  Loops and duplicate arcs ignored; pairs
    with zero count are omitted (the dense matrix is O(n^2))."""
    if mode not in ("cocitation", "bibcoupling"):
        raise ValueError(f"unknown mode: {mode}")
    center, leaf = ("src", "dst") if mode == "cocitation" else ("dst", "src")
    n_arcs = arcs.count()
    if num_parts is None:
        num_parts = _num_parts(n_arcs)
    np_parts = np.uint64(num_parts)

    def keyed(batch: pa.Table) -> pa.Table:
        c = batch.column(center).to_numpy(zero_copy_only=False)
        v = batch.column(leaf).to_numpy(zero_copy_only=False)
        keep = c != v
        c, v = c[keep], v[keep]
        part = (hash_int64(c) % np_parts).astype(np.int32)
        return pa.table(
            {"hpart": pa.array(part), "u": pa.array(c), "v": pa.array(v)}
        )

    star = arcs.map_batches(
        keyed, batch_format="pyarrow", zero_copy_batch=True
    )

    def pairs_of(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        u, v = u[order], v[order]
        boundary = np.empty(len(u), dtype=bool)
        if len(u):
            boundary[0] = True
            boundary[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(boundary)
        ends = np.append(starts[1:], len(u))
        out_a, out_b = [], []
        for s0, e0 in zip(starts, ends):
            nb = np.unique(v[s0:e0])  # collapse duplicate arcs
            if len(nb) < 2:
                continue
            ii, jj = np.triu_indices(len(nb), k=1)
            out_a.append(nb[ii])
            out_b.append(nb[jj])
        if out_a:
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
        else:
            a = b = np.empty(0, np.int64)
        return pa.table(
            {
                "a": pa.array(a),
                "b": pa.array(b),
                "common": pa.array(np.ones(len(a), np.int64)),
            }
        )

    return (
        star.groupby("hpart")
        .map_groups(pairs_of, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("common", alias_name="common"))
    )
