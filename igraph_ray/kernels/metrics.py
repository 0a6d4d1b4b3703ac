"""Whole-graph scalar metrics and per-edge vertex similarity.

Covers the igraph surface ``igraph_reciprocity``, ``igraph_density``,
``igraph_assortativity_degree`` and ``igraph_similarity_jaccard``
(networkx twins: ``nx.reciprocity``, ``nx.density``,
``nx.degree_assortativity_coefficient``, ``nx.jaccard_coefficient``).

All four are one-or-two-shuffle Ray Data pipelines:

- reciprocity: distinct arcs → canonical-pair groupby (one shuffle),
  partial sums per batch, scalar division on the driver.
- density: two scalar counts, no shuffle beyond the input aggregates.
- assortativity: degrees (one endpoint groupby) broadcast back onto
  the arc table; the Pearson sufficient statistics (Σx, Σy, Σxy, Σx²,
  Σy², m) are exact int64 partial sums combined with ``Dataset.sum`` —
  the final coefficient is a handful of driver-side IEEE ops on exact
  integers, so a SQL twin replaying the same expression matches
  bitwise.
- jaccard: common-neighbour counts by wedge emission per centre
  vertex (hash-partitioned segments, numpy pair generation), then one
  groupby joining wedge counts onto the edge set, degrees broadcast.
  Wedge volume is Σ deg(w)² — the same bound as triangle counting;
  ``max_degree`` caps hub centres for the estimate-at-scale mode
  (default exact, matching the SQL twin).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Sum

from igraph_ray.utils import hash_int64


def _sum_cols(ds: ray.data.Dataset, cols: list[str]) -> dict[str, float]:
    """ONE pass over ``ds`` summing several columns (a single tree
    aggregate — per-column ``ds.sum`` would re-execute the upstream
    pipeline once per column)."""
    res = ds.aggregate(*[Sum(c, alias_name=c) for c in cols]) or {}
    return {c: res.get(c) or 0 for c in cols}


# ---------------------------------------------------------------------------
# reciprocity
# ---------------------------------------------------------------------------
def reciprocity(
    arcs: ray.data.Dataset, src: str = "src", dst: str = "dst"
) -> tuple[float, int, int]:
    """(ratio, n_arcs, n_reciprocated) over a directed edge table.

    igraph ``igraph_reciprocity(ignore_loops=True)`` / networkx
    ``nx.overall_reciprocity`` semantics: the fraction of distinct
    non-loop arcs (u, v) whose reverse (v, u) is also present.
    """

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

    pairs = (
        arcs.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .aggregate(Max("fwd", alias_name="fwd"), Max("bwd", alias_name="bwd"))
    )

    def partial(batch: pa.Table) -> pa.Table:
        f = batch.column("fwd").to_numpy(zero_copy_only=False)
        b = batch.column("bwd").to_numpy(zero_copy_only=False)
        both = (f > 0) & (b > 0)
        return pa.table(
            {
                "arcs": pa.array([int(f.sum() + b.sum())], pa.int64()),
                "recip": pa.array([int(2 * both.sum())], pa.int64()),
            }
        )

    sums = _sum_cols(
        pairs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["arcs", "recip"],
    )
    m = int(sums["arcs"])
    r = int(sums["recip"])
    return (r / m if m else 0.0), m, r


# ---------------------------------------------------------------------------
# density
# ---------------------------------------------------------------------------
def density(n_vertices: int, n_edges: int, directed: bool = False) -> float:
    """``nx.density`` / ``igraph_density``: m / (n·(n-1)) for directed,
    2m / (n·(n-1)) for undirected simple graphs."""
    if n_vertices <= 1:
        return 0.0
    d = n_edges / (n_vertices * (n_vertices - 1))
    return d if directed else 2.0 * d


# ---------------------------------------------------------------------------
# degree assortativity
# ---------------------------------------------------------------------------
def _degree_map(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """(key, degree) from an unordered-pair edge table (src/dst)."""

    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pa.concat_arrays(
                    [
                        batch.column("src").combine_chunks(),
                        batch.column("dst").combine_chunks(),
                    ]
                )
            }
        )

    return (
        pairs.map_batches(endpoints, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .aggregate(Count("key", alias_name="degree"))
    )


class _DegreeLookup:
    """Actor holding the broadcast key→degree table (fetched once per
    worker in ``__init__``, not per batch)."""

    def __init__(self, ref, cols: list[str]):
        tbl = ray.get(ref)
        keys = tbl.column("key").combine_chunks()
        order = pc.sort_indices(keys)
        self._keys = pc.take(keys, order)
        self._deg = pc.take(tbl.column("degree"), order).to_numpy(
            zero_copy_only=False
        )
        self._cols = cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = dict(zip(batch.column_names, batch.columns))
        karr = self._keys.to_numpy(zero_copy_only=False)
        for c in self._cols:
            v = batch.column(c).to_numpy(zero_copy_only=False)
            pos = np.searchsorted(karr, v)
            out[f"deg_{c}"] = pa.array(self._deg[pos].astype(np.int64))
        return pa.table(out)


def attach_degrees(
    pairs: ray.data.Dataset,
    degrees: ray.data.Dataset,
    cols: tuple[str, ...] = ("src", "dst"),
) -> ray.data.Dataset:
    """Add ``deg_src``/``deg_dst`` columns.  Degrees are O(V) rows —
    broadcast once via ``ray.put`` (the engine's small-side rule); for
    vertex sets beyond broadcast reach, swap in ``Dataset.join`` keyed
    on each endpoint (same fallback shape as ``attach_vids``)."""
    dtbl = pa.concat_tables(
        degrees.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    ref = ray.put(dtbl)
    return pairs.map_batches(
        _DegreeLookup,
        fn_constructor_args=(ref, list(cols)),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


def degree_assortativity(
    pairs: ray.data.Dataset,
) -> tuple[float, dict[str, int]]:
    """Pearson degree assortativity over an unordered-pair edge table
    (each edge counted from both endpoints, the undirected convention
    of ``nx.degree_assortativity_coefficient``).

    Returns ``(r, stats)`` where stats holds the exact int64 sufficient
    statistics (m, sx, sy, sxy, sxx, syy) — sx == sy for undirected
    input but both are carried so the directed form reuses this code.
    """
    degs = _degree_map(pairs)
    with_deg = attach_degrees(pairs, degs)

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column("deg_src").to_numpy(zero_copy_only=False)
        y = batch.column("deg_dst").to_numpy(zero_copy_only=False)
        # both directions of each unordered pair
        xs = np.concatenate([x, y]).astype(np.int64)
        ys = np.concatenate([y, x]).astype(np.int64)
        return pa.table(
            {
                "m": pa.array([len(xs)], pa.int64()),
                "sx": pa.array([int(xs.sum())], pa.int64()),
                "sy": pa.array([int(ys.sum())], pa.int64()),
                "sxy": pa.array([int((xs * ys).sum())], pa.int64()),
                "sxx": pa.array([int((xs * xs).sum())], pa.int64()),
                "syy": pa.array([int((ys * ys).sum())], pa.int64()),
            }
        )

    sums = _sum_cols(
        with_deg.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["m", "sx", "sy", "sxy", "sxx", "syy"],
    )
    stats = {k: int(v) for k, v in sums.items()}
    m, sx, sy = stats["m"], stats["sx"], stats["sy"]
    cov = float(m * stats["sxy"] - sx * sy)
    vx = float(m * stats["sxx"] - sx * sx)
    vy = float(m * stats["syy"] - sy * sy)
    denom = math.sqrt(vx * vy)
    r = cov / denom if denom > 0 else float("nan")
    return r, stats


# ---------------------------------------------------------------------------
# Jaccard vertex similarity (per edge)
# ---------------------------------------------------------------------------
def _wedge_pair_weights(
    pairs: ray.data.Dataset,
    num_parts: int | None,
    max_degree: int | None,
    center_weight: str,
) -> ray.data.Dataset:
    """Rows (a, b, common, is_edge=0) — for every unordered vertex
    pair with ≥1 common neighbour, the sum over common neighbours w of
    1 (``center_weight="one"``), 1/ln(deg(w)) (``"invlog"``,
    Adamic–Adar) or 1/deg(w) (``"inv"``, Burt's constraint).

    Wedge volume is Σ deg(w)² — the triangle-counting bound;
    ``max_degree`` caps hub centres for the estimate-at-scale mode.
    """
    n_edges = pairs.count()
    if num_parts is None:
        num_parts = int(
            max(2, min(256, math.ceil(max(1, n_edges) / 250_000)))
        )

    def arcs_with_part(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        u = np.concatenate([s, d])
        v = np.concatenate([d, s])
        part = (hash_int64(u) % np.uint64(num_parts)).astype(np.int32)
        return pa.table(
            {"hpart": pa.array(part), "u": pa.array(u), "v": pa.array(v)}
        )

    arcs = pairs.map_batches(
        arcs_with_part, batch_format="pyarrow", zero_copy_batch=True
    )

    def wedges(group: pa.Table) -> pa.Table:
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
        out_a, out_b, out_w = [], [], []
        for s0, e0 in zip(starts, ends):
            d = e0 - s0
            if d < 2 or (max_degree is not None and d > max_degree):
                continue
            nb = np.sort(v[s0:e0])
            ii, jj = np.triu_indices(d, k=1)
            out_a.append(nb[ii])
            out_b.append(nb[jj])
            if center_weight == "invlog":
                w = 1.0 / math.log(d)
            elif center_weight == "inv":
                w = 1.0 / d
            else:
                w = 1.0
            out_w.append(np.full(len(ii), w))
        if out_a:
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
            w = np.concatenate(out_w)
        else:
            a = np.empty(0, np.int64)
            b = np.empty(0, np.int64)
            w = np.empty(0, np.float64)
        return pa.table(
            {
                "a": pa.array(a),
                "b": pa.array(b),
                "common": pa.array(w),
                "is_edge": pa.array(np.zeros(len(a), np.int64)),
            }
        )

    return arcs.groupby("hpart").map_groups(wedges, batch_format="pyarrow")


def _merge_onto_edges(
    pairs: ray.data.Dataset, wedge_pairs: ray.data.Dataset
) -> ray.data.Dataset:
    """Keep (src, dst, common) for pairs that are edges — one tagged
    groupby instead of a join."""

    def edge_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": pa.array(np.minimum(s, d)),
                "b": pa.array(np.maximum(s, d)),
                "common": pa.array(np.zeros(len(s), np.float64)),
                "is_edge": pa.array(np.ones(len(s), np.int64)),
            }
        )

    tagged = wedge_pairs.union(
        pairs.map_batches(
            edge_rows, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    merged = tagged.groupby(["a", "b"]).aggregate(
        Sum("common", alias_name="common"),
        Sum("is_edge", alias_name="is_edge"),
    )

    def keep_edges(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch.column("is_edge"), 0))

    return merged.map_batches(
        keep_edges, batch_format="pyarrow", zero_copy_batch=True
    ).rename_columns({"a": "src", "b": "dst"})


def jaccard_edge_similarity(
    pairs: ray.data.Dataset,
    num_parts: int | None = None,
    max_degree: int | None = None,
) -> ray.data.Dataset:
    """Per-edge Jaccard AND Dice similarity of the endpoints'
    neighbourhoods for every unordered pair in ``pairs`` (columns
    src/dst, one row per pair): ``jaccard = |N(u)∩N(v)| / |N(u)∪N(v)|``
    (``nx.jaccard_coefficient(G, ebunch=G.edges())`` /
    igraph ``similarity_jaccard``), ``dice = 2|N(u)∩N(v)| /
    (deg(u)+deg(v))`` (igraph ``similarity_dice``).

    ``max_degree`` caps hub wedge-centres (estimate-at-scale mode);
    leave ``None`` for exact results.
    """
    wedge_pairs = _wedge_pair_weights(
        pairs, num_parts, max_degree, center_weight="one"
    )
    only_edges = _merge_onto_edges(pairs, wedge_pairs)
    degs = _degree_map(pairs)
    with_deg = attach_degrees(
        only_edges.select_columns(["src", "dst", "common"]), degs
    )

    def finish(batch: pa.Table) -> pa.Table:
        c = batch.column("common").to_numpy(zero_copy_only=False)
        c = c.astype(np.int64)
        du = batch.column("deg_src").to_numpy(zero_copy_only=False)
        dv = batch.column("deg_dst").to_numpy(zero_copy_only=False)
        union = du + dv - c
        with np.errstate(divide="ignore", invalid="ignore"):
            j = np.where(union > 0, c / union, 0.0)
            dice = np.where(du + dv > 0, (2 * c) / (du + dv), 0.0)
        return pa.table(
            {
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "common": pa.array(c),
                "jaccard": pa.array(j.astype(np.float64)),
                "dice": pa.array(dice.astype(np.float64)),
            }
        )

    return with_deg.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def _wedge_center_deg_rows(
    pairs: ray.data.Dataset,
    num_parts: int | None,
    max_degree: int | None,
) -> ray.data.Dataset:
    """Rows ``(a, b, deg)`` — one row per (unordered vertex pair,
    common neighbour) carrying the centre's EXACT integer degree.
    Same wedge enumeration as :func:`_wedge_pair_weights`, but the
    float centre weight is deferred so downstream can aggregate
    ``(pair, deg) → cnt`` in exact integers and apply the float
    weighting in a DEFINED order (the bitwise-twin contract)."""
    n_edges = pairs.count()
    if num_parts is None:
        num_parts = int(
            max(2, min(256, math.ceil(max(1, n_edges) / 250_000)))
        )

    def arcs_with_part(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        u = np.concatenate([s, d])
        v = np.concatenate([d, s])
        part = (hash_int64(u) % np.uint64(num_parts)).astype(np.int32)
        return pa.table(
            {"hpart": pa.array(part), "u": pa.array(u), "v": pa.array(v)}
        )

    arcs = pairs.map_batches(
        arcs_with_part, batch_format="pyarrow", zero_copy_batch=True
    )

    def wedges(group: pa.Table) -> pa.Table:
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
        out_a, out_b, out_d = [], [], []
        for s0, e0 in zip(starts, ends):
            d = e0 - s0
            if d < 2 or (max_degree is not None and d > max_degree):
                continue
            nb = np.sort(v[s0:e0])
            ii, jj = np.triu_indices(d, k=1)
            out_a.append(nb[ii])
            out_b.append(nb[jj])
            out_d.append(np.full(len(ii), d, np.int64))
        if out_a:
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
            dd = np.concatenate(out_d)
        else:
            a = np.empty(0, np.int64)
            b = np.empty(0, np.int64)
            dd = np.empty(0, np.int64)
        return pa.table(
            {"a": pa.array(a), "b": pa.array(b), "deg": pa.array(dd)}
        )

    return arcs.groupby("hpart").map_groups(wedges, batch_format="pyarrow")


def _chain_merge_onto_edges(
    pairs: ray.data.Dataset,
    wedge_degs: ray.data.Dataset,
    inv_mode: str,
    value_name: str,
) -> ray.data.Dataset:
    """Per EDGE pair, the order-defined float sum
    ``Σ_{distinct centre degree d, ascending} cnt_d · inv(d)`` with
    ``inv = 1/ln(d)`` (``inv_mode="invlog"``, Adamic–Adar, libm log so
    DuckDB ``ln`` matches bitwise) or ``1/d`` (``"inv"``, resource
    allocation).  Rows ``(src, dst, <value_name>)``.

    Shape: ONE hash shuffle — wedge rows and edge-marker rows
    (``deg = -1``) co-partitioned by pair, then a vectorized per-group
    (histogram → ascending-deg IEEE chain).  The chain order makes the
    result independent of block layout, so the SQL twin replays it
    bit-for-bit via a recursive CTE over the degree rank."""
    n_pairs = pairs.count()
    chain_parts = int(max(2, min(256, math.ceil(max(1, n_pairs) / 250_000))))

    def edge_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": pa.array(np.minimum(s, d)),
                "b": pa.array(np.maximum(s, d)),
                "deg": pa.array(np.full(len(s), -1, np.int64)),
            }
        )

    tagged = wedge_degs.union(
        pairs.map_batches(
            edge_rows, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def add_hpart(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            fused = hash_int64(a) ^ hash_int64(~b)
        part = (fused % np.uint64(chain_parts)).astype(np.int32)
        return batch.append_column("cpart", pa.array(part))

    def chain_group(group: pa.Table) -> pa.Table:
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        deg = group.column("deg").to_numpy(zero_copy_only=False)
        order = np.lexsort((deg, b, a))
        a, b, deg = a[order], b[order], deg[order]
        # aggregate equal (a, b, deg) runs → exact integer counts
        n = len(a)
        if n == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    value_name: pa.array([], pa.float64()),
                }
            )
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = (
            (a[1:] != a[:-1]) | (b[1:] != b[:-1]) | (deg[1:] != deg[:-1])
        )
        kstart = np.flatnonzero(new_key)
        kcnt = np.diff(np.append(kstart, n))
        ua, ub, udeg = a[kstart], b[kstart], deg[kstart]
        # pair segmentation over the aggregated rows
        new_pair = np.empty(len(ua), bool)
        new_pair[0] = True
        new_pair[1:] = (ua[1:] != ua[:-1]) | (ub[1:] != ub[:-1])
        pid = np.cumsum(new_pair) - 1
        pstart = np.flatnonzero(new_pair)
        npairs = int(pid[-1]) + 1
        # edge markers (deg == -1) sort first within their pair
        is_marker = udeg == -1
        has_edge = np.zeros(npairs, bool)
        has_edge[pid[is_marker]] = True
        # rank of each wedge row within its pair, ascending degree
        rank_in_pair = np.arange(len(ua)) - pstart[pid]
        wrank = rank_in_pair - has_edge[pid].astype(np.int64)
        wmask = ~is_marker
        # float weights per distinct degree (libm log for the twin)
        contrib = np.zeros(len(ua), np.float64)
        if wmask.any():
            uniq_deg = np.unique(udeg[wmask])
            if inv_mode == "invlog":
                lut = {
                    int(dv): 1.0 / math.log(int(dv)) for dv in uniq_deg
                }
                inv = np.array(
                    [lut[int(dv)] for dv in udeg[wmask]], np.float64
                )
            else:  # "inv"
                inv = 1.0 / udeg[wmask].astype(np.float64)
            contrib[wmask] = kcnt[wmask].astype(np.float64) * inv
        # left-to-right chain across ascending-degree ranks
        acc = np.zeros(npairs, np.float64)
        if wmask.any():
            for r in range(int(wrank[wmask].max()) + 1):
                m = wmask & (wrank == r)
                acc[pid[m]] = acc[pid[m]] + contrib[m]
        keep = has_edge
        return pa.table(
            {
                "src": pa.array(ua[pstart][keep]),
                "dst": pa.array(ub[pstart][keep]),
                value_name: pa.array(acc[keep]),
            }
        )

    return (
        tagged.map_batches(
            add_hpart, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("cpart")
        .map_groups(chain_group, batch_format="pyarrow")
    )


def adamic_adar_edges(
    pairs: ray.data.Dataset,
    num_parts: int | None = None,
    max_degree: int | None = None,
) -> ray.data.Dataset:
    """Per-edge Adamic–Adar index ``Σ_{w ∈ N(u)∩N(v)} 1/ln(deg w)``
    (``nx.adamic_adar_index(G, ebunch=G.edges())`` / igraph
    ``similarity_inverse_log_weighted`` flavour) — the wedge pipeline
    with deferred 1/ln(deg) centre weights applied as an
    ascending-degree IEEE chain (``_chain_merge_onto_edges``), so the
    result is block-layout-independent and the SQL twin replays it
    bitwise.  Rows ``(src, dst, adamic_adar)``."""
    wedge_degs = _wedge_center_deg_rows(pairs, num_parts, max_degree)
    return _chain_merge_onto_edges(
        pairs, wedge_degs, "invlog", "adamic_adar"
    )


def local_bridges(
    pairs: ray.data.Dataset,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Rows ``(src, dst)`` — the edges that are LOCAL BRIDGES: their
    endpoints share no common neighbour, i.e. the edge lies on no
    triangle and its span is > 2 (``nx.local_bridges(G,
    with_span=False)`` semantics).  Reuses the triangle-bounded wedge
    pipeline; the per-edge common-neighbour count is integer-exact, so
    the membership test (``common == 0``) is layout-invariant."""
    wedge_pairs = _wedge_pair_weights(
        pairs, num_parts, None, center_weight="one"
    )
    only_edges = _merge_onto_edges(pairs, wedge_pairs)

    def keep_bridges(batch: pa.Table) -> pa.Table:
        c = batch.column("common").to_numpy(zero_copy_only=False)
        out = batch.filter(pa.array(c == 0.0))
        return out.select(["src", "dst"])

    return only_edges.map_batches(
        keep_bridges, batch_format="pyarrow", zero_copy_batch=True
    )


def effective_size(
    pairs: ray.data.Dataset,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Rows ``(key, degree, ties2, effective_size)`` for every vertex
    with degree ≥ 1 — Burt's effective size of the ego network under
    the unweighted Borgatti simplification ``e(v) = deg(v) −
    2·t(v)/deg(v)`` (``nx.effective_size`` for unweighted graphs),
    where ``t(v)`` is the number of ties among v's neighbours
    (= triangles through v).  ``ties2 = 2·t(v)`` is accumulated as an
    exact integer (each triangle {v,a,b} contributes 1 to the common
    count of edges (v,a) AND (v,b)), so the only float op is one IEEE
    division + subtraction per row — bitwise-stable across layouts."""
    wedge_pairs = _wedge_pair_weights(
        pairs, num_parts, None, center_weight="one"
    )
    only_edges = _merge_onto_edges(pairs, wedge_pairs)

    def scatter_common(batch: pa.Table) -> pa.Table:
        c = (
            batch.column("common")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        key = pa.concat_arrays(
            [
                batch.column("src").combine_chunks(),
                batch.column("dst").combine_chunks(),
            ]
        )
        t = pa.table(
            {"key": key, "c": pa.array(np.concatenate([c, c]))}
        )
        # per-batch integer pre-combine before the vertex-keyed shuffle
        g = t.group_by("key").aggregate([("c", "sum")])
        return pa.table(
            {"key": g.column("key"), "ties2": g.column("c_sum")}
        )

    from ray.data.aggregate import Sum

    sums = (
        only_edges.map_batches(
            scatter_common, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("key")
        .aggregate(Sum("ties2", alias_name="ties2"))
        .materialize()
    )
    degs = _degree_map(pairs)

    # both sides are O(V); ties2 broadcast once (small-side rule —
    # same join fallback as attach_degrees for vertex sets beyond it)
    stbl = pa.concat_tables(
        sums.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    ref = ray.put(stbl)

    def finish(batch: pa.Table) -> pa.Table:
        lut = ray.get(ref)
        lkeys = lut.column("key").to_numpy(zero_copy_only=False)
        lvals = lut.column("ties2").to_numpy(zero_copy_only=False)
        order = np.argsort(lkeys, kind="stable")
        lkeys, lvals = lkeys[order], lvals[order]
        k = batch.column("key").to_numpy(zero_copy_only=False)
        deg = (
            batch.column("degree")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        pos = np.searchsorted(lkeys, k)
        pos_c = np.clip(pos, 0, max(len(lkeys) - 1, 0))
        hit = (
            (lkeys[pos_c] == k)
            if len(lkeys)
            else np.zeros(len(k), dtype=bool)
        )
        ties2 = np.where(hit, lvals[pos_c], 0).astype(np.int64)
        es = deg.astype(np.float64) - ties2.astype(
            np.float64
        ) / deg.astype(np.float64)
        return pa.table(
            {
                "key": batch.column("key"),
                "degree": pa.array(deg),
                "ties2": pa.array(ties2),
                "effective_size": pa.array(es),
            }
        )

    return degs.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def s_metric(pairs: ray.data.Dataset) -> int:
    """The s-metric ``Σ_{(u,v) ∈ E} deg(u)·deg(v)`` over the unordered
    pair table (``nx.s_metric`` numerator; Li et al. 2005, "Towards a
    Theory of Scale-Free Graphs").  Per-batch partial sums are carried
    as PYTHON ints (the sum of int64 products overflows int64 at
    10^12-edge scale), reduced on the driver — one streaming pass."""
    degs = _degree_map(pairs)
    wd = attach_degrees(pairs.select_columns(["src", "dst"]), degs)

    def partial(batch: pa.Table) -> pa.Table:
        du = (
            batch.column("deg_src")
            .to_numpy(zero_copy_only=False)
            .astype(object)
        )
        dv = (
            batch.column("deg_dst")
            .to_numpy(zero_copy_only=False)
            .astype(object)
        )
        return pa.table({"p": pa.array([str(int((du * dv).sum()))])})

    parts_tbl = pa.concat_tables(
        wd.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return sum(int(s) for s in parts_tbl.column("p").to_pylist())


def resource_allocation_edges(
    pairs: ray.data.Dataset,
    num_parts: int | None = None,
    max_degree: int | None = None,
) -> ray.data.Dataset:
    """Per-edge resource-allocation index ``Σ_{w ∈ N(u)∩N(v)}
    1/deg(w)`` (``nx.resource_allocation_index(G, ebunch=G.edges())``)
    — the Adamic–Adar wedge pipeline with deferred 1/deg centre
    weights applied as an ascending-degree IEEE chain
    (``_chain_merge_onto_edges``), block-layout-independent and
    bitwise-replayable in SQL.  Rows
    ``(src, dst, resource_allocation)``."""
    wedge_degs = _wedge_center_deg_rows(pairs, num_parts, max_degree)
    return _chain_merge_onto_edges(
        pairs, wedge_degs, "inv", "resource_allocation"
    )


# ---------------------------------------------------------------------------
# rich-club coefficient
# ---------------------------------------------------------------------------
def rich_club(pairs: ray.data.Dataset) -> pa.Table:
    """Rich-club coefficient per degree threshold —
    ``nx.rich_club_coefficient(G, normalized=False)`` parity (igraph
    has no direct twin; the unnormalized φ(k) is the standard form).

    φ(k) = 2·E_k / (N_k·(N_k − 1)) with N_k = #vertices of degree > k
    and E_k = #edges whose BOTH endpoints have degree > k (equivalently
    min(deg_u, deg_v) > k).  Rows ``(k, phi)`` for k = 0..max_deg−1
    with N_k ≥ 2 (where φ is defined), matching the keys networkx
    yields.

    Distributed shape: degrees via one endpoint groupby; degrees
    broadcast back onto the edge table (attach_degrees); per-batch
    histograms of min-endpoint-degree are pre-combined partials, so
    the driver reduces two ≤max_deg-length histograms and takes exact
    int64 suffix sums — no O(V) or O(E) driver state.  All-integer
    sufficient statistics → the SQL twin replays the same IEEE
    division bitwise.
    """
    degs = _degree_map(pairs)
    with_deg = attach_degrees(pairs, degs)

    def edge_hist(batch: pa.Table) -> pa.Table:
        a = batch.column("deg_src").to_numpy(zero_copy_only=False)
        b = batch.column("deg_dst").to_numpy(zero_copy_only=False)
        u, c = np.unique(np.minimum(a, b), return_counts=True)
        return pa.table(
            {
                "d": pa.array(u.astype(np.int64)),
                "c": pa.array(c.astype(np.int64)),
            }
        )

    def node_hist(batch: pa.Table) -> pa.Table:
        u, c = np.unique(
            batch.column("degree").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table(
            {
                "d": pa.array(u.astype(np.int64)),
                "c": pa.array(c.astype(np.int64)),
            }
        )

    def _hist(ds: ray.data.Dataset) -> dict[int, int]:
        out: dict[int, int] = {}
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
            for d, c in zip(
                b.column("d").to_pylist(), b.column("c").to_pylist()
            ):
                out[d] = out.get(d, 0) + c
        return out

    eh = _hist(
        with_deg.map_batches(
            edge_hist, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    nh = _hist(
        degs.map_batches(
            node_hist, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    if not nh:
        return pa.table(
            {"k": pa.array([], pa.int64()), "phi": pa.array([], pa.float64())}
        )
    max_deg = max(nh)
    e_arr = np.zeros(max_deg + 2, dtype=np.int64)
    n_arr = np.zeros(max_deg + 2, dtype=np.int64)
    for d, c in eh.items():
        e_arr[d] += c
    for d, c in nh.items():
        n_arr[d] += c
    # suffix sums: E_k = Σ_{d>k} e_arr[d], N_k = Σ_{d>k} n_arr[d]
    e_suf = np.cumsum(e_arr[::-1])[::-1]
    n_suf = np.cumsum(n_arr[::-1])[::-1]
    ks, phis = [], []
    for k in range(max_deg):
        nk = int(n_suf[k + 1])
        if nk < 2:
            continue
        ek = int(e_suf[k + 1])
        ks.append(k)
        phis.append(2.0 * ek / (nk * (nk - 1.0)))
    return pa.table(
        {"k": pa.array(ks, pa.int64()), "phi": pa.array(phis, pa.float64())}
    )


# ---------------------------------------------------------------------------
# structural diversity (igraph_diversity)
# ---------------------------------------------------------------------------
def diversity(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-vertex structural diversity — ``igraph_diversity``: the
    Shannon entropy of the vertex's incident edge-weight distribution,
    normalized by the entropy of the uniform distribution over its
    degree:

        ``H(v) = (ln S − Σ w·ln w / S) / ln k``,  ``S = Σ w``

    (= ``−Σ p·log p / log k`` with ``p = w/S``; base-independent).
    Degree-1 vertices score 0 by convention (igraph parity); isolated
    vertices never appear in the pair table and emit no row.

    ``pairs``: unique unordered ``(src_key, dst_key, weight)`` rows.
    Fully distributed and decomposable: the per-batch pre-combine
    emits exact partials ``(key, cnt, sum_w, sum_wlnw)`` — entropy is
    an algebra over those three sums — so the only shuffle is one
    key-sized groupby; the finish pass is map-only.
    """

    def partials(batch: pa.Table) -> pa.Table:
        s = batch.column("src_key").combine_chunks()
        d = batch.column("dst_key").combine_chunks()
        w = batch.column("weight").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        keys = pa.concat_arrays([s, d])
        ww = np.concatenate([w, w])
        t = pa.table(
            {
                "key": keys,
                "cnt": pa.array(np.ones(len(ww), np.int64)),
                "sum_w": pa.array(ww),
                # x·ln x → 0 as x→0 (zero-weight edges contribute 0)
                "sum_wlnw": pa.array(
                    np.where(
                        ww > 0,
                        ww * np.log(np.where(ww > 0, ww, 1.0)),
                        0.0,
                    )
                ),
            }
        )
        part = t.group_by("key").aggregate(
            [("cnt", "sum"), ("sum_w", "sum"), ("sum_wlnw", "sum")]
        )
        return part.rename_columns(["key", "cnt", "sum_w", "sum_wlnw"])

    agg = (
        pairs.select_columns(["src_key", "dst_key", "weight"])
        .map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .aggregate(
            Sum("cnt", alias_name="degree"),
            Sum("sum_w", alias_name="sum_w"),
            Sum("sum_wlnw", alias_name="sum_wlnw"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        k = batch.column("degree").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        s = batch.column("sum_w").to_numpy(zero_copy_only=False)
        wl = batch.column("sum_wlnw").to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            h = (np.log(s) - wl / s) / np.log(k)
        h = np.where(k <= 1, 0.0, h)
        return pa.table(
            {
                "key": batch.column("key"),
                "degree": pc.cast(batch.column("degree"), pa.int64()),
                "diversity": pa.array(h),
            }
        )

    return agg.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# average neighbor degree / degree connectivity (igraph knn / knnk)
# ---------------------------------------------------------------------------
def avg_neighbor_degree(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-vertex average neighbour degree over an unordered-pair edge
    table — ``igraph_avg_nearest_neighbor_degree`` knn /
    ``nx.average_neighbor_degree`` parity.

    Rows ``(key, degree, sum_nbr_deg, knn)`` with
    ``knn = sum_nbr_deg / degree`` — exact int64 sufficient statistics
    plus one IEEE division, so a SQL twin replays bitwise.

    Distributed shape: one endpoint groupby for degrees, degrees
    broadcast back onto the edge table, then per-batch pyarrow
    group-by pre-combine (key → Σ nbr_deg, count) before the single
    global groupby — hub vertices receive at most one partial row per
    upstream block, not one per incident edge.
    """
    degs = _degree_map(pairs)
    with_deg = attach_degrees(pairs, degs)

    def emit(batch: pa.Table) -> pa.Table:
        both = pa.table(
            {
                "key": pa.concat_arrays(
                    [
                        batch.column("src").combine_chunks(),
                        batch.column("dst").combine_chunks(),
                    ]
                ),
                "nd": pa.concat_arrays(
                    [
                        batch.column("deg_dst").combine_chunks(),
                        batch.column("deg_src").combine_chunks(),
                    ]
                ),
            }
        )
        part = both.group_by("key").aggregate(
            [("nd", "sum"), ("nd", "count")]
        )
        return part.rename_columns(["key", "s", "c"])

    combined = (
        with_deg.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .aggregate(Sum("s", alias_name="sum_nbr_deg"), Sum("c", alias_name="degree"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        s = batch.column("sum_nbr_deg").to_numpy(zero_copy_only=False)
        c = batch.column("degree").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": batch.column("key"),
                "degree": pa.array(c.astype(np.int64)),
                "sum_nbr_deg": pa.array(s.astype(np.int64)),
                "knn": pa.array(
                    s.astype(np.float64) / c.astype(np.float64)
                ),
            }
        )

    return combined.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def degree_connectivity(pairs: ray.data.Dataset) -> pa.Table:
    """Average degree connectivity — ``nx.average_degree_connectivity``
    / igraph knnk parity: for each degree k, the mean degree of the
    neighbours of all degree-k vertices.

    Rows ``(k, knnk)`` for every degree present.  Per-batch partials
    are (own_degree → Σ nbr_deg, count) histograms bounded by the
    number of DISTINCT degrees (≪ V, typically O(√E)); the driver
    reduces those tiny tables and performs the final IEEE division on
    exact int64 sums — SQL-twin bitwise.
    """
    degs = _degree_map(pairs)
    with_deg = attach_degrees(pairs, degs)

    def part(batch: pa.Table) -> pa.Table:
        x = batch.column("deg_src").to_numpy(zero_copy_only=False)
        y = batch.column("deg_dst").to_numpy(zero_copy_only=False)
        own = np.concatenate([x, y])
        nbr = np.concatenate([y, x]).astype(np.int64)
        u, inv = np.unique(own, return_inverse=True)
        sums = np.bincount(inv, weights=nbr).astype(np.int64)
        cnts = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "d": pa.array(u.astype(np.int64)),
                "s": pa.array(sums),
                "c": pa.array(cnts),
            }
        )

    acc: dict[int, list[int]] = {}
    parts = with_deg.map_batches(
        part, batch_format="pyarrow", zero_copy_batch=True
    )
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for d, s, c in zip(
            b.column("d").to_pylist(),
            b.column("s").to_pylist(),
            b.column("c").to_pylist(),
        ):
            e = acc.setdefault(d, [0, 0])
            e[0] += s
            e[1] += c
    ks = sorted(acc)
    return pa.table(
        {
            "k": pa.array(ks, pa.int64()),
            "knnk": pa.array(
                [acc[k][0] / acc[k][1] for k in ks], pa.float64()
            ),
        }
    )


def attribute_assortativity(
    arcs_with_cats: ray.data.Dataset,
    src_cat: str = "cat_src",
    dst_cat: str = "cat_dst",
) -> tuple[float, dict[str, int]]:
    """Categorical attribute assortativity
    (``nx.attribute_assortativity_coefficient`` /
    ``igraph_assortativity_nominal``) from an ARC table already
    carrying both endpoints' categories (pass arcs in both directions
    for the undirected convention).

    With the integer mixing-matrix counts ``M_ij``, arc total ``N``,
    row sums ``a_i`` and column sums ``b_i``::

        r = (N·Tr(M) − Σ_i a_i b_i) / (N² − Σ_i a_i b_i)

    — exact integer sufficient statistics and ONE final IEEE division,
    so the value replays bitwise in SQL.  Returns ``(r, stats)`` with
    ``stats = {"n": N, "tr": Tr, "ab": Σ a_i b_i}``.

    Scale shape: one grouped count over (src_cat, dst_cat) — the
    mixing matrix is |categories|² tiny rows on the driver.
    """
    mix = (
        arcs_with_cats.groupby([src_cat, dst_cat])
        .aggregate(Count(alias_name="m"))
        .take_all()
    )
    n = sum(r["m"] for r in mix)
    if n == 0:
        raise ValueError("no arcs")
    tr = sum(r["m"] for r in mix if r[src_cat] == r[dst_cat])
    rows: dict[object, int] = {}
    cols: dict[object, int] = {}
    for r in mix:
        rows[r[src_cat]] = rows.get(r[src_cat], 0) + r["m"]
        cols[r[dst_cat]] = cols.get(r[dst_cat], 0) + r["m"]
    ab = sum(rows[c] * cols.get(c, 0) for c in rows)
    denom = n * n - ab
    if denom == 0:
        return 1.0, {"n": n, "tr": tr, "ab": ab}
    return (n * tr - ab) / denom, {"n": n, "tr": tr, "ab": ab}


# ---------------------------------------------------------------------------
# Eulerian circuit / path existence
# ---------------------------------------------------------------------------
def eulerian_summary(
    pairs: ray.data.Dataset, comp_state: ray.data.Dataset
) -> pa.Table:
    """One row ``(n_nonzero_vertices, n_odd_degree, n_edge_components,
    has_euler_circuit, has_euler_path)`` — igraph
    ``has_eulerian_cycle`` / ``has_eulerian_path`` semantics on the
    nonzero-degree subgraph (isolated vertices are ignored, matching
    igraph; networkx ``is_eulerian`` additionally requires no isolated
    vertices — tests compare on graphs without isolates).

    A connected multigraph has an Eulerian circuit iff every vertex
    has even degree, and an Eulerian path iff it has exactly 0 or 2
    odd-degree vertices (Euler 1736 / Hierholzer 1873).

    ``pairs``: unordered unique vid pairs ``(src, dst)``;
    ``comp_state``: ``(vid, comp)`` from the components kernel.
    Fully distributed: one endpoint groupby for degrees, one tagged
    groupby to intersect component labels with nonzero-degree
    vertices, one tiny groupby over component labels — no O(V)
    driver gather.
    """

    def endpoints(batch: pa.Table) -> pa.Table:
        s = batch.column("src").combine_chunks()
        d = batch.column("dst").combine_chunks()
        return pa.table({"vid": pa.concat_arrays([s, d])})

    deg = (
        pairs.map_batches(
            endpoints, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("vid")
        .aggregate(Count("vid", alias_name="degree"))
    )

    def parity(batch: pa.Table) -> pa.Table:
        d = batch.column("degree").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_odd": pa.array([int((d % 2).sum())], pa.int64()),
                "n_nonzero": pa.array([len(d)], pa.int64()),
            }
        )

    sums = (
        deg.map_batches(parity, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(Sum("n_odd", alias_name="n_odd"),
                   Sum("n_nonzero", alias_name="n_nonzero"))
    )
    n_odd = int(sums["n_odd"] or 0)
    n_nonzero = int(sums["n_nonzero"] or 0)

    def tag_deg(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "vid": batch.column("vid"),
                "comp": pa.array(np.full(n, -1, np.int64)),
                "is_deg": pa.array(np.ones(n, np.int64)),
            }
        )

    def tag_comp(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "vid": batch.column("vid"),
                "comp": pc.cast(batch.column("comp"), pa.int64()),
                "is_deg": pa.array(np.zeros(n, np.int64)),
            }
        )

    tagged = deg.map_batches(
        tag_deg, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        comp_state.select_columns(["vid", "comp"]).map_batches(
            tag_comp, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    merged = tagged.groupby("vid").aggregate(
        Max("comp", alias_name="comp"),
        Sum("is_deg", alias_name="is_deg"),
    )

    def keep_nonzero(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch.column("is_deg"), 0))

    n_comp = (
        merged.map_batches(
            keep_nonzero, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("comp")
        .aggregate(Count("comp", alias_name="n"))
        .count()
    )
    circuit = int(n_odd == 0 and n_comp <= 1 and n_nonzero > 0)
    path = int(n_odd in (0, 2) and n_comp <= 1 and n_nonzero > 0)
    return pa.table(
        {
            "n_nonzero_vertices": pa.array([n_nonzero], pa.int64()),
            "n_odd_degree": pa.array([n_odd], pa.int64()),
            "n_edge_components": pa.array([int(n_comp)], pa.int64()),
            "has_euler_circuit": pa.array([circuit], pa.int64()),
            "has_euler_path": pa.array([path], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Burt's constraint (structural holes)
# ---------------------------------------------------------------------------
def burt_constraint(
    pairs: ray.data.Dataset,
    num_parts: int | None = None,
    max_degree: int | None = None,
) -> ray.data.Dataset:
    """Per-vertex Burt's constraint over the undirected unweighted
    graph (Burt 2004 "Structural Holes and Good Ideas"; igraph
    ``constraint`` / ``nx.constraint`` parity)::

        c(i) = Σ_{j∈N(i)} ( p_ij + Σ_{q∈N(i)∩N(j)} p_iq · p_qj )²

    with ``p_ij = 1/deg(i)`` (normalized mutual weight).  Factoring
    out ``1/deg(i)`` this is ``Σ_j ((1 + S_ij)/deg(i))²`` with the
    symmetric ``S_ij = Σ_{q∈N(i)∩N(j)} 1/deg(q)`` — exactly the
    Adamic–Adar wedge pipeline with ``1/deg`` centre weights, so the
    cost is the triangle-counting bound ``Σ deg(w)²`` and the only
    shuffles are the wedge groupby and one final per-vertex groupby.
    ``max_degree`` caps hub wedge-centres (estimate mode); ``None``
    is exact.  Rows ``(vid, constraint)`` for every nonzero-degree
    vertex; float sums, so oracle checks are tolerance-based.
    """
    wedge_pairs = _wedge_pair_weights(
        pairs, num_parts, max_degree, center_weight="inv"
    )
    only_edges = _merge_onto_edges(pairs, wedge_pairs)
    degs = _degree_map(pairs)
    with_deg = attach_degrees(
        only_edges.select_columns(["src", "dst", "common"]), degs
    )

    def emit(batch: pa.Table) -> pa.Table:
        s = batch.column("common").to_numpy(zero_copy_only=False)
        a = batch.column("src").to_numpy(zero_copy_only=False)
        b = batch.column("dst").to_numpy(zero_copy_only=False)
        da = batch.column("deg_src").to_numpy(zero_copy_only=False)
        db = batch.column("deg_dst").to_numpy(zero_copy_only=False)
        one_s = 1.0 + s
        return pa.table(
            {
                "vid": pa.array(np.concatenate([a, b])),
                "c": pa.array(
                    np.concatenate(
                        [(one_s / da) ** 2, (one_s / db) ** 2]
                    )
                ),
            }
        )

    return (
        with_deg.map_batches(
            emit, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("vid")
        .aggregate(Sum("c", alias_name="constraint"))
    )


def jaccard_all_pairs(
    pairs: ray.data.Dataset,
    num_parts: int | None = None,
    max_degree: int | None = None,
) -> ray.data.Dataset:
    """Jaccard AND Dice similarity for EVERY unordered vertex pair
    with at least one common neighbour — igraph ``similarity_jaccard``
    / ``similarity_dice`` over the full pair list (the edge-restricted
    variant is ``jaccard_edge_similarity``; pairs with zero common
    neighbours score 0 and are omitted, keeping output linear in the
    wedge count rather than quadratic in V).  Rows ``(src, dst,
    common, jaccard, dice)`` with ``src < dst``; exact-int counts +
    one IEEE division each, so a SQL twin matches bitwise."""
    wedge_pairs = _wedge_pair_weights(
        pairs, num_parts, max_degree, center_weight="one"
    )
    agg = (
        wedge_pairs.select_columns(["a", "b", "common"])
        .groupby(["a", "b"])
        .aggregate(Sum("common", alias_name="common"))
        .rename_columns({"a": "src", "b": "dst"})
    )
    degs = _degree_map(pairs)
    with_deg = attach_degrees(agg, degs)

    def finish(batch: pa.Table) -> pa.Table:
        c = batch.column("common").to_numpy(zero_copy_only=False)
        c = c.astype(np.int64)
        du = batch.column("deg_src").to_numpy(zero_copy_only=False)
        dv = batch.column("deg_dst").to_numpy(zero_copy_only=False)
        union = du + dv - c
        return pa.table(
            {
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "common": pa.array(c),
                "jaccard": pa.array((c / union).astype(np.float64)),
                "dice": pa.array(((2 * c) / (du + dv)).astype(np.float64)),
            }
        )

    return with_deg.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )
