"""Cardinality sketches: HyperLogLog approximate distinct count.

At 100 TB an exact distinct is a full hash shuffle of every key; an
HLL register array is ONE streaming pass — each batch folds its keys
into a 2^p-byte register block, blocks merge by elementwise max (a
tiny fixed-size reduce), and the estimator reads the merged block on
the driver.  Deterministic: keys are hashed with the repo's stateless
splitmix64 (``utils.hash_int64``), so the estimate is bit-identical
across runs, partitionings, and resumes — the property the engine's
checkpoint/resume contract requires of every operator.

Estimator: Flajolet–Fuss–Gandouet–Meunier 2007 with the standard
small-range (linear counting) and large-range corrections.  Accuracy
~1.04/√(2^p) relative standard error (p=14 → ~0.8%), property-tested
in tests/test_sketch.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.utils import hash_int64


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _fold(keys: np.ndarray, p: int) -> np.ndarray:
    """Registers (uint8, length 2^p) for one batch of int64 keys."""
    m = 1 << p
    h = hash_int64(keys.astype(np.int64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rho = leading zeros of rest within 64-p bits, + 1
    # leading zeros via bit_length: lz = 64 - bit_length(rest)
    bl = np.zeros(len(rest), np.int64)
    nz = rest != 0
    # vectorized bit_length: 64 - clz = floor(log2)+1; use frexp-free
    # integer method via np.log2 on uint64 is lossy for >2^53 — use
    # the 32-bit halves instead
    hi = (rest >> np.uint64(32)).astype(np.uint32)
    lo = (rest & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    bl_hi = np.zeros(len(rest), np.int64)
    nz_hi = hi != 0
    bl_hi[nz_hi] = (
        np.floor(np.log2(hi[nz_hi].astype(np.float64))).astype(np.int64) + 1
    )
    bl_lo = np.zeros(len(rest), np.int64)
    nz_lo = lo != 0
    bl_lo[nz_lo] = (
        np.floor(np.log2(lo[nz_lo].astype(np.float64))).astype(np.int64) + 1
    )
    bl = np.where(nz_hi, bl_hi + 32, bl_lo)
    rho = np.where(nz, 64 - bl + 1, 64 - p + 1).astype(np.int64)
    rho = np.minimum(rho, 64 - p + 1)
    regs = np.zeros(m, np.uint8)
    np.maximum.at(regs, idx, rho.astype(np.uint8))
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = len(regs)
    # exact integer harmonic numerator S = Σ_j 2^(64 − M_j): the
    # float Σ2^{-M} is then ONE deterministic rounding float(S)/2^64,
    # so the whole estimate is an order-independent IEEE chain the
    # driver's DuckDB twin replays bitwise (register values ≤ 64)
    vals, counts = np.unique(regs, return_counts=True)
    S = sum(int(c) << (64 - int(v)) for v, c in zip(vals, counts))
    two64 = float(2**64)
    est = _alpha(m) * m * m * two64 / float(S)
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * np.log(m / zeros)
    if est > two64 / 30.0:
        return -two64 * np.log1p(-est / two64)
    return float(est)


def hll_distinct(
    ds: ray.data.Dataset, col: str, p: int = 14
) -> float:
    """Approximate number of distinct values in int64 column ``col``.

    One streaming pass: per-batch register fold (map_batches), register
    blocks merged by elementwise max on the driver (Σ 2^p bytes per
    batch — for finer control at extreme batch counts, tree-merge via a
    small groupby; unnecessary below ~10^5 batches)."""
    m = 1 << p

    def fold(batch: pa.Table) -> pa.Table:
        k = batch.column(col).to_numpy(zero_copy_only=False)
        regs = _fold(k, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(m, np.uint8)
    for b in ds.map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        for blob in b.column("regs").to_pylist():
            merged = np.maximum(merged, np.frombuffer(blob, np.uint8))
    return _estimate(merged)


def hll_distinct_by(
    ds: ray.data.Dataset, key_col: str, col: str, p: int = 12
) -> pa.Table:
    """(key, approx_distinct) — per-group HLL.  Per-batch register
    blocks are emitted per (group, block) row and merged with one
    tiny groupby-max shuffle over ``groups × 2^p`` bytes."""
    m = 1 << p

    def fold(batch: pa.Table) -> pa.Table:
        g = batch.column(key_col)
        k = batch.column(col).to_numpy(zero_copy_only=False)
        tbl = pa.table({"g": g})
        import pyarrow.compute as pc

        uniq = pc.unique(tbl.column("g"))
        out_g, out_r = [], []
        garr = g.to_numpy(zero_copy_only=False)
        for gv in uniq.to_pylist():
            mask = garr == gv
            out_g.append(gv)
            out_r.append(_fold(k[mask], p).tobytes())
        return pa.table(
            {
                "g": pa.array(out_g, g.type),
                "regs": pa.array(out_r, pa.binary()),
            }
        )

    partials = ds.map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True
    )
    acc: dict = {}
    for b in partials.iter_batches(batch_format="pyarrow", batch_size=None):
        for gv, blob in zip(
            b.column("g").to_pylist(), b.column("regs").to_pylist()
        ):
            r = np.frombuffer(blob, np.uint8)
            acc[gv] = np.maximum(acc[gv], r) if gv in acc else r
    keys = sorted(acc)
    return pa.table(
        {
            "key": pa.array(keys),
            "approx_distinct": pa.array(
                [float(_estimate(acc[k])) for k in keys], pa.float64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# Count-min sketch (frequency estimation / heavy-hitter point queries)
# ---------------------------------------------------------------------------
#
# The frequency sibling of HLL: a (depth × width) int64 counter grid.
# Every token occurrence increments one counter per row at
# ``bucket_j = (h1 + j*h2) mod width`` (Kirsch–Mitzenmacher double
# hashing off sha256, so estimates are deterministic and replayable in
# exact SQL); a point query reads the MIN across rows — an
# overestimate by at most eps·N with probability 1-delta for
# width=e/eps, depth=ln(1/delta) (Cormode–Muthukrishnan 2005).
#
# Scale shape: per-block partial grids (depth·width·8 bytes, fixed)
# sum on the driver — one streaming pass, no shuffle, mergeable across
# runs/partitions by plain addition.

_CMS_HASH_CACHE: dict = {}


def _cms_term_hashes(terms) -> "tuple[np.ndarray, np.ndarray]":
    """(h1, h2) uint64 arrays for string terms: the first/second 8
    bytes of sha256(term), h2 forced odd.  Memoized per worker (the
    vocabulary is Zipfian — a tiny cache absorbs the hot head)."""
    import hashlib

    h1 = np.empty(len(terms), np.uint64)
    h2 = np.empty(len(terms), np.uint64)
    cache = _CMS_HASH_CACHE
    for i, t in enumerate(terms):
        hit = cache.get(t)
        if hit is None:
            d = hashlib.sha256(t.encode("utf-8")).hexdigest()
            hit = (int(d[:16], 16), int(d[16:32], 16) | 1)
            if len(cache) < (1 << 20):
                cache[t] = hit
        h1[i], h2[i] = hit
    return h1, h2


def cms_fold_terms(
    terms: np.ndarray, counts: np.ndarray, depth: int, width: int
) -> np.ndarray:
    """(depth, width) int64 partial grid for one batch's (term, count)
    pairs."""
    grid = np.zeros((depth, width), np.int64)
    if not len(terms):
        return grid
    h1, h2 = _cms_term_hashes(terms)
    for j in range(depth):
        with np.errstate(over="ignore"):
            b = ((h1 + np.uint64(j) * h2) % np.uint64(width)).astype(
                np.int64
            )
        np.add.at(grid[j], b, counts)
    return grid


def cms_build_text(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    depth: int = 3,
    width: int = 1024,
) -> np.ndarray:
    """Count-min grid over the lowercase whitespace tokens of
    ``text_col`` (the same tokenization as term_df/BM25).  One
    streaming pass; per-block partial grids sum on the driver."""
    from igraph_ray.functions.text import _tokens_table

    def fold(batch: pa.Table) -> pa.Table:
        toks = _tokens_table(batch, text_col, id_col)
        terms, counts = np.unique(
            toks.column("term").to_pandas().to_numpy(), return_counts=True
        )
        grid = cms_fold_terms(terms, counts.astype(np.int64), depth, width)
        return pa.table({"grid": pa.array([grid.tobytes()], pa.binary())})

    total = np.zeros((depth, width), np.int64)
    for b in ds.map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        for blob in b.column("grid").to_pylist():
            total += np.frombuffer(blob, np.int64).reshape(depth, width)
    return total


def cms_estimate(grid: np.ndarray, terms) -> np.ndarray:
    """Point-query estimates (int64, >= true count) for each term."""
    depth, width = grid.shape
    if not len(terms):
        return np.zeros(0, np.int64)
    h1, h2 = _cms_term_hashes(terms)
    est = np.full(len(terms), np.iinfo(np.int64).max, np.int64)
    for j in range(depth):
        with np.errstate(over="ignore"):
            b = ((h1 + np.uint64(j) * h2) % np.uint64(width)).astype(
                np.int64
            )
        est = np.minimum(est, grid[j, b])
    return est


# ---------------------------------------------------------------------------
# DDSketch (mergeable relative-error quantile sketch)
# ---------------------------------------------------------------------------
#
# The quantile sibling of HLL/CMS: logarithmic buckets
# ``i = ceil(ln(v)/ln(gamma))`` with ``gamma = (1+alpha)/(1-alpha)``
# guarantee every quantile estimate is within relative error ``alpha``
# (Masson, Rim & Lee, "DDSketch", VLDB 2019).  A value's bucket
# depends only on the value, so per-block partial histograms merge by
# plain addition — deterministic and partition-invariant, unlike
# t-digest's order-dependent centroid merging.
#
# Scale shape: one streaming pass; each block emits a tiny (idx, cnt)
# table (bucket count is O(log(range)/alpha) — ~800 buckets for cents
# up to 10^7 at alpha=0.01), summed on the driver.


def ddsketch_build(
    ds: ray.data.Dataset, col: str, alpha: float = 0.01
) -> dict:
    """Build a DDSketch over a positive int64/float column.  Values
    <= 0 are counted in a dedicated zero bucket (estimated as 0.0).

    Returns ``{"alpha", "gamma", "idx", "cnt", "n_zero", "total"}``
    with ``idx`` sorted int64 bucket indices and ``cnt`` int64 counts.
    """
    import math

    gamma = (1.0 + alpha) / (1.0 - alpha)
    lg = math.log(gamma)
    zero_sentinel = np.int64(-(2**62))  # below any real bucket index

    def fold(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        pos = v > 0.0
        idx = np.ceil(np.log(v[pos]) / lg).astype(np.int64)
        u, c = np.unique(idx, return_counts=True)
        nz = len(v) - int(pos.sum())
        if nz:
            u = np.r_[zero_sentinel, u]
            c = np.r_[np.int64(nz), c]
        return pa.table(
            {"idx": pa.array(u), "cnt": pa.array(c.astype(np.int64))}
        )

    acc: dict[int, int] = {}
    for b in ds.map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        for i, c in zip(
            b.column("idx").to_pylist(), b.column("cnt").to_pylist()
        ):
            acc[i] = acc.get(i, 0) + c
    n_zero = acc.pop(int(zero_sentinel), 0)
    idx = np.array(sorted(acc), np.int64)
    cnt = np.array([acc[i] for i in idx], np.int64)
    return {
        "alpha": alpha,
        "gamma": gamma,
        "idx": idx,
        "cnt": cnt,
        "n_zero": n_zero,
        "total": int(cnt.sum()) + n_zero,
    }


def ddsketch_merge(a: dict, b: dict) -> dict:
    """Merge two sketches with equal alpha (bucket-wise addition)."""
    assert a["alpha"] == b["alpha"]
    acc: dict[int, int] = dict(zip(a["idx"].tolist(), a["cnt"].tolist()))
    for i, c in zip(b["idx"].tolist(), b["cnt"].tolist()):
        acc[i] = acc.get(i, 0) + c
    idx = np.array(sorted(acc), np.int64)
    cnt = np.array([acc[i] for i in idx], np.int64)
    return {
        **a,
        "idx": idx,
        "cnt": cnt,
        "n_zero": a["n_zero"] + b["n_zero"],
        "total": int(cnt.sum()) + a["n_zero"] + b["n_zero"],
    }


def ddsketch_quantiles(sk: dict, qs) -> np.ndarray:
    """Quantile estimates (lower-rank semantics: the value whose rank
    is ``floor(q*(n-1))``), each within relative error alpha of the
    true quantile."""
    import math

    n = sk["total"]
    out = np.empty(len(qs), np.float64)
    if n == 0:
        out[:] = np.nan
        return out
    gamma = sk["gamma"]
    cum = np.cumsum(sk["cnt"])
    for j, q in enumerate(qs):
        rank = int(math.floor(q * (n - 1)))
        if rank < sk["n_zero"]:
            out[j] = 0.0
            continue
        pos = int(np.searchsorted(cum, rank - sk["n_zero"] + 1))
        i = int(sk["idx"][pos])
        out[j] = 2.0 * gamma**i / (gamma + 1.0)
    return out


def hll_set_ops(
    ds: ray.data.Dataset,
    key_col: str,
    col: str,
    group_a,
    group_b,
    p: int = 14,
) -> dict:
    """HLL set-operation estimates between two groups of one dataset:
    ``{"n_a", "n_b", "union", "intersection"}``.

    One streaming pass folds BOTH groups' registers per batch; union is
    the estimate of the elementwise register max (exactly the HLL of
    the concatenated streams — registers are lossless under union), and
    intersection comes from inclusion–exclusion (n_a + n_b − union,
    clamped at 0 — the standard HLL intersection estimator, error grows
    as the true overlap shrinks; Flajolet et al. 2007)."""
    m = 1 << p

    def fold(batch: pa.Table) -> pa.Table:
        g = batch.column(key_col).to_numpy(zero_copy_only=False)
        k = batch.column(col).to_numpy(zero_copy_only=False)
        ra = _fold(k[g == group_a], p)
        rb = _fold(k[g == group_b], p)
        return pa.table(
            {
                "ra": pa.array([ra.tobytes()], pa.binary()),
                "rb": pa.array([rb.tobytes()], pa.binary()),
            }
        )

    reg_a = np.zeros(m, np.uint8)
    reg_b = np.zeros(m, np.uint8)
    for b in ds.map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        for blob in b.column("ra").to_pylist():
            reg_a = np.maximum(reg_a, np.frombuffer(blob, np.uint8))
        for blob in b.column("rb").to_pylist():
            reg_b = np.maximum(reg_b, np.frombuffer(blob, np.uint8))
    n_a = _estimate(reg_a)
    n_b = _estimate(reg_b)
    union = _estimate(np.maximum(reg_a, reg_b))
    return {
        "n_a": n_a,
        "n_b": n_b,
        "union": union,
        "intersection": max(0.0, n_a + n_b - union),
    }


def hll_registers_by(
    ds: ray.data.Dataset, key_col: str, col: str, p: int = 12
) -> pa.Table:
    """(key, reg_index, reg_value) — the merged per-group HLL
    REGISTERS (nonzero rows only).  Registers are exact
    splitmix64-derived integers combined by max (order-independent),
    so unlike the float estimate this surface is bitwise
    SQL-replayable; ``_estimate`` over these rows reproduces
    ``hll_distinct_by`` exactly (pytest-gated)."""

    def fold(batch: pa.Table) -> pa.Table:
        g = batch.column(key_col)
        k = batch.column(col).to_numpy(zero_copy_only=False)
        import pyarrow.compute as pc

        uniq = pc.unique(g)
        garr = g.to_numpy(zero_copy_only=False)
        out_g, out_r = [], []
        for gv in uniq.to_pylist():
            out_g.append(gv)
            out_r.append(_fold(k[garr == gv], p).tobytes())
        return pa.table(
            {
                "g": pa.array(out_g, g.type),
                "regs": pa.array(out_r, pa.binary()),
            }
        )

    acc: dict = {}
    for b in (
        ds.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ):
        for gv, blob in zip(
            b.column("g").to_pylist(), b.column("regs").to_pylist()
        ):
            r = np.frombuffer(blob, np.uint8)
            acc[gv] = np.maximum(acc[gv], r) if gv in acc else r
    keys, idxs, vals = [], [], []
    for gv in sorted(acc):
        nz = np.flatnonzero(acc[gv])
        keys.extend([gv] * len(nz))
        idxs.extend(nz.tolist())
        vals.extend(acc[gv][nz].tolist())
    return pa.table(
        {
            "key": pa.array(keys),
            "reg_index": pa.array(idxs, pa.int64()),
            "reg_value": pa.array(vals, pa.int64()),
        }
    )
