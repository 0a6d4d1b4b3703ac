"""Deduplication: exact (hash-partition + per-group first), MinHash+LSH,
SimHash, and n-gram Jaccard verification.

Duplicate *clusters* are just connected components over the candidate
pair graph — so near-dedup reuses the K2 kernel (min-label propagation)
to pick a canonical representative (min id) per cluster, the same
"hash-partition + per-group first" shape at every stage.
"""

from __future__ import annotations

import math
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min, Sum

from igraph_ray.stages.sha import with_content_sha


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def exact_dedup(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Keep one row id per distinct text: sha256-hash-partition, min id
    per group.  Returns ``(content_sha, keep_id)``."""
    hashed = with_content_sha(ds.select_columns([id_col, text_col]), column=text_col)
    return (
        hashed.select_columns(["content_sha", id_col])
        .groupby("content_sha")
        .aggregate(Min(id_col, alias_name="keep_id"))
    )


# ---------------------------------------------------------------------------
# shingling + minhash
# ---------------------------------------------------------------------------
_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Rolling polynomial hash of each character k-gram — fully
    vectorized (k vector ops per document), deterministic."""
    data = text.encode("utf-8", "surrogatepass")
    if len(data) <= k:
        return np.array([zlib.crc32(data)], dtype=np.uint64)
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(b)
    with np.errstate(over="ignore"):
        h = np.zeros(n - k + 1, dtype=np.uint64)
        base = np.uint64(1099511628211)  # FNV prime as polynomial base
        p = np.uint64(1)
        for j in range(k - 1, -1, -1):
            h += b[j : n - k + 1 + j] * p
            p *= base
    return np.unique(h)


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _minhash_sig(h: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        m = (a[:, None] * h[None, :] + b[:, None]) % _MERSENNE
    return m.min(axis=1)


class _MinHashStage:
    """Actor-pool stage: permutation parameters built once per actor."""

    def __init__(self, id_col, text_col, k, num_perm, bands):
        self.id_col = id_col
        self.text_col = text_col
        self.k = k
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.a, self.b = _perm_params(num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from igraph_ray.utils import hash_int64

        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_bucket = [], []
        band_hi = np.arange(self.bands, dtype=np.int64) << 32
        for i, t in zip(ids, texts):
            if not t:
                continue
            sig = _minhash_sig(_shingle_hashes(t, self.k), self.a, self.b)
            # fused (band, bucket) key → single-int64 shuffle key; the
            # band hash is a splitmix64 left fold over the band's
            # signature values (h ← splitmix64(h ⊕ s_j)), so the
            # driver's DuckDB twin replays buckets bit-for-bit —
            # crc32 had no SQL twin
            s2 = sig.reshape(self.bands, self.rows_per_band)
            h = hash_int64(s2[:, 0])
            for j in range(1, self.rows_per_band):
                h = hash_int64(h ^ s2[:, j])
            buckets = band_hi | (
                h & np.uint64(0xFFFFFFFF)
            ).astype(np.int64)
            out_id.extend([i] * self.bands)
            out_bucket.extend(buckets.tolist())
        return pa.table(
            {
                "id": pa.array(out_id, pa.int64()),
                "bucket": pa.array(out_bucket, pa.int64()),
            }
        )


def _dedup_pairs(
    pairs: "ray.data.Dataset",
    num_parts: int | None = None,
    extra_col: str | None = None,
) -> "ray.data.Dataset":
    """Distinct (a, b) rows via one int32 hash-partition shuffle plus a
    vectorized per-partition dedup (optionally min-reducing an extra
    numeric column, e.g. hamming distance).

    ``num_parts`` auto-sizes to ``n_pairs / 250k`` so one group ≈ one
    block at any scale."""
    from igraph_ray.utils import hash_int64

    if num_parts is None:
        pairs = pairs.materialize()
        num_parts = int(max(2, min(65536, pairs.count() // 250_000 + 2)))

    def add_hpart(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            hp = (
                (hash_int64(a) * np.uint64(0x9E3779B97F4A7C15) + hash_int64(b))
                % np.uint64(num_parts)
            ).astype(np.int32)
        return batch.append_column("hpart", pa.array(hp))

    def dedup(group: pa.Table) -> pa.Table:
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        extra = (
            group.column(extra_col).to_numpy(zero_copy_only=False)
            if extra_col
            else None
        )
        cols = {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        if extra_col:
            cols[extra_col] = pa.array([], pa.int64())
        if len(a) == 0:
            return pa.table(cols)
        keys = (extra, b, a) if extra is not None else (b, a)
        order = np.lexsort(keys)
        a, b = a[order], b[order]
        if extra is not None:
            extra = extra[order]
        first = np.empty(len(a), dtype=bool)
        first[0] = True
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        out = {"a": pa.array(a[first]), "b": pa.array(b[first])}
        if extra is not None:
            out[extra_col] = pa.array(extra[first])  # min per pair (sorted)
        return pa.table(out)

    return (
        pairs.map_batches(add_hpart, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hpart")
        .map_groups(dedup, batch_format="pyarrow")
    )


def _emit_bucket_pairs(group: pa.Table, cap: int = 64) -> pa.Table:
    """Candidate pairs inside one (band, bucket) group; star fallback
    over ``cap`` members (skew guard, same rule as edge_rules)."""
    ids = np.unique(group.column("id").to_numpy(zero_copy_only=False))
    k = len(ids)
    if k < 2:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
    if k <= cap:
        iu, ju = np.triu_indices(k, 1)
        return pa.table({"a": pa.array(ids[iu]), "b": pa.array(ids[ju])})
    return pa.table(
        {
            "a": pa.array(np.repeat(ids[:1], k - 1)),
            "b": pa.array(ids[1:]),
        }
    )


def _attach_text(
    pairs: "ray.data.Dataset",
    texts: "ray.data.Dataset",
    key: str,
    carry: list[tuple[str, pa.DataType]],
    out_col: str,
    id_col: str,
    text_col: str,
    num_parts: int | None = None,
) -> "ray.data.Dataset":
    """Co-partitioned hash join: append ``out_col`` =
    ``texts[text_col]`` where ``texts[id_col] == pairs[key]``.

    Both sides are hash-partitioned on the id (one int32 shuffle key)
    and matched inside each partition with a vectorized
    ``searchsorted`` probe — no side is ever fully materialized or
    broadcast, so this scales to corpora far beyond one node's heap
    (the fix for the round-1 verify-stage broadcast,
    VERDICT.md "What's wrong" #2).  ``carry`` lists the pair columns
    (name, type) to pass through; ids in ``texts`` must be unique.
    """
    from igraph_ray.utils import hash_int64

    if num_parts is None:
        texts = texts.materialize()
        num_parts = int(max(2, min(65536, texts.count() // 100_000 + 2)))
    carry_names = [c for c, _ in carry]

    def tag_text(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        cols: dict[str, pa.Array] = {
            "_k": pa.array(ids.astype(np.int64)),
            "_val": batch.column(text_col),
            "_is_src": pa.array(np.ones(len(ids), np.int8)),
            "_hp": pa.array(
                (hash_int64(ids) % np.uint64(num_parts)).astype(np.int32)
            ),
        }
        for name, typ in carry:
            cols[name] = pa.nulls(len(ids), typ)
        return pa.table(cols)

    def tag_pair(batch: pa.Table) -> pa.Table:
        ids = batch.column(key).to_numpy(zero_copy_only=False)
        cols = {
            "_k": pa.array(ids.astype(np.int64)),
            "_val": pa.nulls(len(ids), pa.string()),
            "_is_src": pa.array(np.zeros(len(ids), np.int8)),
            "_hp": pa.array(
                (hash_int64(ids) % np.uint64(num_parts)).astype(np.int32)
            ),
        }
        for name, _ in carry:
            cols[name] = batch.column(name)
        return pa.table(cols)

    tagged = texts.map_batches(
        tag_text, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        pairs.map_batches(tag_pair, batch_format="pyarrow", zero_copy_batch=True)
    )

    def join_group(group: pa.Table) -> pa.Table:
        is_src = group.column("_is_src").to_numpy(zero_copy_only=False) == 1
        k_all = group.column("_k").to_numpy(zero_copy_only=False)
        src_idx = np.flatnonzero(is_src)
        pair_idx = np.flatnonzero(~is_src)
        out_cols: dict[str, pa.Array] = {}
        if len(pair_idx) == 0 or len(src_idx) == 0:
            for name, typ in carry:
                out_cols[name] = pa.array([], typ)
            out_cols[out_col] = pa.array([], pa.string())
            return pa.table(out_cols)
        order = np.argsort(k_all[src_idx])
        src_sorted = k_all[src_idx][order]
        vals = pc.take(group.column("_val"), pa.array(src_idx[order]))
        pos = np.searchsorted(src_sorted, k_all[pair_idx])
        pos_c = np.clip(pos, 0, len(src_sorted) - 1)
        hit = src_sorted[pos_c] == k_all[pair_idx]
        pair_keep = pair_idx[hit]
        for name, _ in carry:
            out_cols[name] = pc.take(group.column(name), pa.array(pair_keep))
        out_cols[out_col] = pc.take(vals, pa.array(pos_c[hit]))
        return pa.table(out_cols)

    return tagged.groupby("_hp").map_groups(join_group, batch_format="pyarrow")


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Character k-gram Jaccard similarity (exact verification)."""
    ha = _shingle_hashes(text_a or "", k)
    hb = _shingle_hashes(text_b or "", k)
    inter = len(np.intersect1d(ha, hb, assume_unique=True))
    union = len(ha) + len(hb) - inter
    return inter / union if union else 1.0


def minhash_near_dup_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    verify_threshold: float | None = 0.7,
) -> ray.data.Dataset:
    """MinHash+LSH near-duplicate candidate pairs ``(a, b)`` with
    ``jaccard`` column.  shingle → minhash → band → bucket groupby —
    one shuffle on (band, bucket), one dedup shuffle on (a, b).

    ``verify_threshold`` rescores candidates with exact k-gram Jaccard;
    texts are attached to the (sparse) candidate pairs via two
    co-partitioned hash joins on doc id — never a whole-corpus
    broadcast.  Pass None to skip verification.
    """
    # task-based: permutation-parameter setup is trivial (128 ints), so
    # per-task construction beats paying an actor pool's spin-up
    stage = _MinHashStage(id_col, text_col, k, num_perm, bands)

    def _sig(batch: pa.Table, _s=stage) -> pa.Table:
        return _s(batch)

    sigs = ds.select_columns([id_col, text_col]).map_batches(
        _sig, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = sigs.groupby("bucket").map_groups(
        _emit_bucket_pairs, batch_format="pyarrow"
    )
    # dedup pairs found in multiple bands: one int32 hash-partition
    # shuffle + vectorized per-partition dedup
    pairs = _dedup_pairs(pairs)
    if verify_threshold is None:
        return pairs

    # the candidate set is sparse — pin it so the two attach passes
    # don't re-execute the shingle→bucket lineage; share ONE
    # materialized text table between both joins (they would otherwise
    # each re-read and re-materialize the corpus)
    pairs = pairs.materialize()
    texts = ds.select_columns([id_col, text_col]).materialize()
    # key-space sizing: the downstream verify work scales with PAIRS
    # (per-pair set intersection), not texts — partition so each join
    # group carries a few thousand pairs and every core gets work
    text_parts = int(
        max(
            16,
            min(
                65536,
                max(texts.count() // 100_000, pairs.count() // 5_000) + 2,
            ),
        )
    )
    with_ta = _attach_text(
        pairs,
        texts,
        key="a",
        carry=[("a", pa.int64()), ("b", pa.int64())],
        out_col="_ta",
        id_col=id_col,
        text_col=text_col,
        num_parts=text_parts,
    )
    with_tb = _attach_text(
        with_ta,
        texts,
        key="b",
        carry=[("a", pa.int64()), ("b", pa.int64()), ("_ta", pa.string())],
        out_col="_tb",
        id_col=id_col,
        text_col=text_col,
        num_parts=text_parts,
    )

    def _verify(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        ta = batch.column("_ta").to_pylist()
        tb = batch.column("_tb").to_pylist()
        # a doc appears in many candidate pairs — shingle each UNIQUE
        # text once per batch (ids repeat heavily inside a join
        # partition), then intersect the sorted-unique hash sets with
        # a searchsorted probe instead of re-hashing per pair
        cache: dict[str, np.ndarray] = {}
        for t in ta:
            if t not in cache:
                cache[t] = _shingle_hashes(t or "", k)
        for t in tb:
            if t not in cache:
                cache[t] = _shingle_hashes(t or "", k)
        j = np.empty(len(ta), np.float64)
        for i, (x, y) in enumerate(zip(ta, tb)):
            ha, hb = cache[x], cache[y]
            if len(ha) > len(hb):
                ha, hb = hb, ha
            pos = np.searchsorted(hb, ha)
            pos_c = np.minimum(pos, len(hb) - 1)
            inter = int((hb[pos_c] == ha).sum())
            union = len(ha) + len(hb) - inter
            j[i] = inter / union if union else 1.0
        keep = j >= verify_threshold
        return pa.table(
            {
                "a": pa.array(a[keep]),
                "b": pa.array(b[keep]),
                "jaccard": pa.array(j[keep]),
            }
        )

    return with_tb.map_batches(
        _verify, batch_format="pyarrow", zero_copy_batch=True
    )


def near_dedup(
    ds: ray.data.Dataset,
    graph_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    **minhash_kwargs,
) -> ray.data.Dataset:
    """Full near-dedup: LSH pairs → duplicate clusters via the K2
    connected-components kernel → ``(vid, keep_id)`` mapping every doc
    id to its cluster representative (min id)."""
    from igraph_ray.api import build_graph
    from igraph_ray.kernels.components import connected_components

    pairs = minhash_near_dup_pairs(ds, id_col, text_col, **minhash_kwargs)

    def as_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch.column("a"),
                "dst": batch.column("b"),
                "weight": pa.array(np.ones(len(batch), np.float64)),
            }
        )

    edges = pairs.map_batches(
        as_edges, batch_format="pyarrow", zero_copy_batch=True
    )
    vertices = ds.select_columns([id_col]).rename_columns({id_col: "vid"})
    graph = build_graph(
        edges, graph_dir, vertices=vertices, symmetrize=True
    )
    run = connected_components(graph)
    return run.state.select_columns(["vid", "comp"]).rename_columns(
        {"comp": "keep_id"}
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------
# Per-worker token→hash64 memo: the vocabulary is orders of magnitude
# smaller than the token stream, so the only remaining Python loop runs
# once per *new vocabulary word* per worker, not per token occurrence.
_TOKEN_HASH_CACHE: dict[str, int] = {}
_TOKEN_HASH_CACHE_MAX = 2_000_000


def _token_hashes64(tokens: list[str]) -> np.ndarray:
    """uint64 per token: ``(crc32(t) << 32) | crc32(t + 'x')`` —
    identical to the round-1 per-token construction, memoized."""
    out = np.empty(len(tokens), np.uint64)
    cache = _TOKEN_HASH_CACHE
    for i, t in enumerate(tokens):
        h = cache.get(t)
        if h is None:
            tb = t.encode()
            h = (zlib.crc32(tb) << 32) | zlib.crc32(tb + b"x")
            if len(cache) < _TOKEN_HASH_CACHE_MAX:
                cache[t] = h
        out[i] = h
    return out


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over a uint64 array."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x -= (x >> np.uint64(1)) & np.uint64(0x5555555555555555)
        x = (x & np.uint64(0x3333333333333333)) + (
            (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
        )
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        x = (x * np.uint64(0x0101010101010101)) >> np.uint64(56)
    return x.astype(np.int64)


class _SimHashStage:
    """64-bit SimHash over token crc32s + 4×16-bit band buckets.

    Vectorized over the whole batch: whitespace tokenization and
    dictionary-encoding are Arrow kernels, per-unique-token crc32 is
    memoized per worker, and the sign-bit accumulation is one
    ``np.add.reduceat`` over the flattened token stream.
    """

    _SHIFTS = np.arange(64, dtype=np.uint64)

    def __init__(self, id_col, text_col):
        self.id_col = id_col
        self.text_col = text_col

    @classmethod
    def simhash64(cls, text: str) -> int:
        """Single-document reference implementation (tests/debug)."""
        tokens = text.split()
        if not tokens:
            return 0
        h = _token_hashes64(tokens)
        bits = ((h[:, None] >> cls._SHIFTS) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(
            np.bitwise_or.reduce((v > 0).astype(np.uint64) << cls._SHIFTS)
        )

    def _batch_simhash(self, text_col: pa.ChunkedArray | pa.Array) -> np.ndarray:
        filled = pc.fill_null(text_col, "")
        if isinstance(filled, pa.ChunkedArray):
            filled = filled.combine_chunks()
        # RE2 splitter, not pc.utf8_split_whitespace: that kernel
        # intermittently corrupts token lists under concurrent Ray
        # tasks in pyarrow 16.1.0 (see functions/paragraphs.py)
        lists = pc.split_pattern_regex(filled, pattern=r"\s+")
        n_docs = len(lists)
        # the splitter emits empty edge tokens where str.split() does
        # not — drop them via parent indices
        parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lists)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        enc = flat.dictionary_encode()
        uniq_hashes = _token_hashes64(enc.dictionary.to_pylist())
        codes = enc.indices.to_numpy(zero_copy_only=False)
        h = uniq_hashes[codes]

        lens = np.bincount(parents, minlength=n_docs).astype(np.int64)
        sims = np.zeros(n_docs, np.uint64)
        nonempty = lens > 0
        if not nonempty.any():
            return sims
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])[nonempty]
        # (T, 64) bit matrix → per-doc bit counts in one reduceat
        bitmat = ((h[:, None] >> self._SHIFTS[None, :]) & np.uint64(1)).astype(
            np.int32
        )
        counts = np.add.reduceat(bitmat, starts, axis=0)
        v = 2 * counts - lens[nonempty][:, None]
        sims[nonempty] = (
            (v > 0).astype(np.uint64) << self._SHIFTS[None, :]
        ).sum(axis=1, dtype=np.uint64)
        return sims

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = (
            batch.column(self.id_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        sims = self._batch_simhash(batch.column(self.text_col))
        n = len(ids)
        band = np.tile(np.arange(4, dtype=np.int64), n)
        sim_rep = np.repeat(sims, 4)
        # fused (band, 16-bit bucket) single-int64 shuffle key
        bucket = (band << 16) | (
            (sim_rep >> (band.astype(np.uint64) * np.uint64(16)))
            & np.uint64(0xFFFF)
        ).astype(np.int64)
        return pa.table(
            {
                "id": pa.array(np.repeat(ids, 4)),
                "simhash": pa.array(sim_rep, pa.uint64()),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )


def simhash_near_dup_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> ray.data.Dataset:
    """SimHash near-dup pairs: band-bucket LSH (a pair within hamming
    distance 3 of 64 bits shares at least one of 4 16-bit bands), then
    exact hamming verification inside the bucket group."""
    stage = _SimHashStage(id_col, text_col)

    def _sig(batch: pa.Table, _s=stage) -> pa.Table:
        return _s(batch)

    sigs = ds.select_columns([id_col, text_col]).map_batches(
        _sig, batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("id").to_numpy(zero_copy_only=False)
        sims = group.column("simhash").to_numpy(zero_copy_only=False)
        ids, idx = np.unique(ids, return_index=True)
        sims = sims[idx]
        k = len(ids)
        if k < 2 or k > 512:  # skew guard on degenerate buckets
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        iu, ju = np.triu_indices(k, 1)
        x = sims[iu] ^ sims[ju]
        ham = _popcount64(x)
        keep = ham <= max_hamming
        return pa.table(
            {
                "a": pa.array(ids[iu][keep]),
                "b": pa.array(ids[ju][keep]),
                "hamming": pa.array(ham[keep]),
            }
        )

    pairs = sigs.groupby("bucket").map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
    return _dedup_pairs(pairs, extra_col="hamming")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard near-dup (inverted shingle index, no sketching)
# ---------------------------------------------------------------------------
class _WordNgramShingles:
    """text → distinct word-n-gram shingle rows ``(id, s)`` — one
    vectorized pass: trim → Arrow whitespace split → flattened-token
    gather (three ``pc.take`` + one ``binary_join_element_wise``), then
    a per-batch Arrow group_by for the within-doc distinct.  Docs with
    fewer than n tokens contribute no shingles (empty set)."""

    def __init__(self, id_col: str, text_col: str, n: int):
        self.id_col, self.text_col, self.n = id_col, text_col, n

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = self.n
        ids = batch.column(self.id_col)
        # RE2 splitter, not pc.utf8_split_whitespace (intermittent
        # corruption under concurrent tasks — see functions/paragraphs.py)
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch.column(self.text_col)),
            pattern=r"\s+",
        ).combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = toks.values
        counts = np.diff(offs)
        ng = np.maximum(counts - (n - 1), 0)
        total = int(ng.sum())
        if total == 0:
            return pa.table(
                {"id": pa.array([], pa.int64()), "s": pa.array([], pa.string())}
            )
        doc_idx = np.repeat(np.arange(len(ng)), ng)
        ranges = np.arange(total) - np.repeat(np.cumsum(ng) - ng, ng)
        j = np.repeat(offs[:-1], ng) + ranges
        parts = [pc.take(vals, pa.array(j + t, pa.int64())) for t in range(n)]
        sh = pc.binary_join_element_wise(*parts, " ")
        tbl = pa.table(
            {"id": pc.take(ids, pa.array(doc_idx, pa.int64())), "s": sh}
        )
        return tbl.group_by(["id", "s"]).aggregate([])


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    df_cap: int = 128,
    threshold: float = 0.5,
    hash_shingles: bool = False,
    metric: str = "jaccard",
) -> ray.data.Dataset:
    """Exact word-n-gram Jaccard near-duplicate pairs
    ``(a, b, common, union_sz, jaccard)`` with ``jaccard >= threshold``
    — the no-sketch member of the dedup family (vs MinHash's estimate):
    jaccard = |Sa ∩ Sb| / |Sa ∪ Sb| over the distinct word-n-gram sets.

    ``metric="containment"`` switches the score to the asymmetric
    near-containment coefficient |Sa ∩ Sb| / min(|Sa|, |Sb|)
    (Broder 1997's containment, symmetrized by the smaller set) —
    the quote/boilerplate/subset detector: a short doc fully quoted
    inside a long one scores 1.0 where Jaccard stays low.  Columns
    become ``(a, b, common, min_sz, containment)``; same index, same
    df_cap semantics, same single pair shuffle.

    Distributed shape — an inverted shingle index, never all-pairs:
    one ``groupby(shingle)`` emits, per shingle, the pair rows of its
    posting list plus one size-contribution row per member; a second
    ``groupby(a, b)`` sums intersections; document sizes come from the
    size rows; two co-partitioned hash joins attach them.  Shingles
    with document frequency > ``df_cap`` are dropped from the universe
    on BOTH sides of the metric (sizes and intersections) — the
    standard stopword-shingle cut that bounds per-group pair fanout at
    C(df_cap, 2); with no shingle over the cap the result is the exact
    Jaccard.  ``hash_shingles=True`` is the scale variant: it replaces
    the string shingle with its 64-bit hash right after shingling
    (same pipeline, 8-byte shuffle keys instead of n-word strings);
    the default keeps strings so the SQL twin matches bitwise with no
    collision caveat.
    """
    import ray as _ray

    shingles = ds.map_batches(
        _WordNgramShingles(id_col, text_col, n),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if hash_shingles:

        def _hash_s(batch: pa.Table) -> pa.Table:
            import pandas as pd

            s = batch.column("s").to_numpy(zero_copy_only=False)
            h = pd.util.hash_array(s, categorize=False).view(np.int64)
            return pa.table({"id": batch.column("id"), "s": pa.array(h)})

        shingles = shingles.map_batches(
            _hash_s, batch_format="pyarrow", zero_copy_batch=True
        )

    # ONE hash-partition shuffle on the shingle (all rows of a shingle
    # land in the same partition), then each partition is processed in
    # a single vectorized pass — a per-shingle map_groups would pay one
    # Python call per distinct shingle (millions).  Partition count is
    # ROWS-based (one group ≈ one block at any scale) — a CPU-count
    # key-space would make per-group size O(total_rows/CPUs), unbounded
    # at 100 TB.
    shingles = shingles.materialize()
    num_parts = int(max(2, min(65536, shingles.count() // 250_000 + 2)))

    def add_hpart(batch: pa.Table) -> pa.Table:
        import pandas as pd

        s = batch.column("s").to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(s, categorize=False)
        return batch.append_column(
            "hpart",
            pa.array((h % np.uint64(num_parts)).astype(np.int32)),
        )

    def posting_part(group: pa.Table) -> pa.Table:
        """All complete shingle groups of one partition: boundaries
        from dictionary codes, size rows (b = -1) for kept groups, and
        pair rows emitted in ≤ df_cap batches (one vectorized
        triu-gather per distinct group size)."""
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
        ids = group.column("id").to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return empty
        codes = (
            pc.dictionary_encode(group.column("s").combine_chunks())
            .indices.to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((ids, codes))
        ids, codes = ids[order], codes[order]
        boundary = np.empty(len(codes), dtype=bool)
        boundary[0] = True
        boundary[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(boundary)
        sizes = np.diff(np.append(starts, len(codes)))
        keep_g = sizes <= df_cap
        keep_rows = np.repeat(keep_g, sizes)
        a_parts = [ids[keep_rows]]
        b_parts = [np.full(int(keep_rows.sum()), -1, np.int64)]
        pairy = keep_g & (sizes >= 2)
        for k in np.unique(sizes[pairy]):
            gs = starts[pairy & (sizes == k)]
            iu, ju = np.triu_indices(int(k), 1)
            a_parts.append(ids[gs[:, None] + iu[None, :]].ravel())
            b_parts.append(ids[gs[:, None] + ju[None, :]].ravel())
        return pa.table(
            {
                "a": pa.array(np.concatenate(a_parts)),
                "b": pa.array(np.concatenate(b_parts)),
            }
        )

    rows = (
        shingles.map_batches(
            add_hpart, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("hpart")
        .map_groups(posting_part, batch_format="pyarrow")
        .materialize()
    )

    # per-(a, b) occurrence counts = intersection sizes (and, for the
    # b = -1 marker rows, document set sizes) — same one-shuffle
    # vectorized-count shape as _dedup_pairs; a multi-key Ray groupby
    # aggregate here costs several times the whole rest of the pipeline
    from igraph_ray.utils import hash_int64

    # rows-based key-space again: pair fanout is C(df_cap, 2) per hot
    # shingle, so the pair-row count is the right sizing signal
    cnt_parts = int(max(2, min(65536, rows.count() // 250_000 + 2)))

    def add_cpart(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            hp = (
                (
                    hash_int64(a) * np.uint64(0x9E3779B97F4A7C15)
                    + hash_int64(b)
                )
                % np.uint64(cnt_parts)
            ).astype(np.int32)
        return batch.append_column("hpart", pa.array(hp))

    def count_part(group: pa.Table) -> pa.Table:
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        if len(a) == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        boundary = np.empty(len(a), dtype=bool)
        boundary[0] = True
        boundary[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(boundary)
        cnt = np.diff(np.append(starts, len(a)))
        return pa.table(
            {
                "a": pa.array(a[starts]),
                "b": pa.array(b[starts]),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    counts = (
        rows.map_batches(
            add_cpart, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("hpart")
        .map_groups(count_part, batch_format="pyarrow")
        .materialize()
    )

    def _take(marker: bool):
        def _f(batch: pa.Table) -> pa.Table:
            mask = pc.equal(batch.column("b"), -1)
            return batch.filter(mask if marker else pc.invert(mask))

        return _f

    sizes = counts.map_batches(
        _take(True), batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["a", "cnt"])
    inter = counts.map_batches(
        _take(False), batch_format="pyarrow", zero_copy_batch=True
    )

    def _finish_cols(a, b, common, sa, sb):
        if metric == "containment":
            msz = np.minimum(sa, sb)
            score = common / msz
            keep = score >= threshold
            return pa.table(
                {
                    "a": pa.array(a[keep]),
                    "b": pa.array(b[keep]),
                    "common": pa.array(common[keep].astype(np.int64)),
                    "min_sz": pa.array(msz[keep].astype(np.int64)),
                    "containment": pa.array(
                        score[keep].astype(np.float64)
                    ),
                }
            )
        union = sa + sb - common
        jac = common / union
        keep = jac >= threshold
        return pa.table(
            {
                "a": pa.array(a[keep]),
                "b": pa.array(b[keep]),
                "common": pa.array(common[keep].astype(np.int64)),
                "union_sz": pa.array(union[keep].astype(np.int64)),
                "jaccard": pa.array(jac[keep].astype(np.float64)),
            }
        )

    # small-side rule (engine-wide): the sizes table is one int per
    # document — broadcast it once per actor below the bound, fall
    # back to two co-partitioned hash joins past it
    from igraph_ray.stages.vertex_ids import BROADCAST_MAX_VERTICES

    n_docs = sizes.count()
    if n_docs <= BROADCAST_MAX_VERTICES:
        stbl = pa.concat_tables(
            sizes.iter_batches(batch_format="pyarrow", batch_size=None)
        ).sort_by("a")
        ref = _ray.put(stbl)

        class _SizeLookup:
            def __init__(self, r):
                t = _ray.get(r)
                self._ids = t.column("a").to_numpy(zero_copy_only=False)
                self._sz = t.column("cnt").to_numpy(zero_copy_only=False)

            def __call__(self, batch: pa.Table) -> pa.Table:
                a = batch.column("a").to_numpy(zero_copy_only=False)
                b = batch.column("b").to_numpy(zero_copy_only=False)
                common = batch.column("cnt").to_numpy(zero_copy_only=False)
                sa = self._sz[np.searchsorted(self._ids, a)]
                sb = self._sz[np.searchsorted(self._ids, b)]
                return _finish_cols(a, b, common, sa, sb)

        return inter.map_batches(
            _SizeLookup,
            fn_constructor_args=(ref,),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        )

    join_parts = int(
        max(2, min(64, _ray.cluster_resources().get("CPU", 4) // 2))
    )
    j = inter.join(
        sizes.rename_columns({"cnt": "sa"}),
        "inner",
        join_parts,
        on=("a",),
    ).join(
        sizes.rename_columns({"a": "b", "cnt": "sb"}),
        "inner",
        join_parts,
        on=("b",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return _finish_cols(
            batch.column("a").to_numpy(zero_copy_only=False),
            batch.column("b").to_numpy(zero_copy_only=False),
            batch.column("cnt").to_numpy(zero_copy_only=False),
            batch.column("sa").to_numpy(zero_copy_only=False),
            batch.column("sb").to_numpy(zero_copy_only=False),
        )

    return j.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# benchmark decontamination (exact n-gram overlap against an eval set)
# ---------------------------------------------------------------------------
def _word_ngrams(batch: pa.Table, text_col: str, id_col: str, n: int):
    """(did, gram) numpy arrays — lowercase whitespace word n-grams,
    built from the Arrow token list offsets (no per-row Python loop
    over characters; the join is one vectorized reduce per offset)."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(batch.column(text_col)), r"\s+"
    ).combine_chunks()
    flat = toks.flatten().to_pandas().to_numpy()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    if batch.num_rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.str_)
    # remove empty tokens, recompute per-doc lengths
    keep = flat != ""
    doc_of = np.repeat(np.arange(len(lens)), lens)
    flat, doc_of = flat[keep], doc_of[keep]
    lens = np.bincount(doc_of, minlength=len(lens)).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    # n-gram start positions per doc
    g_per_doc = np.maximum(lens - (n - 1), 0)
    g_doc = np.repeat(np.arange(len(lens)), g_per_doc)
    g_start = (
        np.arange(len(g_doc))
        - np.repeat(np.concatenate([[0], np.cumsum(g_per_doc)[:-1]]), g_per_doc)
        + starts[g_doc]
    )
    if len(g_start) == 0:
        return ids[g_doc], np.empty(0, np.str_)
    # vectorized join over fixed-width unicode arrays (np.char needs
    # str_ dtype, not the object dtype pandas hands back)
    parts = [flat[g_start + i].astype(np.str_) for i in range(n)]
    gram = parts[0]
    for p in parts[1:]:
        gram = np.char.add(np.char.add(gram, " "), p)
    return ids[g_doc], gram


def remove_duplicate_spans(
    ds: ray.data.Dataset,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """ExactSubstr span REMOVAL (Lee et al. 2022 §4.2, window
    granularity): every word-``n``-gram window whose (lowercased)
    gram occurs earlier in the corpus — "earlier" = the globally
    smallest ``(doc_id, position)`` occurrence, which is kept — has
    its ``n`` word positions deleted; each document is rebuilt from
    the surviving original-case words joined by single spaces
    (documented whitespace normalization: the untouched path also
    splits/re-joins, so output formatting is uniform).

    Emits ``(doc_id, text_clean, n_words, n_removed_words)`` for
    EVERY input document (docs with < n words pass through
    normalized).

    Distributed shape: one rows-sized gram-hash shuffle (first-
    occurrence election per gram, non-first occurrences become
    ``(doc, pos)`` removal rows), then one doc-hash shuffle
    co-partitioning removals with their texts; the per-group rebuild
    is fully vectorized (interval-coverage diff+cumsum over the flat
    word stream, Arrow list re-segmentation + ``binary_join``) — no
    per-document Python.  Both key-spaces are rows-sized, as in
    ``duplicate_span_stats``.
    """
    n_docs = ds.count()
    if num_parts is None:
        num_parts = int(max(2, min(256, math.ceil(n_docs / 50_000))))
    nw = int(n)

    def _split_filtered(text_arr: pa.Array):
        """(flat original-case words pa.Array, doc_of, lens) with
        empty tokens dropped — position space shared by gram
        extraction and rebuild."""
        toks = pc.split_pattern_regex(text_arr, r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        lens0 = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(lens0)), lens0)[keep]
        flat = flat.filter(pa.array(keep))
        lens = np.bincount(doc_of, minlength=len(lens0)).astype(np.int64)
        return flat, doc_of, lens

    def windows(batch: pa.Table) -> pa.Table:
        import pandas as pd

        flat, doc_of, lens = _split_filtered(
            pc.fill_null(batch.column(text_col), "")
        )
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        low = np.asarray(pc.utf8_lower(flat).to_pandas(), object)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        g_per_doc = np.maximum(lens - (nw - 1), 0)
        g_doc = np.repeat(np.arange(len(lens)), g_per_doc)
        g_local = np.arange(len(g_doc)) - np.repeat(
            np.concatenate([[0], np.cumsum(g_per_doc)[:-1]]), g_per_doc
        )
        empty = pa.table(
            {
                "hpart": pa.array([], pa.int64()),
                "did": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "gram": pa.array([], pa.string()),
            }
        )
        if len(g_doc) == 0:
            return empty
        g_start = g_local + starts[g_doc]
        parts = [low[g_start + i].astype(np.str_) for i in range(nw)]
        gram = parts[0]
        for p in parts[1:]:
            gram = np.char.add(np.char.add(gram, " "), p)
        h = pd.util.hash_array(gram.astype(object), categorize=False)
        return pa.table(
            {
                "hpart": pa.array(
                    (h % np.uint64(num_parts)).astype(np.int64)
                ),
                "did": pa.array(ids[g_doc]),
                "pos": pa.array(g_local.astype(np.int64)),
                "gram": pa.array(gram.astype(object), pa.string()),
            }
        )

    def non_first(group: pa.Table) -> pa.Table:
        did = group.column("did").to_numpy(zero_copy_only=False)
        pos = group.column("pos").to_numpy(zero_copy_only=False)
        gram = group.column("gram").to_pandas().to_numpy()
        order = np.lexsort((pos, did, gram))
        did, pos, gram = did[order], pos[order], gram[order]
        first = np.empty(len(gram), bool)
        if len(gram):
            first[0] = True
            first[1:] = gram[1:] != gram[:-1]
        return pa.table(
            {
                "did": pa.array(did[~first]),
                "pos": pa.array(pos[~first]),
            }
        )

    removals = (
        ds.select_columns([id_col, text_col])
        .map_batches(windows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hpart")
        .map_groups(non_first, batch_format="pyarrow")
    )

    def tag_doc(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "dpart": pa.array(
                    (ids % np.int64(num_parts)).astype(np.int64)
                ),
                "did": pa.array(ids),
                "pos": pa.array(np.full(len(ids), -1, np.int64)),
                "text": pc.cast(
                    pc.fill_null(batch.column(text_col), ""), pa.string()
                ),
            }
        )

    def tag_removal(batch: pa.Table) -> pa.Table:
        did = batch.column("did").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "dpart": pa.array((did % np.int64(num_parts)).astype(np.int64)),
                "did": batch.column("did"),
                "pos": batch.column("pos"),
                "text": pa.array([""] * len(did), pa.string()),
            }
        )

    tagged = ds.select_columns([id_col, text_col]).map_batches(
        tag_doc, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        removals.map_batches(
            tag_removal, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def rebuild(group: pa.Table) -> pa.Table:
        pos = group.column("pos").to_numpy(zero_copy_only=False)
        is_doc = pos < 0
        docs = group.filter(pa.array(is_doc))
        rem = group.filter(pa.array(~is_doc))
        dids = docs.column("did").to_numpy(zero_copy_only=False)
        order = np.argsort(dids, kind="stable")
        docs = docs.take(pa.array(order))
        dids = dids[order]
        flat, doc_of, lens = _split_filtered(
            docs.column("text").combine_chunks()
        )
        total = int(lens.sum())
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        r_did = rem.column("did").to_numpy(zero_copy_only=False)
        r_pos = rem.column("pos").to_numpy(zero_copy_only=False)
        r_doc = np.searchsorted(dids, r_did)
        delta = np.zeros(total + 1, np.int64)
        if len(r_did):
            fs = starts[r_doc] + r_pos
            np.add.at(delta, fs, 1)
            np.add.at(delta, fs + nw, -1)
        covered = np.cumsum(delta[:total]) > 0
        kept = ~covered
        kept_words = flat.filter(pa.array(kept))
        new_lens = np.bincount(doc_of[kept], minlength=len(dids)).astype(
            np.int64
        )
        offsets = pa.array(
            np.concatenate([[0], np.cumsum(new_lens)]).astype(np.int32)
        )
        joined = pc.binary_join(
            pa.ListArray.from_arrays(offsets, kept_words), " "
        )
        return pa.table(
            {
                id_col: pa.array(dids),
                "text_clean": joined,
                "n_words": pa.array(lens),
                "n_removed_words": pa.array(lens - new_lens),
            }
        )

    return tagged.groupby("dpart").map_groups(
        rebuild, batch_format="pyarrow"
    )


def ngram_contamination(
    ds: ray.data.Dataset,
    bench_filter,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(doc_id, n_hits, contaminated) — exact word-``n``-gram overlap of
    every document against the benchmark subset selected by
    ``bench_filter(batch) -> bool mask`` (the standard training-data
    decontamination check: flag any document sharing an 8-gram with an
    eval set).

    The benchmark grams are collected once and broadcast via
    ``ray.put`` (eval sets are tiny next to the corpus — the canonical
    small-side broadcast); each batch then probes a sorted gram array
    with ``np.searchsorted``.  ``n_hits`` counts the document's
    DISTINCT matching grams.  At larger eval-set scale, swap the exact
    strings for 64-bit gram hashes (same plumbing, documented delta).
    """

    def bench_grams(batch: pa.Table) -> pa.Table:
        mask = bench_filter(batch)
        sub = batch.filter(pa.array(mask))
        _, gram = _word_ngrams(sub, text_col, id_col, n)
        return pa.table({"gram": pa.array(np.unique(gram), pa.string())})

    bench_tbl = pa.concat_tables(
        ds.map_batches(
            bench_grams, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    bench_sorted = np.unique(bench_tbl.column("gram").to_pandas().to_numpy())
    ref = ray.put(bench_sorted)

    class _Probe:
        def __init__(self, bref):
            self._bench = ray.get(bref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            did, gram = _word_ngrams(batch, text_col, id_col, n)
            bench = self._bench
            if len(gram) and len(bench):
                pos = np.searchsorted(bench, gram)
                pos = np.minimum(pos, len(bench) - 1)
                hit = bench[pos] == gram
            else:
                hit = np.zeros(len(gram), dtype=bool)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            n_hits = np.zeros(len(ids), np.int64)
            if hit.any():
                # distinct matching grams per doc: sort hit rows by
                # (doc, gram), keep one row per run, count runs per doc
                hd, hg = did[hit], gram[hit]
                order = np.lexsort((hg, hd))
                hd, hg = hd[order], hg[order]
                first = np.empty(len(hd), dtype=bool)
                first[0] = True
                first[1:] = (hd[1:] != hd[:-1]) | (hg[1:] != hg[:-1])
                run_docs = hd[np.flatnonzero(first)]
                db = np.empty(len(run_docs), dtype=bool)
                db[0] = True
                db[1:] = run_docs[1:] != run_docs[:-1]
                doc_starts = np.flatnonzero(db)
                per_doc = np.diff(np.append(doc_starts, len(run_docs)))
                docs_u = run_docs[doc_starts]
                # ids are unique per batch (one row per doc) but may be
                # unsorted: map each doc back via argsort+searchsorted
                o = np.argsort(ids, kind="stable")
                pos_d = o[np.searchsorted(ids[o], docs_u)]
                n_hits[pos_d] = per_doc
            return pa.table(
                {
                    "doc_id": pa.array(ids),
                    "n_hits": pa.array(n_hits),
                    "contaminated": pa.array(
                        (n_hits > 0).astype(np.int64)
                    ),
                }
            )

    return ds.map_batches(
        _Probe,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


def duplicate_span_stats(
    ds: ray.data.Dataset,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(doc_id, n_windows, n_dup_windows, dup_ratio) — for every
    document, the fraction of its word-``n``-gram window POSITIONS
    whose gram occurs at least twice in the whole corpus (the
    ExactSubstr duplication diagnostic of Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better":
    spans repeated anywhere in the corpus, including within the same
    document, are dedup candidates).

    Pipeline: vectorized window extraction per batch
    (``_word_ngrams``), ONE hash shuffle of (gram → doc) rows into a
    rows-sized partition key-space, per-group corpus counts and
    per-doc duplicated-position counts, then a per-doc groupby sum —
    never an all-pairs comparison, and gram strings can be swapped
    for 64-bit hashes at scale (documented delta, as in
    ``ngram_contamination``).  Documents with fewer than ``n`` words
    have no windows and emit no row.  Exact integers + one IEEE
    division, so the SQL twin matches bitwise.
    """
    n_docs = ds.count()
    if num_parts is None:
        num_parts = int(max(2, min(256, math.ceil(n_docs / 50_000))))

    def windows(batch: pa.Table) -> pa.Table:
        import pandas as pd

        did, gram = _word_ngrams(batch, text_col, id_col, n)
        # vectorized stable string hash (same scheme as the shingle
        # partitioner above) — no per-gram Python loop
        h = pd.util.hash_array(np.asarray(gram, object), categorize=False)
        part = (h % np.uint64(num_parts)).astype(np.int64)
        return pa.table(
            {
                "hpart": pa.array(part),
                "did": pa.array(did),
                "gram": pa.array(gram.astype(object), pa.string()),
            }
        )

    def per_gram(group: pa.Table) -> pa.Table:
        did = group.column("did").to_numpy(zero_copy_only=False)
        gram = group.column("gram").to_pandas().to_numpy()
        order = np.lexsort((did, gram))
        did, gram = did[order], gram[order]
        first = np.empty(len(gram), dtype=bool)
        if len(gram):
            first[0] = True
            first[1:] = gram[1:] != gram[:-1]
        starts = np.flatnonzero(first)
        total = np.diff(np.append(starts, len(gram)))
        gram_of = np.repeat(np.arange(len(starts)), total)
        dup_gram = total[gram_of] >= 2
        # per (doc) sums of duplicated / total positions
        return pa.table(
            {
                "did": pa.array(did),
                "dup": pa.array(dup_gram.astype(np.int64)),
                "tot": pa.array(np.ones(len(did), np.int64)),
            }
        )

    stats = (
        ds.select_columns([id_col, text_col])
        .map_batches(windows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hpart")
        .map_groups(per_gram, batch_format="pyarrow")
        .groupby("did")
        .aggregate(
            Sum("dup", alias_name="n_dup_windows"),
            Sum("tot", alias_name="n_windows"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        d = batch.column("n_dup_windows").to_numpy(zero_copy_only=False)
        t = batch.column("n_windows").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch.column("did"),
                "n_windows": pa.array(t.astype(np.int64)),
                "n_dup_windows": pa.array(d.astype(np.int64)),
                "dup_ratio": pa.array(
                    np.where(t > 0, d / np.maximum(t, 1), 0.0)
                ),
            }
        )

    return stats.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def ngram_novelty(
    ds: ray.data.Dataset,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(doc_id, n_windows, novel_windows, novelty_ratio) — for every
    document (with >= ``n`` words), the fraction of its word-``n``-gram
    window positions whose gram FIRST appears in this document
    (corpus-min doc_id == this doc).  The memorization/novelty
    diagnostic complement of ``duplicate_span_stats``: a crawl shard
    full of boilerplate scores near 0, fresh text near 1.

    Same distributed shape as ``duplicate_span_stats``: vectorized
    window extraction, ONE rows-sized gram-hash shuffle (per-gram
    min-doc election), per-doc groupby sums.  Exact integers + one
    IEEE division — bitwise SQL twin.
    """
    n_docs = ds.count()
    if num_parts is None:
        num_parts = int(max(2, min(256, math.ceil(n_docs / 50_000))))

    def windows(batch: pa.Table) -> pa.Table:
        import pandas as pd

        did, gram = _word_ngrams(batch, text_col, id_col, n)
        h = pd.util.hash_array(np.asarray(gram, object), categorize=False)
        part = (h % np.uint64(num_parts)).astype(np.int64)
        return pa.table(
            {
                "hpart": pa.array(part),
                "did": pa.array(did),
                "gram": pa.array(gram.astype(object), pa.string()),
            }
        )

    def per_gram(group: pa.Table) -> pa.Table:
        did = group.column("did").to_numpy(zero_copy_only=False)
        gram = group.column("gram").to_pandas().to_numpy()
        order = np.lexsort((did, gram))
        did, gram = did[order], gram[order]
        first = np.empty(len(gram), dtype=bool)
        if len(gram):
            first[0] = True
            first[1:] = gram[1:] != gram[:-1]
        starts = np.flatnonzero(first)
        total = np.diff(np.append(starts, len(gram)))
        gram_of = np.repeat(np.arange(len(starts)), total)
        min_did = did[starts]  # did sorted within gram: first = min
        novel = did == min_did[gram_of]
        return pa.table(
            {
                "did": pa.array(did),
                "nov": pa.array(novel.astype(np.int64)),
                "tot": pa.array(np.ones(len(did), np.int64)),
            }
        )

    stats = (
        ds.select_columns([id_col, text_col])
        .map_batches(windows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hpart")
        .map_groups(per_gram, batch_format="pyarrow")
        .groupby("did")
        .aggregate(
            Sum("nov", alias_name="novel_windows"),
            Sum("tot", alias_name="n_windows"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        v = batch.column("novel_windows").to_numpy(zero_copy_only=False)
        t = batch.column("n_windows").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch.column("did"),
                "n_windows": pa.array(t.astype(np.int64)),
                "novel_windows": pa.array(v.astype(np.int64)),
                "novelty_ratio": pa.array(
                    np.where(t > 0, v / np.maximum(t, 1), 0.0)
                ),
            }
        )

    return stats.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def vocab_growth(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """(doc_id, new_types, cum_types) — Heaps'-law vocabulary growth
    curve: per document (in doc-id order) the number of DISTINCT
    lowercased word types whose corpus-first occurrence is this
    document, and the running vocabulary size after it.

    Distributed shape: word extraction per batch, one rows-sized
    word-hash shuffle electing each type's min doc, a per-doc count,
    then the engine's two-phase global ordered scan for the running
    total.  Exact int64 — bitwise SQL twin (window cumsum).
    """
    from igraph_ray.stages.scan import exclusive_scan

    n_docs = ds.count()
    if num_parts is None:
        num_parts = int(max(2, min(256, math.ceil(n_docs / 50_000))))

    def words(batch: pa.Table) -> pa.Table:
        import pandas as pd

        did, w = _word_ngrams(batch, text_col, id_col, 1)
        h = pd.util.hash_array(np.asarray(w, object), categorize=False)
        part = (h % np.uint64(num_parts)).astype(np.int64)
        return pa.table(
            {
                "hpart": pa.array(part),
                "did": pa.array(did),
                "w": pa.array(w.astype(object), pa.string()),
            }
        )

    def per_word(group: pa.Table) -> pa.Table:
        did = group.column("did").to_numpy(zero_copy_only=False)
        w = group.column("w").to_pandas().to_numpy()
        order = np.lexsort((did, w))
        did, w = did[order], w[order]
        first = np.empty(len(w), dtype=bool)
        if len(w):
            first[0] = True
            first[1:] = w[1:] != w[:-1]
        starts = np.flatnonzero(first)
        return pa.table(
            {
                "did": pa.array(did[starts]),  # min doc per type
                "one": pa.array(np.ones(len(starts), np.int64)),
            }
        )

    per_doc = (
        ds.select_columns([id_col, text_col])
        .map_batches(words, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hpart")
        .map_groups(per_word, batch_format="pyarrow")
        .groupby("did")
        .aggregate(Sum("one", alias_name="new_types"))
    )
    scanned = exclusive_scan(
        per_doc.map_batches(
            lambda b: pa.table(
                {
                    "did": b.column("did"),
                    "tie": b.column("did"),
                    "new_types": pc.cast(
                        b.column("new_types"), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ("did", "tie"),
        "new_types",
    )

    def finish(batch: pa.Table) -> pa.Table:
        nt = batch.column("new_types").to_numpy(zero_copy_only=False)
        ex = batch.column("scan").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch.column("did"),
                "new_types": pa.array(nt.astype(np.int64)),
                "cum_types": pa.array((ex + nt).astype(np.int64)),
            }
        )

    return scanned.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def fingerprint_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 16,
    min_shared: int = 2,
    df_cap: int = 64,
) -> ray.data.Dataset:
    """Winnowing-fingerprint near-duplicate candidates (the MOSS
    scheme, Schleimer–Wilkerson–Aiken SIGMOD 2003): docs sharing ≥
    ``min_shared`` distinct winnowed k-gram fingerprints, rows
    ``(doc_a, doc_b, shared)`` with doc_a < doc_b.

    Shape: per-doc distinct fingerprints (map-only, reuses
    ``winnow_fingerprints``), one fingerprint-keyed groupby emitting
    the per-fingerprint doc pairs (fingerprints held by more than
    ``df_cap`` docs are dropped — boilerplate shingles, the same df
    guard as the inverted-index Jaccard), one pair-count groupby.
    Only docs long enough for a full winnow window (len ≥
    k + window − 1) participate — mirrors the SQL twin's general
    branch.
    """
    from ray.data.aggregate import Sum

    from igraph_ray.functions.text import winnow_fingerprints

    def long_enough(batch: pa.Table) -> pa.Table:
        n = pc.utf8_length(batch.column(text_col))
        return batch.filter(
            pc.greater_equal(n, pa.scalar(k + window - 1))
        )

    fps = winnow_fingerprints(
        ds.select_columns([id_col, text_col]).map_batches(
            long_enough, batch_format="pyarrow", zero_copy_batch=True
        ),
        text_col=text_col,
        k=k,
        window=window,
    )

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        lists = batch.column("fingerprints").combine_chunks()
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False)
        did = np.repeat(ids, lens.astype(np.int64))
        # vectorized per-doc distinct: lexsort + boundary dedupe
        order = np.lexsort((flat, did))
        did, fp = did[order], flat[order]
        if len(did):
            keep = np.empty(len(did), dtype=bool)
            keep[0] = True
            keep[1:] = (did[1:] != did[:-1]) | (fp[1:] != fp[:-1])
            did, fp = did[keep], fp[keep]
        return pa.table(
            {
                "did": pa.array(did),
                "fp": pa.array(fp.astype(np.uint64).astype(np.int64)),
            }
        )

    pairs = (
        fps.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("fp")
        .map_groups(
            lambda g: _fp_group_pairs(g, df_cap), batch_format="pyarrow"
        )
    )
    out = (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(Sum("one", alias_name="shared"))
    )

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(
                batch.column("shared"), pa.scalar(min_shared)
            )
        )

    return out.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def _fp_group_pairs(group: pa.Table, df_cap: int) -> pa.Table:
    dids = np.unique(
        group.column("did").to_numpy(zero_copy_only=False)
    )
    g = len(dids)
    if g < 2 or g > df_cap:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "one": pa.array([], pa.int64()),
            }
        )
    iu, ju = np.triu_indices(g, 1)
    return pa.table(
        {
            "doc_a": pa.array(dids[iu]),
            "doc_b": pa.array(dids[ju]),
            "one": pa.array(np.ones(len(iu), np.int64)),
        }
    )
