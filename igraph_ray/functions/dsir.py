"""DSIR — Data Selection via Importance Resampling.

Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" (arXiv:2302.03169): estimate importance weights between a
small TARGET corpus (the distribution you want) and the RAW corpus
(what you have) with hashed n-gram bag-of-words models, then resample
raw documents by Gumbel top-k on the log importance weights.

All stages are Ray-Data-first and vectorized:

1. **Feature pass** (per corpus): one ``map_batches`` over the text
   column — Arrow RE2 tokenization, unigram + same-doc bigram hashing
   into ``n_buckets`` (per-worker memoized token→hash64, splitmix-style
   crc pair), per-batch ``np.bincount`` pre-combine → ``(bucket, n)``
   partials → one bucket-keyed groupby.  The shuffled table is
   O(batches × n_buckets), never O(tokens).
2. **Driver LUT**: the two bucket-count vectors (``n_buckets`` rows
   each — tiny, fixed size regardless of corpus scale) become a
   Laplace-smoothed log-likelihood-ratio lookup table
   ``llr[b] = log p̂_target(b) − log p̂_raw(b)``, broadcast once with
   ``ray.put``.
3. **Scoring pass**: one map over the raw corpus — feature-hash each
   doc and segment-sum ``llr[bucket]`` per document with
   ``np.bincount(doc_idx, weights=...)``; add deterministic Gumbel
   noise keyed on ``splitmix64(doc_id ^ seed)`` (resample-without-
   replacement ≡ Gumbel top-k, Vieira 2014).
4. **Selection**: per-batch partial top-k prune → one-block merge —
   survivors are O(k × blocks), no global sort.

Deterministic end-to-end: same corpus → same selected set on any
cluster size / block layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from igraph_ray.functions.dedup import _token_hashes64
from igraph_ray.utils import hash_int64

__all__ = [
    "hashed_ngram_counts",
    "dsir_logratio_lut",
    "dsir_scores",
    "dsir_select",
]


def _doc_features(
    batch: pa.Table, text_col: str, n_buckets: int
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, bucket) arrays for the batch's unigram + bigram
    hashed features.  doc_idx is the batch-local row index; every
    feature occurrence produces one entry (bag-of-ngrams counts)."""
    filled = pc.fill_null(batch.column(text_col), "")
    if isinstance(filled, pa.ChunkedArray):
        filled = filled.combine_chunks()
    lists = pc.split_pattern_regex(pc.utf8_lower(filled), r"\s+")
    flat = lists.flatten()
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    doc_idx = doc_idx[keep]
    n_tok = len(doc_idx)
    B = np.uint64(n_buckets)

    def buckets_of(arr: pa.Array) -> np.ndarray:
        if len(arr) == 0:
            return np.empty(0, np.int64)
        d = pc.dictionary_encode(arr)
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq_h = _token_hashes64(d.dictionary.to_pylist()) % B
        return uniq_h.astype(np.int64)[idx]

    uni = buckets_of(flat)
    if n_tok >= 2:
        pairs = pc.binary_join_element_wise(
            flat.slice(0, n_tok - 1), flat.slice(1, n_tok - 1), " "
        )
        same = doc_idx[:-1] == doc_idx[1:]
        bi = buckets_of(pairs.filter(pa.array(same)))
        bi_doc = doc_idx[:-1][same]
    else:
        bi = np.empty(0, np.int64)
        bi_doc = np.empty(0, np.int64)
    return (
        np.concatenate([doc_idx, bi_doc]),
        np.concatenate([uni, bi]),
    )


def hashed_ngram_counts(
    ds: ray.data.Dataset,
    text_col: str = "text",
    n_buckets: int = 16384,
) -> np.ndarray:
    """Corpus-level hashed unigram+bigram bucket counts (length
    ``n_buckets`` int64 vector).  One map pass with per-batch bincount
    pre-combine; the groupby shuffles ≤ ``n_buckets`` rows per batch."""

    def partial(batch: pa.Table) -> pa.Table:
        _, buckets = _doc_features(batch, text_col, n_buckets)
        cnt = np.bincount(buckets, minlength=n_buckets)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64)),
                "n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
    )
    out = np.zeros(n_buckets, np.int64)
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=None):
        out[b.column("bucket").to_numpy(zero_copy_only=False)] = b.column(
            "n"
        ).to_numpy(zero_copy_only=False)
    return out


def dsir_logratio_lut(
    target_counts: np.ndarray,
    raw_counts: np.ndarray,
    alpha: float = 1.0,
) -> np.ndarray:
    """Laplace-smoothed per-bucket log-likelihood ratio
    ``log p̂_target − log p̂_raw`` (float64, length n_buckets)."""
    B = len(target_counts)
    pt = (target_counts + alpha) / (target_counts.sum() + alpha * B)
    pr = (raw_counts + alpha) / (raw_counts.sum() + alpha * B)
    return np.log(pt) - np.log(pr)


def dsir_scores(
    raw: ray.data.Dataset,
    llr: np.ndarray,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
) -> ray.data.Dataset:
    """(id, logw, gumbel_key) per raw document.

    ``logw`` = Σ feature-count × llr[bucket]; ``gumbel_key`` = logw +
    Gumbel(splitmix64(id ^ seed)) — top-k on it is a without-
    replacement importance resample (Gumbel-max trick).  The LUT ships
    once via ``ray.put``."""
    n_buckets = len(llr)
    lref = ray.put(np.ascontiguousarray(llr, np.float64))
    seed64 = np.int64(np.uint64(seed) & np.uint64(0x7FFFFFFFFFFFFFFF))

    def score(batch: pa.Table) -> pa.Table:
        lut = ray.get(lref)
        doc_idx, buckets = _doc_features(batch, text_col, n_buckets)
        logw = np.bincount(
            doc_idx, weights=lut[buckets], minlength=batch.num_rows
        )
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        u = (hash_int64(ids ^ seed64).astype(np.float64) + 0.5) / 2.0**64
        gumbel = -np.log(-np.log(u))
        return pa.table(
            {
                id_col: pa.array(ids),
                "logw": pa.array(logw),
                "gumbel_key": pa.array(logw + gumbel),
            }
        )

    return raw.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def dsir_select(
    scored: ray.data.Dataset,
    k: int,
    id_col: str = "doc_id",
) -> pa.Table:
    """The k documents with the greatest ``gumbel_key`` (ties toward
    the smallest id — the (key, id) order is unique).  Per-batch prune
    keeps ≤ k rows per block, so the merge sees O(k × blocks) rows —
    no global sort."""

    def prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        key = batch.column("gumbel_key").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -key))[:k]
        return batch.take(pa.array(np.sort(order)))

    pruned = pa.concat_tables(
        scored.map_batches(
            prune, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    key = pruned.column("gumbel_key").to_numpy(zero_copy_only=False)
    ids = pruned.column(id_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -key))[:k]
    # emit in (gumbel_key DESC, id ASC) order — layout-independent
    return pruned.take(pa.array(order))
