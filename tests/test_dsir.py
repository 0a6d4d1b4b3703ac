"""DSIR importance resampling (functions/dsir.py): hashed n-gram
counts and per-doc log-weights are pinned by a sequential pure-Python
replay with the same token hash; selection is deterministic across
block layouts; target-like documents outscore off-target ones."""

import zlib

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.functions.dsir import (
    dsir_logratio_lut,
    dsir_scores,
    dsir_select,
    hashed_ngram_counts,
)
from tests.util import ds_to_table


def _hash64(t: str) -> int:
    tb = t.encode()
    return (zlib.crc32(tb) << 32) | zlib.crc32(tb + b"x")


def _brute_buckets(text: str, B: int) -> list[int]:
    toks = text.lower().split()
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [_hash64(f) % B for f in feats]


def _to_ds(texts, blocks=3):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(num_blocks=blocks)


TARGET = [
    "the quick brown fox jumps over the lazy dog",
    "brown foxes and quick dogs run in the field",
    "a fox and a dog play in the brown field",
]
RAW = [
    "the quick brown fox likes the lazy dog",          # target-like
    "stock market futures fell sharply on tuesday",     # off-target
    "brown dog and quick fox in a field",               # target-like
    "quarterly earnings beat analyst expectations",     # off-target
    "",                                                 # empty doc
]


def test_hashed_counts_match_brute(ray_session):
    B = 512
    got = hashed_ngram_counts(_to_ds(TARGET), n_buckets=B)
    want = np.zeros(B, np.int64)
    for t in TARGET:
        for b in _brute_buckets(t, B):
            want[b] += 1
    assert (got == want).all()


def test_scores_match_brute(ray_session):
    B = 512
    tc = hashed_ngram_counts(_to_ds(TARGET), n_buckets=B)
    rc = hashed_ngram_counts(_to_ds(RAW), n_buckets=B)
    llr = dsir_logratio_lut(tc, rc)
    out = ds_to_table(dsir_scores(_to_ds(RAW), llr))
    got = dict(
        zip(out.column("doc_id").to_pylist(), out.column("logw").to_pylist())
    )
    for i, t in enumerate(RAW):
        want = float(sum(llr[b] for b in _brute_buckets(t, B)))
        assert abs(got[i] - want) < 1e-9, (i, got[i], want)


def test_target_like_docs_outscore(ray_session):
    B = 2048
    tc = hashed_ngram_counts(_to_ds(TARGET), n_buckets=B)
    rc = hashed_ngram_counts(_to_ds(RAW), n_buckets=B)
    llr = dsir_logratio_lut(tc, rc)
    out = ds_to_table(dsir_scores(_to_ds(RAW), llr))
    s = dict(
        zip(out.column("doc_id").to_pylist(), out.column("logw").to_pylist())
    )
    assert min(s[0], s[2]) > max(s[1], s[3])


def test_select_deterministic_across_layouts(ray_session):
    B = 1024
    tc = hashed_ngram_counts(_to_ds(TARGET), n_buckets=B)
    rc = hashed_ngram_counts(_to_ds(RAW), n_buckets=B)
    llr = dsir_logratio_lut(tc, rc)
    picks = []
    for blocks in (1, 4):
        scored = dsir_scores(_to_ds(RAW, blocks=blocks), llr, seed=7)
        picks.append(
            dsir_select(scored, k=2).column("doc_id").to_pylist()
        )
    assert picks[0] == picks[1]
    assert len(picks[0]) == 2


def test_select_is_topk_on_gumbel_key(ray_session):
    B = 1024
    tc = hashed_ngram_counts(_to_ds(TARGET), n_buckets=B)
    rc = hashed_ngram_counts(_to_ds(RAW), n_buckets=B)
    llr = dsir_logratio_lut(tc, rc)
    scored = ds_to_table(dsir_scores(_to_ds(RAW), llr, seed=3))
    keys = dict(
        zip(
            scored.column("doc_id").to_pylist(),
            scored.column("gumbel_key").to_pylist(),
        )
    )
    want = sorted(keys, key=lambda i: (-keys[i], i))[:3]
    got = dsir_select(
        dsir_scores(_to_ds(RAW), llr, seed=3), k=3
    ).column("doc_id").to_pylist()
    assert got == want
