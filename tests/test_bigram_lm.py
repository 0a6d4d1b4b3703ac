"""Interpolated bigram LM (functions/text.py::corpus_bigram_lm /
bigram_logprob): per-doc log-probs pinned by a sequential pure-Python
replay of the documented model; repeated text must outscore shuffled
text (the CCNet-style filter signal); determinism across layouts."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.functions.text import bigram_logprob, corpus_bigram_lm
from tests.util import ds_to_table

DOCS = [
    "the cat sat on the mat",
    "the cat ran to the mat",
    "the dog sat on the rug",
    "mat the on sat cat the",      # same unigrams, scrambled order
    "zebra quark flux",            # mostly OOV-ish (rare terms)
    "",                            # empty
    "single",                      # one token
]


def _to_ds(texts, blocks=3):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(num_blocks=blocks)


def _brute(texts, lam=0.7):
    uni, big, total = Counter(), Counter(), 0
    for t in texts:
        toks = t.lower().split()
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
        total += len(toks)
    vsize = len(uni) + 1
    denom = total + vsize

    def p_uni(w):
        return (uni.get(w, 0) + 1.0) / denom

    out = {}
    for i, t in enumerate(texts):
        toks = t.lower().split()
        if not toks:
            out[i] = (0, 0.0)
            continue
        lp = math.log(p_uni(toks[0]))
        for w1, w2 in zip(toks, toks[1:]):
            cond = big.get((w1, w2), 0) / uni[w1] if uni.get(w1) else 0.0
            lp += math.log(lam * cond + (1 - lam) * p_uni(w2))
        out[i] = (len(toks), lp / len(toks))
    return out


def test_bigram_logprob_matches_brute(ray_session):
    ds = _to_ds(DOCS)
    vocab, total, btbl = corpus_bigram_lm(ds)
    got = ds_to_table(bigram_logprob(ds, vocab, total, btbl))
    g = {
        i: (n, a)
        for i, n, a in zip(
            got.column("doc_id").to_pylist(),
            got.column("n_tokens").to_pylist(),
            got.column("avg_logp").to_pylist(),
        )
    }
    want = _brute(DOCS)
    assert set(g) == set(want)
    for i in want:
        assert g[i][0] == want[i][0], i
        assert abs(g[i][1] - want[i][1]) < 1e-9, (i, g[i], want[i])


def test_fluent_doc_outscores_scrambled(ray_session):
    ds = _to_ds(DOCS)
    vocab, total, btbl = corpus_bigram_lm(ds)
    got = ds_to_table(bigram_logprob(ds, vocab, total, btbl))
    a = dict(
        zip(got.column("doc_id").to_pylist(), got.column("avg_logp").to_pylist())
    )
    assert a[0] > a[3]  # in-order beats scrambled (same unigrams)
    assert a[0] > a[4]  # common text beats rare terms


def test_capped_bigram_table_and_layout_determinism(ray_session):
    texts = [f"alpha beta gamma delta token{i}" for i in range(30)]
    res = []
    for blocks in (1, 5):
        ds = _to_ds(texts, blocks=blocks)
        vocab, total, btbl = corpus_bigram_lm(ds, max_bigrams=3)
        assert len(btbl) == 3  # cap enforced, most frequent kept
        got = ds_to_table(bigram_logprob(ds, vocab, total, btbl))
        res.append(
            sorted(
                zip(
                    got.column("doc_id").to_pylist(),
                    got.column("avg_logp").to_pylist(),
                )
            )
        )
    assert res[0] == res[1]
    assert {k for k, _ in res[0]} == set(range(30))
