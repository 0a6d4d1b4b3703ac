"""Unigram-LM perplexity scoring vs a brute-force reference."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.functions.text import corpus_unigram_counts, unigram_logprob
from tests.util import ds_to_table

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat"),
    (2, "a rare unicorn word"),
    (3, ""),
    (4, "THE The the"),  # lowercasing folds these together
]


def _ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS]),
            }
        )
    ).repartition(3)


def test_unigram_scoring_matches_brute():
    vocab, total = corpus_unigram_counts(_ds(), max_vocab=4)
    counts = Counter()
    for _, t in DOCS:
        counts.update(t.lower().split())
    assert total == sum(counts.values())
    kept = dict(
        zip(vocab.column("term").to_pylist(), vocab.column("tf").to_pylist())
    )
    # top-4 by (tf desc, term asc)
    want_kept = dict(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    )
    assert kept == want_kept

    out = ds_to_table(unigram_logprob(_ds(), vocab, total))
    got = {
        d: (n, a, p)
        for d, n, a, p in zip(
            out.column("doc_id").to_pylist(),
            out.column("n_tokens").to_pylist(),
            out.column("avg_logp").to_pylist(),
            out.column("ppl").to_pylist(),
        )
    }
    vsize = len(kept) + 1
    denom = total + vsize
    for d, t in DOCS:
        toks = t.lower().split()
        if not toks:
            assert got[d] == (0, 0.0, 1.0)
            continue
        lp = [
            math.log((kept.get(w, 0) + 1) / denom)
            if w in kept
            else math.log(1.0 / denom)
            for w in toks
        ]
        avg = sum(lp) / len(toks)
        n, a, p = got[d]
        assert n == len(toks)
        assert abs(a - avg) < 1e-12, d
        assert abs(p - math.exp(-avg)) < 1e-9


def test_common_docs_score_better_than_rare():
    vocab, total = corpus_unigram_counts(_ds(), max_vocab=4)
    out = ds_to_table(unigram_logprob(_ds(), vocab, total))
    ppl = dict(
        zip(out.column("doc_id").to_pylist(), out.column("ppl").to_pylist())
    )
    # doc 4 (all 'the') is far more predictable than doc 2 (all OOV)
    assert ppl[4] < ppl[0] < ppl[2]
