"""ngram_novelty / vocab_growth vs brute-force reference."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.functions.dedup import ngram_novelty, vocab_growth

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again today"),
    (1, "the quick brown fox jumps over the lazy dog again today"),
    (2, "a completely different sentence with eight or more words here"),
    (3, "the quick brown fox jumps over the lazy dog sleeping now"),
    (4, "short doc"),  # < 8 words: no windows
]


def _ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS], pa.string()),
            }
        )
    )


def _grams(text, n=8):
    w = [x for x in text.lower().split() if x]
    return [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]


def test_ngram_novelty_vs_brute(ray_session):
    first = {}
    for d, t in DOCS:
        for g in _grams(t):
            first.setdefault(g, d)
    want = {}
    for d, t in DOCS:
        gs = _grams(t)
        if not gs:
            continue
        want[d] = (len(gs), sum(1 for g in gs if first[g] == d))
    out = pa.concat_tables(
        ngram_novelty(_ds()).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    got = {
        d: (t, v)
        for d, t, v in zip(
            out.column("doc_id").to_pylist(),
            out.column("n_windows").to_pylist(),
            out.column("novel_windows").to_pylist(),
        )
    }
    assert got == want
    ratios = dict(
        zip(
            out.column("doc_id").to_pylist(),
            out.column("novelty_ratio").to_pylist(),
        )
    )
    for d, (t, v) in want.items():
        assert ratios[d] == v / t


def test_vocab_growth_vs_brute(ray_session):
    first = {}
    for d, t in DOCS:
        for w in t.lower().split():
            if w:
                first.setdefault(w, d)
    per_doc = {}
    for w, d in first.items():
        per_doc[d] = per_doc.get(d, 0) + 1
    out = pa.concat_tables(
        vocab_growth(_ds()).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    rows = sorted(
        zip(
            out.column("doc_id").to_pylist(),
            out.column("new_types").to_pylist(),
            out.column("cum_types").to_pylist(),
        )
    )
    cum = 0
    want_rows = []
    for d in sorted(per_doc):
        cum += per_doc[d]
        want_rows.append((d, per_doc[d], cum))
    assert rows == want_rows
    assert cum == len(first)


def test_term_cooccurrence_vs_brute(ray_session):
    from collections import Counter

    from igraph_ray.functions.text import term_cooccurrence

    docs = [
        (0, "alpha beta gamma alpha"),
        (1, "alpha beta delta"),
        (2, "beta gamma delta"),
        (3, "alpha gamma"),
        (4, "epsilon only here"),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
    )
    out = term_cooccurrence(ds, df_lo=2, df_hi=10, top_k=50)
    got = {
        (a, b): (c, cx, cy)
        for a, b, c, cx, cy in zip(
            out.column("term_a").to_pylist(),
            out.column("term_b").to_pylist(),
            out.column("c_xy").to_pylist(),
            out.column("c_x").to_pylist(),
            out.column("c_y").to_pylist(),
        )
    }
    # brute force
    df = Counter()
    per_doc = []
    for _, t in docs:
        terms = sorted(set(t.split()))
        per_doc.append(terms)
        for w in terms:
            df[w] += 1
    vocab = {w for w, c in df.items() if 2 <= c <= 10}
    pairs = Counter()
    for terms in per_doc:
        vs = sorted(set(terms) & vocab)
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                pairs[(vs[i], vs[j])] += 1
    want = {
        (a, b): (c, df[a], df[b]) for (a, b), c in pairs.items()
    }
    assert got == want
