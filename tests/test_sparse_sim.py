"""All-pairs tf-idf cosine (APSS) vs a brute-force dense oracle that
applies the identical vocabulary rule (df <= df_cap) and smooth-idf
weighting, plus determinism across runs and block layouts."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.functions.sparse_sim import tfidf_cosine_pairs


def _corpus(seed=3, n=120, vocab=40, doclen=12):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    # zipfy draw so some terms are corpus-wide (df pruning is exercised)
    p = 1.0 / np.arange(1, vocab + 1)
    p /= p.sum()
    texts = [
        " ".join(rng.choice(words, size=doclen, p=p)) for _ in range(n)
    ]
    # planted near-duplicate pair with distinctive rare terms
    texts[7] = "zebra quark flux omega gamma delta"
    texts[93] = "zebra quark flux omega gamma delta extra"
    return pa.table({"doc_id": list(range(n)), "text": texts})


def _oracle(t: pa.Table, threshold: float, df_cap: int):
    ids = t.column("doc_id").to_pylist()
    texts = [s.lower().split() for s in t.column("text").to_pylist()]
    n = len(ids)
    from collections import Counter

    tfs = [Counter(toks) for toks in texts]
    df = Counter()
    for c in tfs:
        df.update(c.keys())
    vocab = sorted(w for w, d in df.items() if d <= df_cap)
    vidx = {w: i for i, w in enumerate(vocab)}
    X = np.zeros((n, len(vocab)))
    for r, c in enumerate(tfs):
        for w, tf in c.items():
            if w in vidx:
                X[r, vidx[w]] = tf * (
                    np.log((1.0 + n) / (1.0 + df[w])) + 1.0
                )
    norms = np.sqrt((X * X).sum(axis=1))
    norms[norms == 0] = 1.0
    X /= norms[:, None]
    S = X @ X.T
    out = {}
    for i in range(n):
        for j in range(i + 1, n):
            if S[i, j] >= threshold:
                out[(ids[i], ids[j])] = S[i, j]
    return out


def _got(ds_out) -> dict:
    tbl = pa.concat_tables(
        ds_out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return {
        (a, b): c
        for a, b, c in zip(
            tbl.column("doc_a").to_pylist(),
            tbl.column("doc_b").to_pylist(),
            tbl.column("cosine").to_pylist(),
        )
    }


def test_matches_bruteforce_oracle():
    t = _corpus()
    threshold, df_cap = 0.25, 30
    want = _oracle(t, threshold, df_cap)
    got = _got(
        tfidf_cosine_pairs(
            ray.data.from_arrow(t).repartition(6),
            threshold=threshold,
            df_cap=df_cap,
        )
    )
    # the threshold boundary is float-sensitive; no oracle pair may sit
    # within 1e-9 of it for the set comparison to be exact (holds here)
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)
    assert (7, 93) in got and got[(7, 93)] > 0.8  # planted near-dup


def test_deterministic_across_layouts():
    t = _corpus(seed=5)
    a = _got(
        tfidf_cosine_pairs(
            ray.data.from_arrow(t).repartition(2), threshold=0.2, df_cap=25
        )
    )
    b = _got(
        tfidf_cosine_pairs(
            ray.data.from_arrow(t).repartition(11), threshold=0.2, df_cap=25
        )
    )
    assert a == b  # bitwise: same pairs, same cosines


def test_df_cap_prunes_hot_terms():
    # every doc shares 'common'; with df_cap below n it cannot pair docs
    t = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "common alpha beta",
                "common alpha beta",
                "common gamma",
                "common delta",
            ],
        }
    )
    got = _got(
        tfidf_cosine_pairs(
            ray.data.from_arrow(t), threshold=0.01, df_cap=3
        )
    )
    assert set(got) == {(0, 1)}  # only the alpha/beta overlap survives
    assert abs(got[(0, 1)] - 1.0) < 1e-12  # identical capped vectors
