"""BM25 (odds-idf variant) vs a brute-force oracle."""

from collections import Counter

import pyarrow as pa
import ray.data

from igraph_ray.functions.text import bm25_scores
from tests.util import ds_to_table

DOCS = [
    (0, "the Cat sat on the mat"),
    (1, "the dog  ate the cat "),
    (2, "a b a b a c"),
    (3, ""),
    (4, "cat cat cat dog"),
]


def _ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
                "text": pa.array([d[1] for d in DOCS], pa.string()),
            }
        )
    ).repartition(3)


def _oracle(query_terms, k1=1.2, b=0.75):
    n = len(DOCS)
    dls = {d: len(t.split()) for d, t in DOCS}
    avgdl = sum(dls.values()) / n
    tfs = {d: Counter(t.lower().split()) for d, t in DOCS}
    want = {}
    for term in set(query_terms):
        df = sum(1 for d, _ in DOCS if tfs[d][term] > 0)
        for d, _ in DOCS:
            tf = tfs[d][term]
            if tf == 0:
                continue
            idf = (n - df + 0.5) / (df + 0.5)
            s = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * (dls[d] / avgdl))
            )
            want[(d, term)] = (tf, dls[d], s)
    return want


def test_bm25_scores():
    got = ds_to_table(bm25_scores(_ds(), ["cat", "the", "a", "zebra"]))
    rows = {
        (d, t): (tf, dl, s)
        for d, t, tf, dl, s in zip(
            got.column("doc_id").to_pylist(),
            got.column("term").to_pylist(),
            got.column("tf").to_pylist(),
            got.column("dl").to_pylist(),
            got.column("score").to_pylist(),
        )
    }
    want = _oracle(["cat", "the", "a", "zebra"])
    assert set(rows) == set(want)
    for key, (tf, dl, s) in want.items():
        gtf, gdl, gs = rows[key]
        assert (gtf, gdl) == (tf, dl)
        assert gs == s, (key, gs, s)  # bitwise — same IEEE op chain


def test_bm25_no_hits():
    assert bm25_scores(_ds(), ["zebra"]).count() == 0
