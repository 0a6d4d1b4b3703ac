"""Corpus term statistics vs a brute-force oracle."""

from collections import Counter

import pyarrow as pa
import ray.data

from igraph_ray.functions.text import doc_top_terms, term_document_frequency
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


def test_term_df():
    got = ds_to_table(term_document_frequency(_ds()))
    got = dict(
        zip(got.column("term").to_pylist(), got.column("df").to_pylist())
    )
    want = Counter()
    for _, text in DOCS:
        for t in set(text.lower().split()):
            want[t] += 1
    assert got == dict(want)


def test_doc_top_terms():
    got = ds_to_table(doc_top_terms(_ds(), n_docs=len(DOCS), k=2))
    rows = {
        (d, r): (t, tf, s)
        for d, t, tf, r, s in zip(
            got.column("doc_id").to_pylist(),
            got.column("term").to_pylist(),
            got.column("tf").to_pylist(),
            got.column("rank").to_pylist(),
            got.column("tfidf").to_pylist(),
        )
    }
    df = Counter()
    for _, text in DOCS:
        for t in set(text.lower().split()):
            df[t] += 1
    for doc_id, text in DOCS:
        tf = Counter(text.lower().split())
        top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        for rank, (term, cnt) in enumerate(top, 1):
            want = (term, cnt, cnt * len(DOCS) / df[term])
            assert rows[(doc_id, rank)] == want
        assert (doc_id, len(top) + 1) not in rows
