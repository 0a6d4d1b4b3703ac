"""Bigram corpus counts vs a brute-force oracle."""

from collections import Counter

import pyarrow as pa
import ray.data

from igraph_ray.functions.text import bigram_counts
from tests.util import ds_to_table

DOCS = [
    (0, "the Cat sat on the mat"),
    (1, " the dog  ate the cat "),
    (2, "a b a b a"),
    (3, ""),
    (4, "solo"),
    (5, "x y"),
]


def test_bigram_counts():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS], pa.string()),
            }
        )
    ).repartition(4)
    got = ds_to_table(bigram_counts(ds))
    rows = dict(
        zip(got.column("bigram").to_pylist(), got.column("n").to_pylist())
    )
    want = Counter()
    for _, text in DOCS:
        toks = text.lower().split()
        for a, b in zip(toks, toks[1:]):
            want[f"{a} {b}"] += 1
    assert rows == dict(want)
