"""Exact heavy hitters (summary + recount) vs a brute-force oracle."""

from collections import Counter

import pyarrow as pa
import pytest
import ray.data

from igraph_ray.functions.text import frequent_terms
from tests.util import ds_to_table


def _docs(n=200):
    # skewed corpus: token t{i} appears with frequency ~ 1/(i+1)
    texts = []
    for d in range(n):
        toks = []
        for i in range(40):
            if d % (i + 1) == 0:
                toks.append(f"t{i}")
        texts.append(" ".join(toks))
    return texts


def test_frequent_terms_exact():
    texts = _docs()
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(7)
    got = ds_to_table(frequent_terms(ds, top_n=10, summary_size=64))
    want = Counter()
    for t in texts:
        want.update(t.split())
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert (
        list(
            zip(got.column("term").to_pylist(), got.column("n").to_pylist())
        )
        == top
    )


def test_frequent_terms_uncertifiable_raises():
    # near-uniform corpus + tiny summary: the n-th count cannot beat
    # total/summary_size, so the operator must refuse
    texts = [f"u{i} u{i + 1} u{i + 2}" for i in range(500)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    with pytest.raises(ValueError, match="not certifiable"):
        frequent_terms(ds, top_n=10, summary_size=4)
