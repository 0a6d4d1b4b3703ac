"""Gopher-style repetition stats vs a brute-force oracle."""

from collections import Counter

import pyarrow as pa
import ray.data

from igraph_ray.functions.text import repetition_stats
from tests.util import ds_to_table

DOCS = [
    (0, "a a a a"),  # dup_frac 3/4, top bigram "a a" x3 -> 6/4 capped? no: 2*3/4=1.5
    (1, "the cat sat on the mat"),
    (2, "x"),
    (3, ""),
    (4, "b c b c b c"),
]


def test_repetition_stats():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS], pa.string()),
            }
        )
    ).repartition(3)
    got = ds_to_table(repetition_stats(ds))
    rows = {
        d: (n, nd, mb, df, tb)
        for d, n, nd, mb, df, tb in zip(
            got.column("doc_id").to_pylist(),
            got.column("n_tokens").to_pylist(),
            got.column("n_distinct").to_pylist(),
            got.column("max_bigram").to_pylist(),
            got.column("dup_frac").to_pylist(),
            got.column("top_bigram_frac").to_pylist(),
        )
    }
    for doc_id, text in DOCS:
        toks = text.lower().split()
        n = len(toks)
        nd = len(set(toks))
        bigs = Counter(zip(toks, toks[1:]))
        mb = max(bigs.values()) if bigs else 0
        df = (n - nd) / n if n else 0.0
        tb = (2 * mb) / n if n else 0.0
        assert rows[doc_id] == (n, nd if n else 0, mb, df, tb), doc_id
