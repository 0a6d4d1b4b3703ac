"""Chunk occurrences and paragraph dedup vs brute-force references."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.functions.paragraphs import chunk_occurrences, paragraph_dedup
from tests.util import ds_to_table


def _chunks(text, w):
    ws = text.split()
    return [
        " ".join(ws[i : i + w]) for i in range(0, len(ws), w)
    ]


DOCS = [
    (0, "a b c d e f g h i j"),  # 2 full chunks of 5
    (1, "a b c d e x y"),  # dup of doc0 chunk1 + partial
    (2, "f g h i j a b c d e"),  # both chunks dup (reordered)
    (3, "unique words only here now and one extra tail"),
    (4, "x y"),  # dup of doc1's partial chunk
    (5, ""),  # no chunks at all -> absent from output
    (6, "  a b c d e   "),  # whitespace runs; dup of doc0 chunk1
]


def test_chunk_occurrences():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS]),
            }
        )
    ).repartition(3)
    got = ds_to_table(chunk_occurrences(ds, width=5))
    rows = set(
        zip(
            got.column("doc_id").to_pylist(),
            got.column("idx").to_pylist(),
            got.column("para").to_pylist(),
        )
    )
    want = set()
    for d, t in DOCS:
        for i, c in enumerate(_chunks(t, 5), 1):
            want.add((d, i, c))
    assert rows == want


def test_paragraph_dedup():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS]),
            }
        )
    ).repartition(3)
    got = ds_to_table(paragraph_dedup(ds, width=5, num_parts=3))
    rows = {
        d: (ct, k, r)
        for d, ct, k, r in zip(
            got.column("doc_id").to_pylist(),
            got.column("clean_text").to_pylist(),
            got.column("n_kept").to_pylist(),
            got.column("n_removed").to_pylist(),
        )
    }
    # brute force: first occurrence by (doc_id, idx) wins
    seen = {}
    for d, t in sorted(DOCS):
        for i, c in enumerate(_chunks(t, 5), 1):
            seen.setdefault(c, (d, i))
    want = {}
    for d, t in DOCS:
        cs = _chunks(t, 5)
        if not cs:
            continue
        kept = [c for i, c in enumerate(cs, 1) if seen[c] == (d, i)]
        want[d] = (" ".join(kept), len(kept), len(cs) - len(kept))
    assert rows == want
    assert 5 not in rows  # empty doc produces no chunks
    assert rows[2] == ("", 0, 2)  # fully-removed doc kept with "" text


def test_paragraph_dedup_random_corpus():
    rng = np.random.default_rng(11)
    vocab = np.array([f"w{i}" for i in range(30)])
    docs = [
        (i, " ".join(rng.choice(vocab, rng.integers(3, 40))))
        for i in range(60)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    ).repartition(4)
    got = ds_to_table(paragraph_dedup(ds, width=3, num_parts=4))
    seen = {}
    for d, t in sorted(docs):
        for i, c in enumerate(_chunks(t, 3), 1):
            seen.setdefault(c, (d, i))
    want = {}
    for d, t in docs:
        cs = _chunks(t, 3)
        kept = [c for i, c in enumerate(cs, 1) if seen[c] == (d, i)]
        want[d] = (" ".join(kept), len(kept), len(cs) - len(kept))
    rows = {
        d: (ct, k, r)
        for d, ct, k, r in zip(
            got.column("doc_id").to_pylist(),
            got.column("clean_text").to_pylist(),
            got.column("n_kept").to_pylist(),
            got.column("n_removed").to_pylist(),
        )
    }
    assert rows == want
    # something was actually removed in this corpus
    assert any(r > 0 for _, _, r in rows.values())
