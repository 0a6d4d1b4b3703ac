"""Concat-and-chop sequence packing vs a brute-force reference."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.functions.packing import pack_chunks
from tests.util import ds_to_table


def _brute(ids, lens, cap, n_streams):
    rows = set()
    for s in range(n_streams):
        docs = sorted(
            (i, l) for i, l in zip(ids, lens) if i % n_streams == s and l > 0
        )
        off = 0
        for i, l in docs:
            for b in range(off // cap, (off + l - 1) // cap + 1):
                rows.add(
                    (
                        i,
                        s,
                        b,
                        max(0, b * cap - off),
                        min(l, (b + 1) * cap - off),
                    )
                )
            off += l
    return rows


def test_pack_chunks():
    rng = np.random.default_rng(41)
    n = 300
    ids = rng.permutation(10_000)[:n].astype(np.int64)
    lens = rng.integers(0, 700, n).astype(np.int64)  # some 0, some > cap
    cap, streams = 256, 4
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "n_tokens": pa.array(lens)})
    ).repartition(5)
    got = ds_to_table(pack_chunks(ds, "doc_id", "n_tokens", cap, streams))
    got_rows = set(
        zip(
            got.column("doc_id").to_pylist(),
            got.column("stream").to_pylist(),
            got.column("chunk_id").to_pylist(),
            got.column("tok_start").to_pylist(),
            got.column("tok_end").to_pylist(),
        )
    )
    want = _brute(ids, lens, cap, streams)
    assert got_rows == want
    assert got.num_rows == len(want)
    # every chunk except each stream's last must be exactly full
    per_chunk = {}
    for i, s, b, ts, te in got_rows:
        per_chunk[(s, b)] = per_chunk.get((s, b), 0) + (te - ts)
    for s in set(k[0] for k in per_chunk):
        bs = sorted(b for ss, b in per_chunk if ss == s)
        for b in bs[:-1]:
            assert per_chunk[(s, b)] == cap, (s, b)


def test_pack_chunks_doc_longer_than_capacity():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "n_tokens": pa.array([1000], pa.int64()),
            }
        )
    )
    got = ds_to_table(pack_chunks(ds, "doc_id", "n_tokens", 256, 1))
    spans = sorted(
        zip(
            got.column("chunk_id").to_pylist(),
            got.column("tok_start").to_pylist(),
            got.column("tok_end").to_pylist(),
        )
    )
    assert spans == [
        (0, 0, 256),
        (1, 256, 512),
        (2, 512, 768),
        (3, 768, 1000),
    ]
