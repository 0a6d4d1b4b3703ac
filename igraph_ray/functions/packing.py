"""Sequence packing — the concat-and-chunk step of an LLM training
pipeline: documents are concatenated per stream (in deterministic
doc-id order) and split into fixed-capacity context windows, docs
spanning a boundary split across chunks (the standard GPT-style
packing; reference scope: training-data prep, with the SQL twin in
``__ray_entry__.oracle_sql()['packed_chunks']``).

Ray-Data shape (scale notes):

* ONE hash shuffle on the stream id (``groupby(stream).map_groups``);
  a stream's docs must co-locate because chunk offsets are a running
  sum over the stream.  Streams are ``doc_id % n_streams`` so the
  layout is deterministic across runs, resumes and cluster sizes —
  at 100 TB you run thousands of streams, each the size of one
  worker's group budget, and each stream's output is an independent
  resumable shard.
* Inside a group everything is numpy: exclusive cumsum for start
  offsets, floor-division for the chunk span, ``repeat``/``arange``
  expansion for boundary-crossing docs — no per-row Python, no
  sequential bin-packing loop (the chop rule is prefix-sum algebra).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data


def _np_parts(n_rows: int) -> int:
    return int(max(2, min(256, math.ceil(max(1, n_rows) / 500_000))))


def pack_chunks(
    ds: ray.data.Dataset,
    id_col: str,
    len_col: str,
    capacity: int,
    n_streams: int = 8,
) -> ray.data.Dataset:
    """Chunk layout of concat-and-chop packing.

    Docs are assigned to stream ``id % n_streams``, concatenated in
    ascending id order, and chopped every ``capacity`` tokens.  Output
    one row per (doc, chunk) intersection: ``(<id>, stream, chunk_id
    [per-stream chunk index], tok_start, tok_end)`` — the half-open
    doc-local token range landing in that chunk.  Zero-length docs
    are dropped (they occupy no tokens).
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if n_streams <= 0:
        raise ValueError("n_streams must be positive")

    def tag(batch: pa.Table) -> pa.Table:
        i = batch.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ln = batch.column(len_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "stream": pa.array(i % np.int64(n_streams)),
                "i": pa.array(i),
                "ln": pa.array(ln),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    cap = np.int64(capacity)

    def merge(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "stream": pa.array([], pa.int64()),
                "chunk_id": pa.array([], pa.int64()),
                "tok_start": pa.array([], pa.int64()),
                "tok_end": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        i = group.column("i").to_numpy(zero_copy_only=False)
        ln = group.column("ln").to_numpy(zero_copy_only=False)
        stream = group.column("stream").to_numpy(zero_copy_only=False)
        order = np.argsort(i, kind="stable")
        i, ln, stream = i[order], ln[order], stream[order]
        pos = ln > 0
        i, ln, stream = i[pos], ln[pos], stream[pos]
        n = len(i)
        if n == 0:
            return empty
        start = np.concatenate([[0], np.cumsum(ln)[:-1]])  # exclusive
        first_b = start // cap
        last_b = (start + ln - 1) // cap
        nb = (last_b - first_b + 1).astype(np.int64)
        doc_idx = np.repeat(np.arange(n), nb)
        b = (
            np.repeat(first_b, nb)
            + np.arange(nb.sum())
            - np.repeat(np.cumsum(nb) - nb, nb)
        )
        s_d, l_d = start[doc_idx], ln[doc_idx]
        tok_start = np.maximum(0, b * cap - s_d)
        tok_end = np.minimum(l_d, (b + 1) * cap - s_d)
        return pa.table(
            {
                id_col: pa.array(i[doc_idx]),
                "stream": pa.array(stream[doc_idx]),
                "chunk_id": pa.array(b.astype(np.int64)),
                "tok_start": pa.array(tok_start.astype(np.int64)),
                "tok_end": pa.array(tok_end.astype(np.int64)),
            }
        )

    return tagged.groupby("stream").map_groups(merge, batch_format="pyarrow")
