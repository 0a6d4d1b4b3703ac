"""Paragraph-level exact deduplication — the C4/RefinedWeb-style
"remove every repeated paragraph, keep the first occurrence" pass of a
training-data pipeline, here over aligned fixed-width word chunks
(the corpus is single-line, so the paragraph boundary is a
deterministic 5-word grid; swap ``chunker`` granularity for newline
paragraphs on real text).  SQL twin in
``__ray_entry__.oracle_sql()['paragraph_dedup']``.

Ray-Data shape (scale notes):

* Occurrence extraction is map-only and vectorized: Arrow whitespace
  split → flat word buffer → chunk ``ListArray`` re-offsetting →
  ``pc.binary_join`` — no per-row Python.
* ONE ``groupby(para)`` co-locates identical chunks; the keeper is the
  lexicographically smallest (doc_id, idx) — a pure numpy argmin per
  group batch.  Shuffle volume = the corpus once.  (At 100 TB you
  would group on a 128-bit content hash and re-split map-side at
  reassembly so text crosses the wire once, not twice; the string key
  keeps this check-scale path bitwise SQL-replayable.)
* Reassembly is ONE ``groupby(hash(doc))``: per partition a lexsort
  by (doc, idx), kept-chunk ``ListArray`` + ``binary_join`` — again
  no per-doc Python call.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.utils import hash_int64


def _np_parts(n_rows: int) -> int:
    return int(max(2, min(256, math.ceil(max(1, n_rows) / 500_000))))


def chunk_occurrences(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 5,
) -> ray.data.Dataset:
    """One row per aligned ``width``-word chunk: ``(<id>, idx [1-based
    chunk position], para)``.  Words are ``\\S+`` runs; the final
    partial chunk is kept; empty chunks never occur."""
    if width <= 0:
        raise ValueError("width must be positive")

    def split(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        # NOTE: pc.utf8_split_whitespace is avoided deliberately — in
        # pyarrow 16.1.0 under concurrent Ray tasks it intermittently
        # returns corrupted token lists (observed: a leading-space doc
        # splitting to ['a',...,'e',' '] instead of
        # ['','a',...,'e','','']), which silently fabricates chunks.
        # The RE2-based splitter is stable (0/40 repro trials vs
        # ~10/40).
        words = pc.split_pattern_regex(
            batch.column(text_col), pattern=r"\s+"
        )
        # list_value_length / list_flatten respect the array's LOGICAL
        # slice — never touch .values/.offsets directly: on a sliced
        # ListArray the raw child carries extra elements and
        # offset-arithmetic against it silently shifts every chunk
        per_doc = np.asarray(
            pc.list_value_length(words), dtype=np.int64
        )
        flat = pc.list_flatten(words)
        flat = flat.combine_chunks() if isinstance(
            flat, pa.ChunkedArray
        ) else flat
        # drop empty word slots (leading/trailing whitespace artifacts)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        if (lens == 0).any():
            keep = lens > 0
            # rebuild per-doc counts over the kept words
            doc_of = np.repeat(np.arange(len(ids)), per_doc)[keep]
            flat = flat.filter(pa.array(keep))
            counts = np.bincount(doc_of, minlength=len(ids))
        else:
            counts = per_doc
        n_chunks = (counts + width - 1) // width  # ceil
        doc_idx = np.repeat(np.arange(len(ids)), n_chunks)
        # chunk start word offset within the flat kept-word buffer
        doc_word_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
        local = (
            np.arange(n_chunks.sum())
            - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
        )
        starts = doc_word_start[doc_idx] + local * width
        ends = np.minimum(
            starts + width, doc_word_start[doc_idx] + counts[doc_idx]
        )
        chunk_offsets = np.empty(len(starts) + 1, np.int64)
        if len(starts):
            chunk_offsets[:-1] = starts
            chunk_offsets[-1] = ends[-1] if len(ends) else 0
            # ListArray offsets must be monotone and cover gaps: since
            # chunks tile each doc contiguously, starts are monotone
            # and ends[i] == starts[i+1] within a doc and at doc
            # boundaries — so offsets = [starts..., last end] is exact
        else:
            chunk_offsets = np.zeros(1, np.int64)
        lists = pa.ListArray.from_arrays(
            pa.array(chunk_offsets, pa.int32()), flat
        )
        para = pc.binary_join(lists, " ")
        return pa.table(
            {
                id_col: pa.array(ids[doc_idx]),
                "idx": pa.array((local + 1).astype(np.int64)),
                "para": para,
            }
        )

    return ds.map_batches(split, batch_format="pyarrow", zero_copy_batch=True)


def paragraph_dedup(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 5,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Global exact chunk dedup, first occurrence wins.

    Output one row per doc that has ≥1 chunk: ``(<id>, clean_text
    [kept chunks re-joined by one space, in order], n_kept,
    n_removed)``.
    """
    from ray.data.aggregate import Min, Sum

    occ = chunk_occurrences(ds, id_col, text_col, width)
    if num_parts is None:
        num_parts = _np_parts(ds.count() * 4)
    np_parts = np.uint64(num_parts)

    # fuse (doc_id, idx) into one orderable int64 so the keeper per
    # distinct chunk is a single vectorized Min aggregate (Ray Data
    # pre-combines per block) — no per-group Python, no join-back
    IDX_BITS = 20  # up to ~1M chunks per doc

    def fuse(batch: pa.Table) -> pa.Table:
        d = batch.column(id_col).to_numpy(zero_copy_only=False)
        i = batch.column("idx").to_numpy(zero_copy_only=False)
        if (i >= (1 << IDX_BITS)).any():
            raise ValueError("doc exceeds 2^20 chunks")
        return pa.table(
            {
                "para": batch.column("para"),
                "fused": pa.array((d << IDX_BITS) | i),
            }
        )

    winners = (
        occ.map_batches(fuse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("para")
        .aggregate(Min("fused", alias_name="keeper"))
    )

    def unfuse(batch: pa.Table) -> pa.Table:
        kp = batch.column("keeper").to_numpy(zero_copy_only=False)
        d = (kp >> IDX_BITS).astype(np.int64)
        return pa.table(
            {
                "hpart": pa.array(
                    (hash_int64(d) % np_parts).astype(np.int32)
                ),
                id_col: pa.array(d),
                "idx": pa.array((kp & ((1 << IDX_BITS) - 1)).astype(np.int64)),
                "para": batch.column("para"),
                "tot": pa.array(np.zeros(len(kp), np.int64)),
            }
        )

    kept_rows = winners.map_batches(
        unfuse, batch_format="pyarrow", zero_copy_batch=True
    )

    # per-doc total chunk counts ride the same shuffle as marker rows
    # (idx = 0 sorts before every real 1-based chunk idx)
    def totals_rows(batch: pa.Table) -> pa.Table:
        d = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(d),
                "n": pa.array(np.ones(len(d), np.int64)),
            }
        )

    totals = (
        occ.map_batches(
            totals_rows, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(id_col)
        .aggregate(Sum("n", alias_name="tot"))
    )

    def totals_marker(batch: pa.Table) -> pa.Table:
        d = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "hpart": pa.array(
                    (hash_int64(d) % np_parts).astype(np.int32)
                ),
                id_col: pa.array(d),
                "idx": pa.array(np.zeros(len(d), np.int64)),
                "para": pa.array([""] * len(d), pa.string()),
                "tot": pa.array(
                    batch.column("tot")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
            }
        )

    merged = kept_rows.union(
        totals.map_batches(
            totals_marker, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def assemble(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "clean_text": pa.array([], pa.string()),
                "n_kept": pa.array([], pa.int64()),
                "n_removed": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        idx = group.column("idx").to_numpy(zero_copy_only=False)
        tot = group.column("tot").to_numpy(zero_copy_only=False)
        order = np.lexsort((idx, ids))
        ids, idx, tot = ids[order], idx[order], tot[order]
        para = group.column("para").combine_chunks().take(
            pa.array(order.astype(np.int64))
        )
        boundary = np.empty(len(ids), dtype=bool)
        boundary[0] = True
        boundary[1:] = ids[1:] != ids[:-1]
        doc_seg = np.cumsum(boundary) - 1
        n_docs = int(doc_seg[-1]) + 1
        is_kept = idx > 0  # idx 0 rows are the per-doc totals markers
        n_kept = np.bincount(doc_seg[is_kept], minlength=n_docs)
        n_tot = np.bincount(doc_seg, weights=tot, minlength=n_docs).astype(
            np.int64
        )
        kept_para = para.filter(pa.array(is_kept))
        counts = np.bincount(doc_seg[is_kept], minlength=n_docs)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), kept_para
        )
        clean = pc.binary_join(lists, " ")
        return pa.table(
            {
                id_col: pa.array(ids[np.flatnonzero(boundary)]),
                "clean_text": clean,
                "n_kept": pa.array(n_kept.astype(np.int64)),
                "n_removed": pa.array(n_tot - n_kept.astype(np.int64)),
            }
        )

    return merged.groupby("hpart").map_groups(
        assemble, batch_format="pyarrow"
    )
