"""All-pairs sparse cosine similarity over tf-idf vectors (text APSS).

The classic all-pairs similarity search shape (Bayardo, Ma & Srikant
2007, "Scaling up all pairs similarity search", WWW'07): build the
inverted index, generate candidate pairs only inside posting lists,
and accumulate partial dot products — never a doc × doc product.
Instead of WWW'07's sequential prefix filter (which needs a global
weight order), the distributed variant bounds work with a document-
frequency cap: terms with ``df > df_cap`` are excluded from the
VOCABULARY (the standard stop-word pruning — they carry near-zero idf
anyway), and the result is EXACT cosine over that documented
vocabulary.  Max posting list = ``df_cap`` rows, so per-group work is
O(df_cap²) regardless of corpus size.

Pipeline (all Ray Data, rows-based partition key-spaces):

1. postings ``(did, term, tf)`` — per-batch Arrow group_by (a doc
   lives in exactly one batch, so per-batch tf is global tf);
2. ``(term, df)`` — map-side partials + ONE vocabulary shuffle;
   ``df <= df_cap`` filter defines the vocabulary;
3. idf attach — hash join on term (smooth idf
   ``ln((1+N)/(1+df)) + 1``, sklearn's convention);
4. L2 norms — ONE doc-keyed shuffle of raw ``(did, w²)`` rows, then a
   lexsorted segment sum per hash partition (canonical addend order —
   a float Sum aggregate or per-batch partials would make the
   reduction grouping depend on block layout and bit-drift between
   runs), joined back on did;
5. candidate pairs — ONE term-keyed hash shuffle, then each partition
   expands all its posting lists in a single vectorized pass
   (triu-gather per distinct list size; only terms with df ≥ 2),
   emitting ``(a < b, w_a·w_b)``;
6. cosine — ONE hash shuffle of the candidate pairs into a rows-based
   key-space, then a vectorized lexsorted segment sum per partition
   (same determinism argument) and the threshold filter.

Every shuffle key-space is rows-based (``_join_parts``), never a
CPU-count or fixed constant, so per-group size stays bounded at any
corpus scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from igraph_ray.functions.text import _tokens_table
from igraph_ray.utils import drop_empty_blocks


def _join_parts(*counts: int) -> int:
    return int(max(2, min(65536, sum(counts) // 250_000 + 2)))


def tfidf_cosine_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.3,
    df_cap: int = 500,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Rows ``(doc_a, doc_b, cosine)`` with ``doc_a < doc_b`` and
    ``cosine >= threshold`` — exact cosine over L2-normalized smooth
    tf-idf vectors restricted to the ``df <= df_cap`` vocabulary."""
    n_docs = ds.count()

    def postings_part(batch: pa.Table) -> pa.Table:
        t = _tokens_table(batch, text_col, id_col)
        g = t.group_by(["did", "term"]).aggregate([("term", "count")])
        return pa.table(
            {
                "did": g.column("did"),
                "term": g.column("term"),
                "tf": pc.cast(g.column("term_count"), pa.int64()),
            }
        )

    postings = ds.map_batches(
        postings_part, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def df_part(batch: pa.Table) -> pa.Table:
        g = batch.group_by("term").aggregate([("did", "count")])
        return pa.table(
            {
                "term": g.column("term"),
                "df": pc.cast(g.column("did_count"), pa.int64()),
            }
        )

    _out_empty = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    )

    # groupby rides on the sort machinery, which emits zero-COLUMN
    # blocks for empty partitions; those crash pyarrow's hash join, so
    # strip them (metadata-only) before every join input below.
    vocab = drop_empty_blocks(
        postings.map_batches(
            df_part, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .filter(expr=f"df <= {int(df_cap)}")
        .materialize()
    )
    if vocab is None:
        return _out_empty

    parts = _join_parts(postings.count(), vocab.count())
    weighted = postings.join(vocab, "inner", parts, on=("term",))

    def weigh(batch: pa.Table) -> pa.Table:
        tf = batch.column("tf").to_numpy(zero_copy_only=False)
        df = batch.column("df").to_numpy(zero_copy_only=False)
        w = tf * (np.log((1.0 + n_docs) / (1.0 + df)) + 1.0)
        return pa.table(
            {
                "did": batch.column("did"),
                "term": batch.column("term"),
                "df": batch.column("df"),
                "w": pa.array(w),
            }
        )

    weighted = weighted.map_batches(
        weigh, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # L2 norms: shuffle RAW (did, w²) rows — no per-batch partials —
    # then a lexsorted segment sum per hash partition.  A float Sum
    # aggregate (or per-batch pre-aggregation) would make the addend
    # grouping depend on block/batch layout and bit-drift between
    # runs; sorting the multiset (did, wsq) pins a canonical order.
    norm_parts = _join_parts(weighted.count())

    def add_npart(batch: pa.Table) -> pa.Table:
        from igraph_ray.utils import hash_int64

        did = batch.column("did").to_numpy(zero_copy_only=False)
        w = batch.column("w").to_numpy(zero_copy_only=False)
        hp = (hash_int64(did) % np.uint64(norm_parts)).astype(np.int32)
        return pa.table(
            {
                "did": batch.column("did"),
                "wsq": pa.array(w * w),
                "npart": pa.array(hp),
            }
        )

    def norm_reduce(group: pa.Table) -> pa.Table:
        did = group.column("did").to_numpy(zero_copy_only=False)
        wsq = group.column("wsq").to_numpy(zero_copy_only=False)
        if len(did) == 0:
            return pa.table(
                {
                    "did": pa.array([], pa.int64()),
                    "nsq": pa.array([], pa.float64()),
                }
            )
        order = np.lexsort((wsq, did))
        did, wsq = did[order], wsq[order]
        boundary = np.empty(len(did), dtype=bool)
        boundary[0] = True
        boundary[1:] = did[1:] != did[:-1]
        seg = np.flatnonzero(boundary)
        return pa.table(
            {
                "did": pa.array(did[seg]),
                "nsq": pa.array(np.add.reduceat(wsq, seg)),
            }
        )

    norms = drop_empty_blocks(
        weighted.map_batches(
            add_npart, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("npart")
        .map_groups(norm_reduce, batch_format="pyarrow")
        .materialize()
    )
    if norms is None:
        return _out_empty

    normalized = weighted.join(
        norms, "inner", _join_parts(weighted.count(), norms.count()),
        on=("did",),
    )

    def scale(batch: pa.Table) -> pa.Table:
        w = batch.column("w").to_numpy(zero_copy_only=False)
        nsq = batch.column("nsq").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "did": batch.column("did"),
                "term": batch.column("term"),
                "df": batch.column("df"),
                "wn": pa.array(w / np.sqrt(nsq)),
            }
        )

    normalized = normalized.map_batches(
        scale, batch_format="pyarrow", zero_copy_batch=True
    )

    # Candidate pairs: ONE hash-partition shuffle on the term (all
    # postings of a term co-locate), then each partition expands ALL
    # its posting lists in one vectorized pass (triu-gather per
    # distinct list size) — a per-term map_groups would pay one Python
    # call per vocabulary term.  Same shape as ngram_jaccard
    # (functions/dedup.py posting_part).
    filtered = normalized.filter(expr="df >= 2").materialize()
    term_parts = _join_parts(filtered.count())

    def add_tpart(batch: pa.Table) -> pa.Table:
        import pandas as pd

        t_ = batch.column("term").to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(t_, categorize=False)
        return batch.append_column(
            "tpart",
            pa.array((h % np.uint64(term_parts)).astype(np.int32)),
        )

    _pair_empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "p": pa.array([], pa.float64()),
        }
    )

    def pair_part(group: pa.Table) -> pa.Table:
        ids = group.column("did").to_numpy(zero_copy_only=False)
        wn = group.column("wn").to_numpy(zero_copy_only=False)
        if len(ids) < 2:
            return _pair_empty
        codes = (
            pc.dictionary_encode(group.column("term").combine_chunks())
            .indices.to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((ids, codes))
        ids, wn, codes = ids[order], wn[order], codes[order]
        boundary = np.empty(len(codes), dtype=bool)
        boundary[0] = True
        boundary[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(boundary)
        sizes = np.diff(np.append(starts, len(codes)))
        a_parts, b_parts, p_parts = [], [], []
        for k in np.unique(sizes[sizes >= 2]):
            gs = starts[sizes == k]
            iu, ju = np.triu_indices(int(k), 1)
            ii = gs[:, None] + iu[None, :]
            jj = gs[:, None] + ju[None, :]
            a_parts.append(ids[ii].ravel())
            b_parts.append(ids[jj].ravel())
            p_parts.append((wn[ii] * wn[jj]).ravel())
        if not a_parts:
            return _pair_empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(a_parts)),
                "b": pa.array(np.concatenate(b_parts)),
                "p": pa.array(np.concatenate(p_parts)),
            }
        )

    pairs = drop_empty_blocks(
        filtered.map_batches(
            add_tpart, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("tpart")
        .map_groups(pair_part, batch_format="pyarrow")
        .materialize()
    )
    if pairs is None:
        return _out_empty

    # rows-based partition key-space for the pair reduction: one group
    # ≈ one block at any scale (a fixed constant would make per-group
    # size O(pairs/const)); the reduce is vectorized across ALL pairs
    # of a partition, not one Python call per pair
    num_parts = _join_parts(pairs.count())

    def add_hpart(batch: pa.Table) -> pa.Table:
        from igraph_ray.utils import hash_int64

        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            hp = (
                (
                    hash_int64(a) * np.uint64(0x9E3779B97F4A7C15)
                    + hash_int64(b)
                )
                % np.uint64(num_parts)
            ).astype(np.int32)
        return batch.append_column("hpart", pa.array(hp))

    def reduce_pair(group: pa.Table) -> pa.Table:
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        p = group.column("p").to_numpy(zero_copy_only=False)
        # deterministic float reduction (sorted addends per pair)
        order = np.lexsort((p, b, a))
        a, b, p = a[order], b[order], p[order]
        boundary = np.empty(len(a), dtype=bool)
        if len(a):
            boundary[0] = True
            boundary[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        seg = np.flatnonzero(boundary)
        cos = np.add.reduceat(p, seg) if len(seg) else np.empty(0)
        keep = cos >= threshold
        return pa.table(
            {
                "doc_a": pa.array(a[seg][keep]),
                "doc_b": pa.array(b[seg][keep]),
                "cosine": pa.array(cos[keep]),
            }
        )

    return (
        pairs.map_batches(
            add_hpart, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("hpart")
        .map_groups(reduce_pair, batch_format="pyarrow")
    )
