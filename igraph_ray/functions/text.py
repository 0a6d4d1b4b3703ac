"""Text-analysis stages for large-scale training-data pipelines.

All per-row hot paths are vectorized ``pyarrow.compute`` regex/string
kernels; the only Python-level loop is the winnowing fingerprint
(numpy inner loop per row, C-speed rolling hash).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

# A tiny deterministic marker-word table for the n-gram/stopword
# language heuristic (top function words per language).
_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " in ", " is ", " that "],
    "de": [" der ", " die ", " und ", " das ", " ist ", " nicht ", " ein "],
    "fr": [" le ", " la ", " les ", " et ", " est ", " une ", " que "],
    "es": [" el ", " la ", " los ", " que ", " es ", " una ", " para "],
    "it": [" il ", " la ", " che ", " di ", " è ", " una ", " per "],
}

_STOPWORDS = [
    " the ", " and ", " of ", " to ", " in ", " a ", " is ", " it ",
    " for ", " on ", " with ", " as ", " was ", " at ", " by ",
]

# BPE-ish tokenizer: words, numbers, or single non-space symbols —
# the standard pre-tokenization regex shape used by byte-pair encoders.
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_WS_RE = r"\S+"


def token_count(
    ds: ray.data.Dataset, text_col: str = "text", mode: str = "whitespace"
) -> ray.data.Dataset:
    """Append ``n_tokens`` = whitespace- or BPE-regex token count."""
    pattern = _WS_RE if mode == "whitespace" else _BPE_RE

    def _f(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column(text_col), pattern)
        return batch.append_column("n_tokens", pc.cast(n, pa.int64()))

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def quality_score(
    ds: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """Append heuristic quality features + a composite ``quality``:

    - ``n_chars``, ``n_tokens`` (whitespace)
    - ``punct_ratio``   punctuation chars / chars
    - ``digit_ratio``   digit chars / chars
    - ``upper_ratio``   uppercase chars / chars
    - ``stopword_ratio`` stopword hits / tokens (fluency proxy)
    - ``mean_token_len`` chars / tokens
    - ``quality``       ∈ [0,1], down-weighting punct/digit/upper
      extremes, up-weighting stopword presence and sane token lengths
    """

    def _f(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        lower = pc.utf8_lower(text)
        n_chars = pc.cast(pc.utf8_length(text), pa.float64())
        n_tokens = pc.cast(
            pc.count_substring_regex(text, _WS_RE), pa.float64()
        )
        punct = pc.cast(
            pc.count_substring_regex(text, r"[^\w\s]"), pa.float64()
        )
        digit = pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.float64())
        upper = pc.cast(pc.count_substring_regex(text, r"[A-Z]"), pa.float64())
        stop = pc.cast(
            pc.count_substring_regex(
                lower, "|".join(s.strip() for s in _STOPWORDS)
            ),
            pa.float64(),
        )
        nc = np.maximum(n_chars.to_numpy(zero_copy_only=False), 1.0)
        nt = np.maximum(n_tokens.to_numpy(zero_copy_only=False), 1.0)
        pr = punct.to_numpy(zero_copy_only=False) / nc
        dr = digit.to_numpy(zero_copy_only=False) / nc
        ur = upper.to_numpy(zero_copy_only=False) / nc
        sr = stop.to_numpy(zero_copy_only=False) / nt
        mtl = nc / nt
        quality = (
            np.clip(1.0 - 2.0 * pr, 0, 1)
            * np.clip(1.0 - 2.0 * dr, 0, 1)
            * np.clip(1.0 - ur, 0, 1)
            * np.clip(0.25 + sr, 0, 1)
            * np.clip(mtl / 4.0, 0.25, 1.0)
        )
        out = batch
        for name, arr in [
            ("n_chars_q", nc.astype(np.int64)),
            ("n_tokens", nt.astype(np.int64)),
            ("punct_ratio", pr),
            ("digit_ratio", dr),
            ("upper_ratio", ur),
            ("stopword_ratio", sr),
            ("mean_token_len", mtl),
            ("quality", quality),
        ]:
            out = out.append_column(name, pa.array(arr))
        return out

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def language_id(
    ds: ray.data.Dataset, text_col: str = "text", out: str = "lang_pred"
) -> ray.data.Dataset:
    """Append a marker-word language guess (``und`` when no marker
    matches).  One vectorized regex count per language per batch."""
    langs = sorted(_LANG_MARKERS)
    patterns = {
        lang: "|".join(m.strip() for m in _LANG_MARKERS[lang])
        for lang in langs
    }

    def _f(batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch.column(text_col))
        scores = np.stack(
            [
                pc.count_substring_regex(lower, patterns[lang])
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
                for lang in langs
            ]
        )
        best = np.argmax(scores, axis=0)
        hit = scores.max(axis=0) > 0
        pred = np.where(hit, np.array(langs, dtype=object)[best], "und")
        return batch.append_column(out, pa.array(pred, pa.string()))

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def _winnow_row(data: bytes, k: int, window: int) -> np.ndarray:
    """Winnowing fingerprint (Schleimer et al. 2003): rolling polynomial
    hash of k-grams, keep the minimum hash per window, dedup."""
    n = len(data)
    if n < k:
        return np.array([zlib.crc32(data)], dtype=np.uint64)
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    base = np.uint64(257)
    # rolling hash via cumulative polynomial (mod 2^64 wraparound)
    with np.errstate(over="ignore"):
        pows = np.empty(k, dtype=np.uint64)
        pows[0] = 1
        for i in range(1, k):
            pows[i] = pows[i - 1] * base
        # hash of each k-gram: sum b[i+j] * base^(k-1-j)
        h = np.zeros(n - k + 1, dtype=np.uint64)
        for j in range(k):
            h += b[j : n - k + 1 + j] * pows[k - 1 - j]
    if len(h) <= window:
        return np.unique(h.min(keepdims=True))
    # sliding-window min via stride trick
    sw = np.lib.stride_tricks.sliding_window_view(h, window)
    return np.unique(sw.min(axis=1))


def winnow_fingerprints(
    ds: ray.data.Dataset,
    text_col: str = "text",
    k: int = 8,
    window: int = 16,
    out: str = "fingerprints",
) -> ray.data.Dataset:
    """Append ``out`` = list<uint64> winnowed k-gram fingerprints."""

    def _f(batch: pa.Table) -> pa.Table:
        fps = [
            _winnow_row(t.encode("utf-8", "surrogatepass"), k, window).tolist()
            if t is not None
            else []
            for t in batch.column(text_col).to_pylist()
        ]
        return batch.append_column(out, pa.array(fps, pa.list_(pa.uint64())))

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# corpus term statistics (document frequency, per-doc top terms)
# ---------------------------------------------------------------------------
def _tokens_table(
    batch: pa.Table, text_col: str, id_col: str
) -> pa.Table:
    """(did, term) rows — lowercase whitespace tokens, flattened via
    Arrow list offsets (no per-row Python)."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(batch.column(text_col)), r"\s+"
    ).combine_chunks()
    flat = toks.flatten()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    did = np.repeat(
        batch.column(id_col).to_numpy(zero_copy_only=False),
        lens.astype(np.int64),
    )
    t = pa.table({"did": pa.array(did), "term": flat})
    return t.filter(pc.not_equal(t.column("term"), ""))


def term_document_frequency(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(term, df) — number of documents containing each lowercase
    whitespace token.  Per-batch pre-combine: distinct (doc, term)
    pairs then a per-term partial count (both Arrow-native group_bys),
    so the only shuffle is the final vocabulary-sized groupby — at
    corpus scale the shuffled rows are O(batches x vocab), not
    O(total tokens)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = _tokens_table(batch, text_col, id_col)
        distinct = t.group_by(["did", "term"]).aggregate([])
        part = distinct.group_by("term").aggregate([("did", "count")])
        return pa.table(
            {
                "term": part.column("term"),
                "df": pc.cast(part.column("did_count"), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )


def doc_top_terms(
    ds: ray.data.Dataset,
    n_docs: int,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(doc_id, term, tf, rank, tfidf) — each document's top-``k``
    terms by (tf desc, term asc), scored with the linear-idf variant
    ``tfidf = tf * n_docs / df`` (one IEEE division of exact ints, so
    a SQL twin replays it bitwise).

    Map-side: tf and the per-doc top-k are computed entirely within the
    document's own batch (one row = one doc).  The only shuffle is the
    (term, df) vocabulary aggregate, re-attached by a second pass over
    the candidate rows co-grouped by term — candidates are O(docs x k),
    never the full token stream.
    """
    df_ds = term_document_frequency(ds, text_col=text_col, id_col=id_col)

    def topk(batch: pa.Table) -> pa.Table:
        t = _tokens_table(batch, text_col, id_col)
        tf = t.group_by(["did", "term"]).aggregate([("term", "count")])
        did = tf.column("did").to_numpy(zero_copy_only=False)
        cnt = pc.cast(tf.column("term_count"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        term = tf.column("term").to_pandas().to_numpy()  # object strs
        # per-doc rank by (tf desc, term asc): stable sort by term,
        # then by -tf, then by did; rank = position within did segment
        order = np.lexsort((term, -cnt, did))
        did, cnt, term = did[order], cnt[order], term[order]
        boundary = np.empty(len(did), dtype=bool)
        if len(did):
            boundary[0] = True
            boundary[1:] = did[1:] != did[:-1]
        seg_start = np.maximum.accumulate(
            np.where(boundary, np.arange(len(did)), 0)
        )
        rank = np.arange(len(did)) - seg_start + 1
        keep = rank <= k
        return pa.table(
            {
                "doc_id": pa.array(did[keep]),
                "term": pa.array(term[keep], pa.string()),
                "tf": pa.array(cnt[keep]),
                "rank": pa.array(rank[keep].astype(np.int64)),
            }
        )

    cands = ds.map_batches(
        topk, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    df_ds = df_ds.materialize()

    # rows-based partition key-space (one group ≈ one block at any
    # scale) — a fixed constant would make per-group size O(rows/16)
    num_parts = int(
        max(2, min(65536, (cands.count() + df_ds.count()) // 250_000 + 2))
    )

    def _term_part(col: pa.ChunkedArray | pa.Array) -> pa.Array:
        terms = col.to_pandas().to_numpy()
        h = pd.util.hash_array(terms) % np.uint64(num_parts)
        return pa.array(h.astype(np.int32))

    def tag_cand(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hpart": _term_part(batch.column("term")),
                "term": batch.column("term"),
                "doc_id": batch.column("doc_id"),
                "tf": batch.column("tf"),
                "rank": batch.column("rank"),
                "df": pa.array(np.zeros(batch.num_rows, np.int64)),
                "is_df": pa.array(np.zeros(batch.num_rows, np.int8), pa.int8()),
            }
        )

    def tag_df(batch: pa.Table) -> pa.Table:
        z = np.zeros(batch.num_rows, np.int64)
        return pa.table(
            {
                "hpart": _term_part(batch.column("term")),
                "term": batch.column("term"),
                "doc_id": pa.array(z),
                "tf": pa.array(z),
                "rank": pa.array(z),
                "df": batch.column("df"),
                "is_df": pa.array(np.ones(batch.num_rows, np.int8), pa.int8()),
            }
        )

    tagged = cands.map_batches(
        tag_cand, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        df_ds.map_batches(
            tag_df, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def attach(group: pa.Table) -> pa.Table:
        is_df = group.column("is_df").to_numpy(zero_copy_only=False)
        term = group.column("term").to_pandas().to_numpy()
        dfv = group.column("df").to_numpy(zero_copy_only=False)
        # df rows: term -> df (every candidate term has a df row)
        dmask = is_df == 1
        dterm = term[dmask]
        dorder = np.argsort(dterm, kind="stable")
        dterm, dval = dterm[dorder], dfv[dmask][dorder]
        cmask = ~dmask
        if not cmask.any():
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "tfidf": pa.array([], pa.float64()),
                }
            )
        cterm = term[cmask]
        pos = np.searchsorted(dterm, cterm)
        tf = group.column("tf").to_numpy(zero_copy_only=False)[cmask]
        score = (tf * np.int64(n_docs)) / dval[pos]
        return pa.table(
            {
                "doc_id": pa.array(
                    group.column("doc_id").to_numpy(zero_copy_only=False)[
                        cmask
                    ]
                ),
                "term": pa.array(cterm, pa.string()),
                "tf": pa.array(tf),
                "rank": pa.array(
                    group.column("rank").to_numpy(zero_copy_only=False)[cmask]
                ),
                "tfidf": pa.array(score.astype(np.float64)),
            }
        )

    return tagged.groupby("hpart").map_groups(attach, batch_format="pyarrow")


# PII redaction: RE2-safe patterns (no lookaround) shared verbatim by
# the DuckDB oracle twin, applied in this exact staged order (each
# count is taken on the text as redacted by the previous stages, so
# e.g. the digits of an already-masked email can't double-count).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[ \-]\d{3}[ \-]\d{3,4}", "<PHONE>"),
)


def redact_pii(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(id, redacted, email_n, ipv4_n, phone_n) — mask emails, IPv4
    addresses and international phone numbers with typed placeholders
    and count the matches per class.  One vectorized Arrow RE2 pass
    per class (count + global replace), no per-row Python; the staged
    order is part of the contract (see ``PII_PATTERNS``)."""

    def _f(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col).cast(pa.string())
        counts: dict[str, pa.Array] = {}
        for name, pat, repl in PII_PATTERNS:
            counts[f"{name}_n"] = pc.cast(
                pc.count_substring_regex(col, pat), pa.int64()
            )
            col = pc.replace_substring_regex(col, pat, repl)
        return pa.table(
            {id_col: batch.column(id_col), "redacted": col, **counts}
        )

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def bigram_counts(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(bigram, n) — corpus frequency of adjacent lowercase
    whitespace-token pairs (``"t1 t2"``), never crossing a document
    boundary.  Pair construction is an Arrow ``binary_join_element_wise``
    over the flattened token stream with a numpy same-doc mask; counts
    are pre-combined per batch so the only shuffle is the
    vocabulary-sized final groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        t = _tokens_table(batch, text_col, id_col)
        term = t.column("term").combine_chunks()
        did = t.column("did").to_numpy(zero_copy_only=False)
        n = len(did)
        if n < 2:
            return pa.table(
                {
                    "bigram": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        pairs = pc.binary_join_element_wise(
            term.slice(0, n - 1), term.slice(1, n - 1), " "
        )
        same_doc = did[:-1] == did[1:]
        kept = pa.table({"bigram": pairs}).filter(pa.array(same_doc))
        part = kept.group_by("bigram").aggregate([("bigram", "count")])
        return pa.table(
            {
                "bigram": part.column("bigram"),
                "n": pc.cast(part.column("bigram_count"), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
    )


def frequent_terms(
    ds: ray.data.Dataset,
    top_n: int = 100,
    summary_size: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(term, n) — the ``top_n`` most frequent lowercase whitespace
    tokens by TOTAL occurrence count (ties toward the smaller term),
    EXACTLY, without ever shuffling the full vocabulary.

    Two passes:

    1. per-batch Misra–Gries summary of size ``summary_size`` (the
       batch's top tokens by count — a superset of every token whose
       in-batch frequency exceeds tokens/summary_size; the union of
       batch summaries therefore contains every token with global
       count > total_tokens/summary_size, which covers the true top-N
       whenever N ≪ summary_size relative to skew).  Summaries are
       tiny: O(batches × summary_size) rows reach the driver.
    2. exact recount of ONLY the candidate set (broadcast filter +
       pre-combined groupby) — so the returned counts are exact, and
       the result is provably the true top-N whenever the N-th count
       exceeds total_tokens/summary_size (asserted at runtime from the
       exact counts; raises if the guarantee cannot be certified).
    """

    def summary(batch: pa.Table) -> pa.Table:
        t = _tokens_table(batch, text_col, id_col)
        part = t.group_by("term").aggregate([("term", "count")])
        cnt = pc.cast(part.column("term_count"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        if len(cnt) > summary_size:
            keep = np.argsort(-cnt, kind="stable")[:summary_size]
            terms = part.column("term").take(
                pa.array(keep.astype(np.int64))
            )
        else:
            terms = part.column("term")
        return pa.table({"term": terms})

    sums = pa.concat_tables(
        ds.map_batches(
            summary, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    cand = pc.unique(sums.column("term"))
    # total token count: each batch's summary repeats its batch total;
    # sum one row per batch via max-per-batch is awkward — recount
    # exactly in pass 2 instead.
    cand_ref = ray.put(cand)

    def recount(batch: pa.Table) -> pa.Table:
        t = _tokens_table(batch, text_col, id_col)
        total = pa.table(
            {
                "term": pa.array(["\x00total"], pa.string()),
                "n": pa.array([t.num_rows], pa.int64()),
            }
        )
        hits = t.filter(
            pc.is_in(t.column("term"), value_set=ray.get(cand_ref))
        )
        part = hits.group_by("term").aggregate([("term", "count")])
        return pa.concat_tables(
            [
                pa.table(
                    {
                        "term": part.column("term"),
                        "n": pc.cast(part.column("term_count"), pa.int64()),
                    }
                ),
                total,
            ]
        )

    counts = (
        ds.map_batches(recount, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    tbl = pa.concat_tables(
        counts.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    terms = tbl.column("term").to_pylist()
    ns = tbl.column("n").to_pylist()
    total_tokens = 0
    pairs = []
    for t, n in zip(terms, ns):
        if t == "\x00total":
            total_tokens = n
        else:
            pairs.append((t, n))
    pairs.sort(key=lambda kv: (-kv[1], kv[0]))
    top = pairs[:top_n]
    if len(pairs) > top_n and top:
        nth = top[-1][1]
        if nth <= total_tokens / summary_size:
            raise ValueError(
                "frequent_terms: top-N completeness not certifiable "
                f"(n-th count {nth} <= {total_tokens}/{summary_size}); "
                "increase summary_size"
            )
    return ray.data.from_arrow(
        pa.table(
            {
                "term": pa.array([t for t, _ in top], pa.string()),
                "n": pa.array([n for _, n in top], pa.int64()),
            }
        )
    )


def repetition_stats(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(doc_id, n_tokens, n_distinct, max_bigram, dup_frac,
    top_bigram_frac) — Gopher-style repetition quality signals per
    document:

    * ``dup_frac`` = (n_tokens - n_distinct) / n_tokens — the fraction
      of tokens that are repeats of an earlier token;
    * ``top_bigram_frac`` = 2·max_bigram / n_tokens — the fraction of
      tokens covered by the single most frequent adjacent pair
      (Rae et al. 2021's "top 2-gram" rule, token-count flavour).

    Entirely map-side (a document never leaves its batch, zero
    shuffle); counts are exact ints and each fraction is one IEEE
    division, so a SQL twin replays the values bitwise.  Zero-token
    docs emit 0.0 fractions.
    """

    def per_doc(batch: pa.Table) -> pa.Table:
        t = _tokens_table(batch, text_col, id_col)
        term = t.column("term").combine_chunks()
        did = t.column("did").to_numpy(zero_copy_only=False)
        doc_ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n_docs = len(doc_ids)
        id_order = np.argsort(doc_ids)
        ids_sorted = doc_ids[id_order]

        def pos_of(x: np.ndarray) -> np.ndarray:
            return id_order[np.searchsorted(ids_sorted, x)]

        n_tok = np.zeros(n_docs, np.int64)
        if len(did):
            u, c = np.unique(did, return_counts=True)
            n_tok[pos_of(u)] = c
        # distinct tokens per doc
        nd = np.zeros(n_docs, np.int64)
        if t.num_rows:
            dd = t.group_by(["did", "term"]).aggregate([])
            u, c = np.unique(
                dd.column("did").to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            nd[pos_of(u)] = c
        # max adjacent-bigram count per doc
        mb = np.zeros(n_docs, np.int64)
        n = len(did)
        if n >= 2:
            same = did[:-1] == did[1:]
            pairs = pc.binary_join_element_wise(
                term.slice(0, n - 1), term.slice(1, n - 1), " "
            )
            bt = pa.table(
                {"did": pa.array(did[:-1]), "bg": pairs}
            ).filter(pa.array(same))
            if bt.num_rows:
                cnt = bt.group_by(["did", "bg"]).aggregate([("bg", "count")])
                cd = cnt.column("did").to_numpy(zero_copy_only=False)
                cc = pc.cast(cnt.column("bg_count"), pa.int64()).to_numpy(
                    zero_copy_only=False
                )
                np.maximum.at(mb, pos_of(cd), cc)
        ntf = n_tok.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            dup = np.where(
                n_tok > 0, (n_tok - nd) / ntf, 0.0
            )
            top_bg = np.where(n_tok > 0, (2 * mb) / ntf, 0.0)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(n_tok),
                "n_distinct": pa.array(nd),
                "max_bigram": pa.array(mb),
                "dup_frac": pa.array(dup),
                "top_bigram_frac": pa.array(top_bg),
            }
        )

    return ds.map_batches(
        per_doc, batch_format="pyarrow", zero_copy_batch=True
    )


def bm25_scores(
    ds: ray.data.Dataset,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> ray.data.Dataset:
    """(doc_id, term, tf, dl, score) — BM25 relevance of every document
    against each query term, with the ln-free odds idf
    ``(N - df + 0.5) / (df + 0.5)`` (rank-equivalent monotone transform
    of the Robertson idf; chosen — like ``doc_top_terms``'s linear
    idf — so the score is a fixed chain of IEEE ops over exact integer
    statistics that a SQL twin replays bitwise; libm ``ln`` is the only
    thing the classic formula adds and it is not bit-stable across
    engines).

    ``tf`` counts lowercase whitespace tokens equal to the term (the
    same tokenization as ``term_document_frequency``); ``dl`` is the
    document's whitespace token count; N, df and Σdl are exact-integer
    corpus aggregates (two tiny scalar shuffles), broadcast into one
    final vectorized pass over the per-doc candidate rows."""
    qset = sorted(set(query_terms))
    qarr = pa.array(qset, pa.string())

    def cand(batch: pa.Table) -> pa.Table:
        toks = _tokens_table(batch, text_col, id_col)
        hits = toks.filter(pc.is_in(toks.column("term"), value_set=qarr))
        tf = hits.group_by(["did", "term"]).aggregate([("term", "count")])
        dl_n = pc.cast(
            pc.count_substring_regex(batch.column(text_col), _WS_RE),
            pa.int64(),
        )
        dl_tbl = pa.table({"did": batch.column(id_col), "dl": dl_n})
        did = tf.column("did").to_numpy(zero_copy_only=False)
        dvid = dl_tbl.column("did").to_numpy(zero_copy_only=False)
        order = np.argsort(dvid)
        pos = order[
            np.searchsorted(dvid[order], did)
        ]  # doc ids unique per batch (one row per doc)
        return pa.table(
            {
                "doc_id": tf.column("did"),
                "term": tf.column("term"),
                "tf": pc.cast(tf.column("term_count"), pa.int64()),
                "dl": pc.take(dl_tbl.column("dl"), pa.array(pos)),
            }
        )

    cands = ds.map_batches(
        cand, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # exact-int corpus stats in ONE pass: per-batch (n_docs, Σdl)
    # partial row, then a scalar tree-sum
    def dl_partial(batch: pa.Table) -> pa.Table:
        dl = pc.cast(
            pc.count_substring_regex(batch.column(text_col), _WS_RE),
            pa.int64(),
        )
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "s": pa.array([pc.sum(dl).as_py() or 0], pa.int64()),
            }
        )

    stats = ds.map_batches(
        dl_partial, batch_format="pyarrow", zero_copy_batch=True
    ).sum(["n", "s"])
    n_docs = int(stats["sum(n)"])
    sum_dl = int(stats["sum(s)"])
    df_batches = list(
        cands.groupby("term")
        .aggregate(Count(alias_name="df"))
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    df_tbl = (
        pa.concat_tables(df_batches).combine_chunks()
        if df_batches
        else pa.table(
            {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
        )
    )
    df_terms = df_tbl.column("term")
    df_vals = df_tbl.column("df").to_numpy(zero_copy_only=False).astype(
        np.float64
    )
    avgdl = sum_dl / n_docs

    def score(batch: pa.Table) -> pa.Table:
        tf = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dl = batch.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        idx = pc.index_in(
            batch.column("term"), value_set=df_terms
        ).to_numpy(zero_copy_only=False)
        df = df_vals[idx]
        idf = (n_docs - df + 0.5) / (df + 0.5)
        s = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))
        return batch.append_column("score", pa.array(s))

    return cands.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def corpus_unigram_counts(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int = 65_536,
) -> tuple[pa.Table, int]:
    """Global lowercase-token frequency table capped to the
    ``max_vocab`` most frequent terms (ties by term), plus the total
    token count (INCLUDING tokens outside the kept vocabulary — the
    OOV mass).  Per-batch pre-combine as in term_document_frequency."""

    def partial(batch: pa.Table) -> pa.Table:
        t = _tokens_table(batch, text_col, id_col)
        part = t.group_by("term").aggregate([("did", "count")])
        return pa.table(
            {
                "term": part.column("term"),
                "tf": pc.cast(part.column("did_count"), pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("tf", alias_name="tf"))
    )
    total = int(counts.sum("tf") or 0)
    top = counts.sort(["tf", "term"], descending=[True, False]).limit(
        max_vocab
    )
    vocab = pa.concat_tables(
        top.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return vocab.combine_chunks(), total


def unigram_logprob(
    ds: ray.data.Dataset,
    vocab: pa.Table,
    total_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-document unigram-LM score — the perplexity quality filter
    of a training pipeline (KenLM-style, order 1): with add-one
    smoothing over the capped vocabulary (OOV falls to the smoothing
    floor), append ``(n_tokens, avg_logp, ppl = exp(-avg_logp))`` per
    doc.  Empty docs score ``avg_logp = 0, ppl = 1``.

    The vocabulary ships ONCE via ``ray.put``; per batch the lookup is
    a sorted-array binary search over the dictionary-encoded tokens —
    no per-token Python."""
    import math

    import ray as _ray

    v = vocab.sort_by("term").combine_chunks()
    vsize = len(v) + 1  # +1 OOV bucket
    denom = float(total_tokens + vsize)
    ref = _ray.put(
        (
            np.asarray(v.column("term").to_pylist()),
            v.column("tf").to_numpy(zero_copy_only=False).astype(np.float64),
        )
    )
    floor_logp = math.log(1.0 / denom)

    class Score:
        def __init__(self):
            self.terms, self.tf = _ray.get(ref)
            self.logp = np.log((self.tf + 1.0) / denom)

        def __call__(self, batch: pa.Table) -> pa.Table:
            toks = pc.split_pattern_regex(
                pc.utf8_lower(batch.column(text_col)), r"\s+"
            ).combine_chunks()
            flat = toks.flatten()
            lens = pc.list_value_length(toks).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            flat = flat.filter(pa.array(keep))
            # recompute per-doc counts over kept tokens
            doc_of = np.repeat(np.arange(len(lens)), lens)[keep]
            n_tok = np.bincount(doc_of, minlength=len(lens))
            enc = flat.dictionary_encode()
            uniq = np.asarray(enc.dictionary.to_pylist())
            pos = np.searchsorted(self.terms, uniq)
            pos_c = np.clip(pos, 0, max(len(self.terms) - 1, 0))
            hit = (
                (self.terms[pos_c] == uniq)
                if len(self.terms)
                else np.zeros(len(uniq), bool)
            )
            u_logp = np.where(hit, self.logp[pos_c], floor_logp)
            idx = enc.indices.to_numpy(zero_copy_only=False)
            tok_logp = u_logp[idx]
            sums = np.bincount(
                doc_of, weights=tok_logp, minlength=len(lens)
            )
            avg = np.where(n_tok > 0, sums / np.maximum(n_tok, 1), 0.0)
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "n_tokens": pa.array(n_tok.astype(np.int64)),
                    "avg_logp": pa.array(avg),
                    "ppl": pa.array(np.exp(-avg)),
                }
            )

    return ds.map_batches(
        Score,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


def corpus_bigram_lm(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int = 65_536,
    max_bigrams: int = 262_144,
) -> tuple[pa.Table, int, pa.Table]:
    """Train the interpolated bigram LM's sufficient statistics:
    ``(unigram vocab (term, tf), total_tokens, bigram table
    (bigram, n))`` — both tables frequency-capped (ties by term) so
    the broadcast stays bounded at any corpus scale.  One token-keyed
    and one pair-keyed pre-combined groupby; the model tables are the
    only driver-side state."""
    vocab, total = corpus_unigram_counts(
        ds, text_col=text_col, id_col=id_col, max_vocab=max_vocab
    )
    big = (
        bigram_counts(ds, text_col=text_col, id_col=id_col)
        .sort(["n", "bigram"], descending=[True, False])
        .limit(max_bigrams)
    )
    btbl = pa.concat_tables(
        big.iter_batches(batch_format="pyarrow", batch_size=None)
    ).combine_chunks()
    return vocab, total, btbl


def bigram_logprob(
    ds: ray.data.Dataset,
    vocab: pa.Table,
    total_tokens: int,
    bigrams: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
) -> ray.data.Dataset:
    """Per-document interpolated bigram-LM score — the CCNet-style
    (Wenzek et al. 2020) perplexity quality filter, order 2:

    - ``p_uni(w) = (tf(w) + 1) / (total + |V| + 1)`` (add-one over the
      capped vocab; OOV at the floor — same model as
      :func:`unigram_logprob`),
    - ``p_cond(w2|w1) = c(w1 w2) / tf(w1)`` from the capped bigram
      table (0 when either is outside its table),
    - the FIRST token of a doc scores ``log p_uni``; every later token
      scores ``log(lam * p_cond + (1 - lam) * p_uni)``.

    Appends ``(n_tokens, avg_logp, ppl = exp(-avg_logp))``; empty docs
    score ``avg_logp = 0, ppl = 1``.  Both model tables ship ONCE via
    ``ray.put``; per-batch lookups are binary searches over the
    dictionary-encoded token / joined-pair streams — no per-token
    Python."""
    import ray as _ray

    v = vocab.sort_by("term").combine_chunks()
    vsize = len(v) + 1
    denom = float(total_tokens + vsize)
    b = bigrams.sort_by("bigram").combine_chunks()
    ref = _ray.put(
        (
            np.asarray(v.column("term").to_pylist()),
            v.column("tf").to_numpy(zero_copy_only=False).astype(np.float64),
            np.asarray(b.column("bigram").to_pylist()),
            b.column("n").to_numpy(zero_copy_only=False).astype(np.float64),
        )
    )
    floor_p = 1.0 / denom

    def _lookup(sorted_keys: np.ndarray, vals: np.ndarray,
                uniq: np.ndarray, miss: float) -> np.ndarray:
        """vals[key] for each uniq key, `miss` where absent."""
        if not len(sorted_keys) or not len(uniq):
            return np.full(len(uniq), miss)
        pos = np.searchsorted(sorted_keys, uniq)
        pos_c = np.clip(pos, 0, len(sorted_keys) - 1)
        hit = sorted_keys[pos_c] == uniq
        return np.where(hit, vals[pos_c], miss)

    class Score:
        def __init__(self):
            self.terms, self.tf, self.bkeys, self.bn = _ray.get(ref)
            self.p_uni = (self.tf + 1.0) / denom

        def __call__(self, batch: pa.Table) -> pa.Table:
            toks = pc.split_pattern_regex(
                pc.utf8_lower(batch.column(text_col)), r"\s+"
            ).combine_chunks()
            flat = toks.flatten()
            lens = pc.list_value_length(toks).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            flat = flat.filter(pa.array(keep))
            doc_of = np.repeat(np.arange(len(lens)), lens)[keep]
            n_tok = np.bincount(doc_of, minlength=len(lens))
            n = len(doc_of)
            if n == 0:
                z = np.zeros(len(lens))
                return pa.table(
                    {
                        id_col: batch.column(id_col),
                        "n_tokens": pa.array(n_tok.astype(np.int64)),
                        "avg_logp": pa.array(z),
                        "ppl": pa.array(np.exp(z)),
                    }
                )
            # per-token unigram prob
            enc = flat.dictionary_encode()
            uniq = np.asarray(enc.dictionary.to_pylist())
            u_p = _lookup(
                self.terms,
                self.p_uni,
                uniq,
                floor_p,
            )
            # context count tf(w1) per unique token (0 = outside vocab)
            u_ctx = _lookup(self.terms, self.tf, uniq, 0.0)
            idx = enc.indices.to_numpy(zero_copy_only=False)
            tok_p_uni = u_p[idx]
            tok_ctx = u_ctx[idx]
            # bigram conditional for positions 1.. within each doc
            is_first = np.ones(n, bool)
            if n > 1:
                is_first[1:] = doc_of[1:] != doc_of[:-1]
            tok_logp = np.empty(n)
            tok_logp[is_first] = np.log(tok_p_uni[is_first])
            rest = ~is_first
            if rest.any():
                pairs = pc.binary_join_element_wise(
                    flat.slice(0, n - 1), flat.slice(1, n - 1), " "
                )
                pair_rows = np.flatnonzero(rest) - 1  # pair i = (i, i+1)
                penc = pairs.take(pa.array(pair_rows)).dictionary_encode()
                puniq = np.asarray(penc.dictionary.to_pylist())
                p_c12 = _lookup(self.bkeys, self.bn, puniq, 0.0)
                c12 = p_c12[penc.indices.to_numpy(zero_copy_only=False)]
                ctx = tok_ctx[np.flatnonzero(rest) - 1]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cond = np.where(ctx > 0, c12 / np.maximum(ctx, 1.0), 0.0)
                tok_logp[rest] = np.log(
                    lam * cond + (1.0 - lam) * tok_p_uni[rest]
                )
            sums = np.bincount(doc_of, weights=tok_logp, minlength=len(lens))
            avg = np.where(n_tok > 0, sums / np.maximum(n_tok, 1), 0.0)
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "n_tokens": pa.array(n_tok.astype(np.int64)),
                    "avg_logp": pa.array(avg),
                    "ppl": pa.array(np.exp(-avg)),
                }
            )

    return ds.map_batches(
        Score,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Gopher-style document quality rules (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", Appendix A quality heuristics):

    1. 50 <= n_words <= 100000
    2. 3 <= mean word length <= 10
    3. symbol-to-word ratio <= 0.1  (symbols: '#' and '...')
    4. <= 90% of lines start with a bullet ('•', '-', '*')
    5. <= 30% of lines end with an ellipsis ('...' or '…')
    6. >= 80% of words contain at least one alphabetic character
    7. at least 2 of 8 required stopwords appear (the/be/to/of/and/
       that/have/with, word-bounded, case-insensitive)

    All counters are exact integers from RE2 kernels; ratios are
    single IEEE divisions of those integers, so a SQL twin replays
    them bitwise.  Output: ``(id_col, n_words, mean_word_len,
    symbol_ratio, bullet_line_ratio, ellipsis_line_ratio,
    alpha_word_ratio, n_stop_hits, keep)`` — one streaming map, no
    shuffle.
    """

    return ds.map_batches(
        lambda b: _gopher_batch(b, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _gopher_batch(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    text = batch.column(text_col)
    nw = pc.count_substring_regex(text, r"\S+").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    word_chars = pc.utf8_length(
        pc.replace_substring_regex(text, r"\s", "")
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    n_hash = pc.count_substring(text, "#").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    n_dots = pc.count_substring(text, "...").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    n_lines = pc.count_substring(text, "\n").to_numpy(
        zero_copy_only=False
    ).astype(np.int64) + 1
    n_bullet = pc.count_substring_regex(
        text, r"(?m)^[ \t]*[•\-\*]"
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    n_ellipsis = pc.count_substring_regex(
        text, r"(?m)(\.\.\.|…)[ \t]*$"
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    n_alpha = pc.count_substring_regex(
        text, r"\S*[A-Za-z]\S*"
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    stop_hits = np.zeros(len(nw), dtype=np.int64)
    for sw in _GOPHER_STOPWORDS:
        hit = pc.match_substring_regex(
            text, rf"(?i)\b{sw}\b"
        ).to_numpy(zero_copy_only=False)
        stop_hits += hit.astype(np.int64)
    nwf = nw.astype(np.float64)
    nlf = n_lines.astype(np.float64)
    mean_wl = np.where(nw > 0, word_chars / np.maximum(nwf, 1.0), 0.0)
    sym_r = np.where(
        nw > 0, (n_hash + n_dots) / np.maximum(nwf, 1.0), 0.0
    )
    bul_r = n_bullet / nlf
    ell_r = n_ellipsis / nlf
    alp_r = np.where(nw > 0, n_alpha / np.maximum(nwf, 1.0), 0.0)
    keep = (
        (nw >= 50)
        & (nw <= 100_000)
        & (mean_wl >= 3.0)
        & (mean_wl <= 10.0)
        & (sym_r <= 0.1)
        & (bul_r <= 0.9)
        & (ell_r <= 0.3)
        & (alp_r >= 0.8)
        & (stop_hits >= 2)
    )
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_words": pa.array(nw),
            "mean_word_len": pa.array(mean_wl),
            "symbol_ratio": pa.array(sym_r),
            "bullet_line_ratio": pa.array(bul_r),
            "ellipsis_line_ratio": pa.array(ell_r),
            "alpha_word_ratio": pa.array(alp_r),
            "n_stop_hits": pa.array(stop_hits),
            "keep": pa.array(keep.astype(np.int64)),
        }
    )


def c4_clean(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """C4-style line-level cleaning (Raffel et al. 2020, "Exploring the
    Limits of Transfer Learning with a Unified Text-to-Text
    Transformer", §2.2 heuristics):

    Line keep rule (all must hold): ends with terminal punctuation
    (``. ! ?`` or ``"``), has >= 5 whitespace words, and does not
    contain "javascript" (case-insensitive).

    Page rules: drop pages containing "lorem ipsum" (ci) or a curly
    brace ``{``; keep pages whose CLEANED text has >= 3 sentence
    terminators.  (The original's three-sentence-span dedup is the
    separate ``paragraph_dedup`` pipeline.)

    Output: ``(id_col, n_lines, n_kept_lines, n_sentences, has_lorem,
    has_brace, cleaned_text, keep)``.  One streaming map, no shuffle;
    every counter is an exact integer and the cleaned text is a pure
    string rebuild, so a SQL twin matches bitwise.  Hot path is fully
    vectorized: ``split_pattern`` -> flat line-level RE2 kernels ->
    prefix-sum re-segmentation -> ``binary_join``.
    """

    return ds.map_batches(
        lambda b: _c4_batch(b, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _c4_batch(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    text = batch.column(text_col).combine_chunks()
    if isinstance(text, pa.ChunkedArray):
        text = pa.concat_arrays(text.chunks) if text.num_chunks else (
            pa.array([], pa.string())
        )
    lines = pc.split_pattern(text, "\n")
    counts = pc.list_value_length(lines).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    flat = pc.list_flatten(lines)
    keep_line = pc.and_(
        pc.and_(
            pc.match_substring_regex(flat, r'[.!?"][ \t]*$'),
            pc.greater_equal(
                pc.count_substring_regex(flat, r"\S+"), 5
            ),
        ),
        pc.invert(pc.match_substring_regex(flat, r"(?i)javascript")),
    )
    k = keep_line.to_numpy(zero_copy_only=False).astype(np.int64)
    csum = np.concatenate([[0], np.cumsum(k)])
    kept_per_doc = csum[offsets[1:]] - csum[offsets[:-1]]
    new_offsets = np.concatenate([[0], np.cumsum(kept_per_doc)])
    kept_flat = flat.filter(keep_line)
    if isinstance(kept_flat, pa.ChunkedArray):
        kept_flat = kept_flat.combine_chunks()
    cleaned_list = pa.LargeListArray.from_arrays(
        pa.array(new_offsets, pa.int64()), kept_flat
    )
    cleaned = pc.binary_join(cleaned_list, "\n")
    n_sent = pc.cast(
        pc.count_substring_regex(cleaned, r"[.!?]"), pa.int64()
    )
    has_lorem = pc.match_substring_regex(text, r"(?i)lorem ipsum")
    has_brace = pc.match_substring(text, "{")
    keep = pc.and_(
        pc.and_(pc.invert(has_lorem), pc.invert(has_brace)),
        pc.greater_equal(n_sent, 3),
    )
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_lines": pa.array(counts),
            "n_kept_lines": pa.array(kept_per_doc),
            "n_sentences": n_sent,
            "has_lorem": pc.cast(has_lorem, pa.int64()),
            "has_brace": pc.cast(has_brace, pa.int64()),
            "cleaned_text": cleaned,
            "keep": pc.cast(keep, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# URL extraction + per-domain stats (web-pipeline provenance analysis)
# ---------------------------------------------------------------------------
def extract_urls(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """``(id_col, url, domain)`` — one row per http(s) URL token in the
    text.  Fully vectorized: Arrow whitespace split → list flatten →
    RE2 prefix match → RE2 host capture; no per-row Python.  Tokens
    with an empty host (``https://``) are dropped."""

    def _f(batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(
            batch.column(text_col).combine_chunks()
        )
        flat = toks.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        rep = np.repeat(ids, lens)
        hit = pc.match_substring_regex(flat, r"^https?://[^/]")
        idx = np.flatnonzero(
            hit.to_numpy(zero_copy_only=False).astype(bool)
        )
        urls = pc.take(flat, pa.array(idx))
        dom = pc.struct_field(
            pc.extract_regex(urls, r"^https?://(?P<host>[^/]+)"), "host"
        )
        return pa.table(
            {id_col: pa.array(rep[idx]), "url": urls, "domain": dom}
        )

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def domain_stats(
    urls: ray.data.Dataset, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Per-domain ``(domain, n_urls, n_docs)`` — total URL mentions and
    distinct documents.  Two chained groupbys: the first collapses to
    (domain, doc) partials (output is bounded by the distinct-pair
    count), the second is a small key-space aggregate."""
    per_doc = urls.groupby(["domain", id_col]).aggregate(
        Count(alias_name="n_urls")
    )
    return per_doc.groupby("domain").aggregate(
        Sum("n_urls", alias_name="n_urls"),
        Count(alias_name="n_docs"),
    )


# ---------------------------------------------------------------------------
# Encoding-quality / mojibake detection (ftfy-style curation heuristic)
# ---------------------------------------------------------------------------

# Literal artifact sequences of UTF-8 bytes mis-decoded as cp1252 (the
# dominant real-world mojibake class: 'e-acute' -> 'A-tilde,copyright',
# right-quote -> 'a-circ,euro,trade', NBSP -> 'A-circ,nbsp').  Only
# sequences whose cp1252 rendering is fully printable are listed, so
# the table round-trips through SQL string literals unchanged.
MOJIBAKE_LITERALS: tuple[str, ...] = (
    "Ã©",  # e-acute
    "Ã¨",  # e-grave
    "Ã¤",  # a-umlaut
    "Ã¶",  # o-umlaut
    "Ã¼",  # u-umlaut
    "Ã±",  # n-tilde
    "â€™",  # right single quote
    "â€œ",  # left double quote
    "â€“",  # en dash
    "Â ",  # non-breaking space
)
REPLACEMENT_CHAR = "�"


def mojibake_stats(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Per-document encoding-quality stats: ``n_mojibake`` (total hits
    of the cp1252-double-decode literal table), ``n_replacement``
    (U+FFFD count) and ``is_clean`` (1 iff both are zero) — the
    ftfy-flavoured curation signal for dropping or re-decoding
    mis-encoded web documents.

    Vectorized: one Arrow ``count_substring`` kernel per literal, no
    per-row Python; O(len(text) x |literals|) with a tiny fixed
    literal table, embarrassingly parallel, no shuffle.  Counts are
    exact integers, so the operator is bitwise SQL-replayable.
    """

    def _f(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        total = pc.count_substring(text, MOJIBAKE_LITERALS[0])
        for lit in MOJIBAKE_LITERALS[1:]:
            total = pc.add(total, pc.count_substring(text, lit))
        repl = pc.count_substring(text, REPLACEMENT_CHAR)
        total = pc.cast(total, pa.int64())
        repl = pc.cast(repl, pa.int64())
        clean = pc.cast(
            pc.and_(pc.equal(total, 0), pc.equal(repl, 0)), pa.int64()
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_mojibake": total,
                "n_replacement": repl,
                "is_clean": clean,
            }
        )

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def term_cooccurrence(
    ds: ray.data.Dataset,
    df_lo: int = 3,
    df_hi: int = 200,
    top_k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int | None = None,
) -> pa.Table:
    """(term_a, term_b, c_xy, c_x, c_y) — corpus-wide DOCUMENT
    co-occurrence counts for the top-``top_k`` unordered pairs of
    band-vocabulary terms (``df_lo <= df <= df_hi`` — the df band caps
    per-document pair fan-out exactly like the df_cap in the
    ngram-Jaccard index), with each term's own document frequency
    attached.  These are the integer sufficient statistics of PMI
    phrase mining; the log itself is left to the consumer so the
    whole table stays exact int64 (bitwise SQL twin).

    Distributed shape: per-batch distinct (doc, term) pre-combine, one
    df groupby, the df-banded vocabulary broadcast (bounded by the
    band), a per-DOC-group vectorized triu pair expansion, and one
    pair-keyed count shuffle.  Never all-pairs across documents.
    Ordering: count DESC, then (term_a, term_b) ASC — deterministic.
    """
    import math as _math

    n_docs = ds.count()
    if num_parts is None:
        num_parts = int(max(2, min(256, _math.ceil(n_docs / 20_000))))

    df = term_document_frequency(ds, text_col=text_col, id_col=id_col)
    vblocks = [
        b
        for b in df.filter(
            expr=f"df >= {df_lo} and df <= {df_hi}"
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    vocab_tbl = (
        pa.concat_tables(vblocks)
        if vblocks
        else pa.table(
            {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
        )
    )
    vocab_sorted = vocab_tbl.sort_by("term")
    vterms = vocab_sorted.column("term").to_pandas().to_numpy()
    vdf = vocab_sorted.column("df").to_numpy(zero_copy_only=False)
    vref = ray.put((vterms, vdf))

    def doc_terms(batch: pa.Table) -> pa.Table:
        vt, _ = ray.get(vref)
        t = _tokens_table(batch, text_col, id_col)
        distinct = t.group_by(["did", "term"]).aggregate([])
        term = distinct.column("term").to_pandas().to_numpy()
        did = distinct.column("did").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(vt, term)
        pos = np.minimum(pos, max(len(vt) - 1, 0))
        keep = (
            (vt[pos] == term) if len(vt) else np.zeros(len(term), bool)
        )
        return pa.table(
            {
                "hpart": pa.array(
                    (did[keep] % np.int64(num_parts)).astype(np.int32)
                ),
                "did": pa.array(did[keep]),
                "tid": pa.array(pos[keep].astype(np.int64)),
            }
        )

    def doc_pairs(group: pa.Table) -> pa.Table:
        did = group.column("did").to_numpy(zero_copy_only=False)
        tid = group.column("tid").to_numpy(zero_copy_only=False)
        order = np.lexsort((tid, did))
        did, tid = did[order], tid[order]
        first = np.empty(len(did), dtype=bool)
        if len(did):
            first[0] = True
            first[1:] = did[1:] != did[:-1]
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, len(did)))
        pa_list, pb_list = [], []
        for s0, ln in zip(starts, lens):
            if ln < 2:
                continue
            terms = tid[s0 : s0 + ln]
            ai, bi = np.triu_indices(ln, k=1)
            pa_list.append(terms[ai])
            pb_list.append(terms[bi])
        if not pa_list:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "one": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "a": pa.array(np.concatenate(pa_list)),
                "b": pa.array(np.concatenate(pb_list)),
                "one": pa.array(
                    np.ones(sum(len(x) for x in pa_list), np.int64)
                ),
            }
        )

    counts = (
        ds.select_columns([id_col, text_col])
        .map_batches(doc_terms, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hpart")
        .map_groups(doc_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("one", alias_name="c_xy"))
    )
    top = counts.sort(
        ["c_xy", "a", "b"], descending=[True, False, False]
    ).limit(top_k)
    tblocks = [
        b
        for b in top.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    tbl = pa.concat_tables(tblocks) if tblocks else None
    if tbl is None:
        return pa.table(
            {
                "term_a": pa.array([], pa.string()),
                "term_b": pa.array([], pa.string()),
                "c_xy": pa.array([], pa.int64()),
                "c_x": pa.array([], pa.int64()),
                "c_y": pa.array([], pa.int64()),
            }
        )
    a = tbl.column("a").to_numpy(zero_copy_only=False)
    b = tbl.column("b").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "term_a": pa.array(vterms[a].astype(object), pa.string()),
            "term_b": pa.array(vterms[b].astype(object), pa.string()),
            "c_xy": pa.array(
                tbl.column("c_xy").to_numpy(zero_copy_only=False).astype(
                    np.int64
                )
            ),
            "c_x": pa.array(vdf[a].astype(np.int64)),
            "c_y": pa.array(vdf[b].astype(np.int64)),
        }
    )


def chunk_text(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 64,
    stride: int = 48,
) -> ray.data.Dataset:
    """RAG-style overlapping chunking: one row per window of
    ``chunk_words`` whitespace words advancing by ``stride`` words
    (``stride < chunk_words`` ⇒ adjacent chunks overlap by
    ``chunk_words - stride`` words — the standard retrieval-context
    preparation).  Rows: ``(<id>, chunk_idx, chunk_text, n_words)``.

    Window rule: chunk c covers words [c·stride, min(c·stride+chunk,
    n)); the last window is the first one whose end reaches n (so no
    window is fully contained in its predecessor); a doc with
    0 < n ≤ chunk_words yields exactly one window, an empty doc none.

    Fully vectorized per batch (RE2 split → flat word gather via
    ``pc.take`` — windows overlap so the list offsets cannot share the
    buffer — → ``binary_join``); no shuffle, embarrassingly parallel.
    """
    if chunk_words <= 0 or stride <= 0 or stride > chunk_words:
        raise ValueError("need 0 < stride <= chunk_words")

    def split(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        words = pc.split_pattern_regex(batch.column(text_col), pattern=r"\s+")
        per_doc = np.asarray(pc.list_value_length(words), dtype=np.int64)
        flat = pc.list_flatten(words)
        flat = (
            flat.combine_chunks()
            if isinstance(flat, pa.ChunkedArray)
            else flat
        )
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        if (lens == 0).any():
            keep = lens > 0
            doc_of = np.repeat(np.arange(len(ids)), per_doc)[keep]
            flat = flat.filter(pa.array(keep))
            counts = np.bincount(doc_of, minlength=len(ids))
        else:
            counts = per_doc
        n_chunks = np.where(
            counts == 0,
            0,
            np.where(
                counts <= chunk_words,
                1,
                (counts - chunk_words + stride - 1) // stride + 1,
            ),
        ).astype(np.int64)
        total = int(n_chunks.sum())
        doc_idx = np.repeat(np.arange(len(ids)), n_chunks)
        local = (
            np.arange(total)
            - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
        )
        doc_word_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
        starts = local * stride
        ends = np.minimum(starts + chunk_words, counts[doc_idx])
        w = ends - starts
        # overlapping windows: explicit flat-index gather
        gstart = doc_word_start[doc_idx] + starts
        idx = np.repeat(gstart, w) + (
            np.arange(int(w.sum())) - np.repeat(np.cumsum(w) - w, w)
        )
        taken = flat.take(pa.array(idx, pa.int64()))
        offsets = np.concatenate([[0], np.cumsum(w)])
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), taken
        )
        return pa.table(
            {
                id_col: pa.array(ids[doc_idx]),
                "chunk_idx": pa.array(local.astype(np.int64)),
                "chunk_text": pc.binary_join(lists, " "),
                "n_words": pa.array(w.astype(np.int64)),
            }
        )

    return ds.map_batches(split, batch_format="pyarrow", zero_copy_batch=True)
