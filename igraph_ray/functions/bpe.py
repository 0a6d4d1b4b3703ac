"""Distributed byte-pair-encoding vocabulary induction (Sennrich,
Haddow, Birch 2016, "Neural Machine Translation of Rare Words with
Subword Units") — the training side of the tokenizer family
(``functions/text.py`` has the counting side).

Standard BPE efficiency shape: training runs over the WORD-TYPE table
(distinct word, corpus count) — one corpus groupby, after which the
working set is vocabulary-sized, not corpus-sized.  Each merge
iteration is then:

1. one ``map_batches`` pass emitting per-batch PRE-COMBINED
   (pair, count) partial rows (np.unique over joined symbol pairs —
   the classic combiner, a hub pair sees at most #blocks rows),
2. a tiny ``groupby("pair").sum`` + top-1 (max count, lexicographic
   tie-break — deterministic, matching the reference implementation),
3. one ``map_batches`` pass applying the broadcast merge rule to the
   token-sequence column with leftmost-first non-overlapping
   semantics, fully vectorized over the flattened token array
   (run-boundary trick for the aaa/aa chain case — no per-row loop).

``num_merges`` iterations cost 2 streaming passes + one tiny shuffle
each; the token table stays distributed throughout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum

_EOW = "▁"  # end-of-word marker (SentencePiece-style visible space)


def word_type_table(
    ds: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """(word, n) — lowercase whitespace word types with corpus counts."""

    def words(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(
                pc.utf8_lower(batch.column(text_col)), r"\s+"
            )
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        return pa.table({"word": toks})

    return (
        ds.map_batches(words, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .aggregate(Count("word", alias_name="n"))
    )


def _init_tokens(batch: pa.Table) -> pa.Table:
    """word → list<symbol> (chars + end-of-word marker)."""
    words = batch.column("word").to_pylist()
    toks = [list(w) + [_EOW] for w in words]
    return pa.table(
        {
            "toks": pa.array(toks, pa.large_list(pa.string())),
            "n": batch.column("n"),
        }
    )


def _pair_partials(batch: pa.Table) -> pa.Table:
    toks = batch.column("toks").combine_chunks()
    n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    flat = toks.flatten().to_pandas().to_numpy()
    if len(flat) == 0:
        return pa.table(
            {
                "left": pa.array([], pa.string()),
                "right": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    # adjacent positions within the same word
    offsets = np.concatenate([[0], np.cumsum(lens)])
    pos = np.arange(len(flat) - 1)
    # a position is a within-word pair start unless it is the last
    # symbol of its word (i.e. pos+1 is a word boundary)
    boundary = np.zeros(len(flat) + 1, dtype=bool)
    boundary[offsets] = True
    valid = ~boundary[pos + 1]
    word_of = np.repeat(np.arange(len(lens)), lens)
    left = flat[pos[valid]]
    right = flat[pos[valid] + 1]
    weight = n[word_of[pos[valid]]]
    # pre-combine on (left, right) directly — lexsort + segmented sum
    # (object-dtype safe; no joined-string separator games, tokens may
    # contain any byte)
    order = np.lexsort((right, left))
    l_s, r_s, w_s = left[order], right[order], weight[order]
    if len(l_s) == 0:
        return pa.table(
            {
                "left": pa.array([], pa.string()),
                "right": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    first = np.empty(len(l_s), dtype=bool)
    first[0] = True
    first[1:] = (l_s[1:] != l_s[:-1]) | (r_s[1:] != r_s[:-1])
    starts = np.flatnonzero(first)
    cnt = np.add.reduceat(w_s, starts).astype(np.int64)
    return pa.table(
        {
            "left": pa.array(l_s[starts].astype(object), pa.string()),
            "right": pa.array(r_s[starts].astype(object), pa.string()),
            "cnt": pa.array(cnt),
        }
    )


def _apply_merge(left: str, right: str, merged: str):
    def _f(batch: pa.Table) -> pa.Table:
        toks = batch.column("toks").combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = toks.flatten().to_pandas().to_numpy()
        if len(flat) == 0:
            return batch
        offsets = np.concatenate([[0], np.cumsum(lens)])
        boundary = np.zeros(len(flat) + 1, dtype=bool)
        boundary[offsets] = True
        pos = np.arange(len(flat) - 1)
        cand = (
            (flat[pos] == left)
            & (flat[pos + 1] == right)
            & ~boundary[pos + 1]
        )
        cand_idx = np.flatnonzero(cand)
        if len(cand_idx) == 0:
            return batch
        # leftmost-first non-overlapping: within each run of
        # CONSECUTIVE candidate positions keep every other one
        run_start = np.empty(len(cand_idx), dtype=bool)
        run_start[0] = True
        run_start[1:] = cand_idx[1:] != cand_idx[:-1] + 1
        run_id = np.cumsum(run_start) - 1
        run_first = cand_idx[run_start]
        keep = ((cand_idx - run_first[run_id]) % 2) == 0
        merge_at = cand_idx[keep]
        out = flat.astype(object)
        out[merge_at] = merged
        drop = np.zeros(len(flat), dtype=bool)
        drop[merge_at + 1] = True
        kept = ~drop
        # every word keeps >= 1 symbol, so all reduceat segments are
        # non-empty and the per-word drop counts are exact
        new_lens = lens - np.add.reduceat(drop.astype(np.int64), offsets[:-1])
        new_flat = out[kept]
        new_offsets = np.concatenate([[0], np.cumsum(new_lens)])
        arr = pa.LargeListArray.from_arrays(
            pa.array(new_offsets, pa.int64()),
            pa.array(new_flat, pa.string()),
        )
        return pa.table({"toks": arr, "n": batch.column("n")})

    return _f


def bpe_train(
    ds: ray.data.Dataset,
    num_merges: int = 50,
    text_col: str = "text",
) -> pa.Table:
    """Learn ``num_merges`` BPE merge rules over the corpus; returns
    rows ``(rank, left, right, merged, count)`` in merge order.
    Deterministic: highest pair count, lexicographic (left, right)
    tie-break — matching the reference sequential implementation
    (tests/test_bpe.py replays it in pure Python)."""
    vocab = word_type_table(ds, text_col)
    toks = vocab.map_batches(
        _init_tokens, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    merges = []
    for rank in range(num_merges):
        pairs = (
            toks.map_batches(
                _pair_partials, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby(["left", "right"])
            .aggregate(Sum("cnt", alias_name="cnt"))
        )
        top = pairs.sort(
            ["cnt", "left", "right"], descending=[True, False, False]
        ).limit(1).take_all()
        if not top or top[0]["cnt"] < 2:
            break
        left, right = top[0]["left"], top[0]["right"]
        merged = left + right
        merges.append((rank, left, right, merged, int(top[0]["cnt"])))
        toks = toks.map_batches(
            _apply_merge(left, right, merged),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()

    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "merged": pa.array([m[3] for m in merges], pa.string()),
            "count": pa.array([m[4] for m in merges], pa.int64()),
        }
    )


def bpe_encode_lengths(
    ds: ray.data.Dataset,
    merges: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(id_col, n_words, n_bpe_tokens) — per-document subword token
    counts under a learned merge list (the encode side of
    ``bpe_train``).

    Scale shape: merges are applied ONCE per word TYPE (the same
    vocabulary-sized table the trainer used — rank-ordered passes over
    word types, not over the corpus), yielding a (word →
    n_subwords) table; the corpus then joins to it with the native
    hash join (corpus-sized shuffle on the word key) and reduces per
    document.  No broadcast of the unbounded vocabulary.
    """
    from igraph_ray.stages.join import hash_join

    vocab = word_type_table(ds, text_col)
    toks = vocab.map_batches(
        lambda b: pa.table(
            {
                "word": b.column("word"),
                "toks": _init_tokens(b).column("toks"),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    for row in merges.to_pylist():
        fn = _apply_merge(row["left"], row["right"], row["merged"])

        def apply_row(batch: pa.Table, _fn=fn) -> pa.Table:
            out = _fn(
                pa.table(
                    {"toks": batch.column("toks"), "n": batch.column("word")}
                )
            )
            return pa.table(
                {"word": batch.column("word"), "toks": out.column("toks")}
            )

        toks = toks.map_batches(
            apply_row, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    def word_len(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "word": batch.column("word"),
                "n_sub": pc.cast(
                    pc.list_value_length(batch.column("toks")), pa.int64()
                ),
            }
        )

    word_lens = toks.map_batches(
        word_len, batch_format="pyarrow", zero_copy_batch=True
    )

    def doc_words(batch: pa.Table) -> pa.Table:
        t = pc.split_pattern_regex(
            pc.utf8_lower(batch.column(text_col)), r"\s+"
        ).combine_chunks()
        lens = pc.list_value_length(t).to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        flat = t.flatten()
        doc = np.repeat(ids, lens)
        keep = pc.not_equal(flat, "")
        return pa.table(
            {id_col: pa.array(doc), "word": flat}
        ).filter(keep)

    pairs = ds.select_columns([id_col, text_col]).map_batches(
        doc_words, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = hash_join(pairs, word_lens, on="word")
    agg = joined.groupby(id_col).aggregate(
        Count(id_col, alias_name="n_words"),
        Sum("n_sub", alias_name="n_bpe_tokens"),
    )
    return agg
