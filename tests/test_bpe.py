"""Distributed BPE merge learning vs a sequential pure-Python replay."""

from collections import Counter

import pyarrow as pa
import ray.data

from igraph_ray.functions.bpe import _EOW, bpe_train


def _reference_bpe(texts, num_merges):
    words = Counter()
    for t in texts:
        for w in t.lower().split():
            words[w] += 1
    vocab = {w: list(w) + [_EOW] for w in words}
    ref = []
    for rank in range(num_merges):
        pc2 = Counter()
        for w, toks in vocab.items():
            for i in range(len(toks) - 1):
                pc2[(toks[i], toks[i + 1])] += words[w]
        if not pc2:
            break
        top = max(pc2.values())
        if top < 2:
            break
        best = sorted(p for p, c in pc2.items() if c == top)[0]
        ref.append((rank, best[0], best[1], best[0] + best[1], top))
        for w, toks in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if (
                    i + 1 < len(toks)
                    and toks[i] == best[0]
                    and toks[i + 1] == best[1]
                ):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            vocab[w] = out
    return ref


def _check(texts, num_merges):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    ).repartition(num_blocks=3)
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["count"])
        for r in bpe_train(ds, num_merges=num_merges).to_pylist()
    ]
    assert got == _reference_bpe(texts, num_merges)


def test_bpe_matches_sequential_reference():
    _check(
        ["the cat sat on the mat", "the bat and the cat",
         "a mat and a hat"] * 3,
        8,
    )


def test_bpe_overlapping_runs_leftmost_first():
    # 'aaaa' exercises the aaa-chain: merge (a,a) applies leftmost-
    # first non-overlapping, exactly like the sequential scan
    _check(["aaaa aaa aa baaab"] * 4, 5)


def test_bpe_encode_lengths_matches_per_word_replay():
    from igraph_ray.functions.bpe import bpe_encode_lengths

    texts = [
        "the cat sat on the mat",
        "the bat and the cat",
        "a mat and a hat",
    ] * 2
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    merges = ray.data.from_arrow
    from igraph_ray.functions.bpe import bpe_train

    mt = bpe_train(ds, num_merges=6)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode_lengths(ds, mt).iter_rows()
    }
    mlist = [(r["left"], r["right"], r["merged"]) for r in mt.to_pylist()]

    def enc(w):
        t = list(w) + [_EOW]
        for left, right, m in mlist:
            out, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == left and t[i + 1] == right:
                    out.append(m)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            t = out
        return len(t)

    for i, t in enumerate(texts):
        ws = t.lower().split()
        assert got[i] == (len(ws), sum(enc(w) for w in ws)), i
