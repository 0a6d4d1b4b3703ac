"""Training-data ops: text analysis, dedup (exact/minhash/simhash),
similarity search (brute-force + LSH), multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.functions.dedup import (
    exact_dedup,
    jaccard,
    minhash_near_dup_pairs,
    simhash_near_dup_pairs,
)
from igraph_ray.functions.multimodal import (
    decode_images,
    sample_frames,
    synth_multimodal_table,
)
from igraph_ray.functions.similarity import brute_force_topk, lsh_topk
from igraph_ray.functions.text import (
    language_id,
    quality_score,
    token_count,
    winnow_fingerprints,
)
from tests.util import ds_to_table


def _docs():
    texts = [
        "the quick brown fox jumps over the lazy dog and runs away",
        "the quick brown fox jumps over the lazy dog and runs home",
        "der schnelle braune fuchs springt und das ist nicht ein hund",
        "le renard brun rapide saute et la maison est une belle chose",
        "the quick brown fox jumps over the lazy dog and runs away",  # dup of 0
        "completely different text about graph engines and ray data",
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )


def test_token_count():
    out = ds_to_table(token_count(_docs())).sort_by("doc_id")
    texts = out.column("text").to_pylist()
    counts = out.column("n_tokens").to_pylist()
    assert counts == [len(t.split()) for t in texts]


def test_quality_score_ranges():
    out = ds_to_table(quality_score(_docs()))
    q = out.column("quality").to_pylist()
    assert all(0.0 <= v <= 1.0 for v in q)
    assert out.column("punct_ratio").to_pylist()[0] == 0.0


def test_language_id():
    out = ds_to_table(language_id(_docs())).sort_by("doc_id")
    pred = out.column("lang_pred").to_pylist()
    assert pred[0] == "en" and pred[2] == "de" and pred[3] == "fr"


def test_winnow_fingerprints_detect_overlap():
    out = ds_to_table(winnow_fingerprints(_docs())).sort_by("doc_id")
    fps = [set(x) for x in out.column("fingerprints").to_pylist()]
    assert fps[0] == fps[4]  # identical docs → identical fingerprints
    # near-identical docs share most fingerprints
    inter = len(fps[0] & fps[1]) / len(fps[0] | fps[1])
    assert inter > 0.5
    assert len(fps[0] & fps[5]) / len(fps[0] | fps[5]) < 0.2


def test_exact_dedup():
    out = ds_to_table(exact_dedup(_docs()))
    # 6 docs, one exact duplicate pair → 5 distinct texts
    assert out.num_rows == 5
    keep = dict(
        zip(
            out.column("content_sha").to_pylist(),
            out.column("keep_id").to_pylist(),
        )
    )
    assert 0 in keep.values() and 4 not in keep.values()


def test_minhash_near_dup():
    pairs = ds_to_table(
        minhash_near_dup_pairs(_docs(), verify_threshold=0.5)
    )
    got = set(zip(pairs.column("a").to_pylist(), pairs.column("b").to_pylist()))
    assert (0, 4) in got  # exact dup
    assert (0, 1) in got or (1, 4) in got  # near dup
    assert all(j >= 0.5 for j in pairs.column("jaccard").to_pylist())


def test_jaccard_symmetric_bounds():
    assert jaccard("abcdefgh", "abcdefgh") == 1.0
    assert jaccard("abcdefgh", "zzzzzzzz") == 0.0


def test_simhash_near_dup():
    pairs = ds_to_table(simhash_near_dup_pairs(_docs(), max_hamming=8))
    got = set(zip(pairs.column("a").to_pylist(), pairs.column("b").to_pylist()))
    assert (0, 4) in got
    ham = dict(zip(got, pairs.column("hamming").to_pylist()))


def test_brute_force_topk():
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((200, 16))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(200), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
    ).repartition(num_blocks=4)
    queries = vecs[[5, 17]]  # exact members → top-1 must be themselves
    out = ds_to_table(brute_force_topk(ds, queries, k=3)).sort_by(
        [("query_id", "ascending"), ("score", "descending")]
    )
    by_q = {}
    for q, v, s in zip(
        out.column("query_id").to_pylist(),
        out.column("vec_id").to_pylist(),
        out.column("score").to_pylist(),
    ):
        by_q.setdefault(q, []).append((v, s))
    assert by_q[0][0][0] == 5 and by_q[0][0][1] == pytest.approx(1.0)
    assert by_q[1][0][0] == 17
    # oracle: exact numpy top-3 matches
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    scores = norm @ norm[[5, 17]].T
    for qi in (0, 1):
        expect = set(np.argsort(-scores[:, qi])[:3].tolist())
        assert {v for v, _ in by_q[qi]} == expect


def test_lsh_topk_self_recall():
    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((300, 16))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(300), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
    ).repartition(num_blocks=4)
    out = ds_to_table(lsh_topk(ds, vecs[[9]], k=5, nbits=4))
    rows = dict(
        zip(out.column("vec_id").to_pylist(), out.column("score").to_pylist())
    )
    assert rows.get(9) == pytest.approx(1.0)  # its own bucket contains it


def test_multimodal_plumbing():
    tbl = synth_multimodal_table(50)
    ds = ray.data.from_arrow(tbl).repartition(num_blocks=2)
    out = ds_to_table(decode_images(ds, out_h=4, out_w=4, batch_size=16))
    assert out.num_rows == 50
    assert all(len(p) == 4 * 4 * 3 for p in out.column("pixels").to_pylist())
    # deterministic: same payload → same pixels
    out2 = ds_to_table(decode_images(ds, out_h=4, out_w=4, batch_size=16))
    assert out.sort_by("item_id").equals(out2.sort_by("item_id"))

    frames = ds_to_table(sample_frames(ds, every_nth=7))
    nf = dict(
        zip(tbl.column("item_id").to_pylist(), tbl.column("n_frames").to_pylist())
    )
    got = {}
    for i in frames.column("item_id").to_pylist():
        got[i] = got.get(i, 0) + 1
    for i, n in nf.items():
        expect = len(range(0, max(n, 0), 7))
        assert got.get(i, 0) == expect


def test_decode_image_stub_raises():
    from igraph_ray.functions.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_embedding_near_dup_pairs():
    from igraph_ray.functions.similarity import embedding_near_dup_pairs

    rng = np.random.default_rng(8)
    base = rng.standard_normal((100, 16))
    # make 3 near-duplicate pairs: tiny perturbations of rows 0, 5, 9
    vecs = np.vstack([base, base[[0, 5, 9]] + 0.001 * rng.standard_normal((3, 16))])
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
    ).repartition(num_blocks=3)
    out = ds_to_table(embedding_near_dup_pairs(ds, threshold=0.99, nbits=4))
    got = set(zip(out.column("a").to_pylist(), out.column("b").to_pylist()))
    assert {(0, 100), (5, 101), (9, 102)}.issubset(got)
    assert all(c >= 0.99 for c in out.column("cosine").to_pylist())


def test_near_dedup_clusters(tmp_path):
    from igraph_ray.functions.dedup import near_dedup

    out = ds_to_table(
        near_dedup(_docs(), str(tmp_path / "g"), verify_threshold=0.5)
    )
    keep = dict(
        zip(out.column("vid").to_pylist(), out.column("keep_id").to_pylist())
    )
    # doc 4 is an exact duplicate of doc 0; doc 1 is a near-duplicate
    assert keep[4] == 0
    assert keep[1] == 0
    # the unrelated doc keeps itself
    assert keep[5] == 5


def test_ngram_jaccard_pairs_exact():
    """Exact word-3-gram Jaccard vs a pure-Python oracle (same df-cap
    universe rule), on a corpus with planted near-duplicates."""
    import itertools
    import random
    from collections import Counter

    import pyarrow as pa
    import ray.data

    from igraph_ray.functions.dedup import ngram_jaccard_pairs

    rng = random.Random(7)
    words = [f"w{i}" for i in range(30)]
    docs = {}
    for i in range(30):
        docs[i] = " ".join(rng.choice(words) for _ in range(rng.randint(1, 40)))
    # planted near-dups: copy with small tail edits
    for i in range(30, 36):
        base = docs[i - 30]
        docs[i] = base + " tail" + str(i)

    n, cap, thr = 3, 16, 0.3

    def shingle(t):
        toks = t.split()
        return {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}

    sets = {i: shingle(t) for i, t in docs.items()}
    df = Counter(s for ss in sets.values() for s in ss)
    sets = {i: {s for s in ss if df[s] <= cap} for i, ss in sets.items()}
    want = {}
    for i, j in itertools.combinations(sorted(docs), 2):
        inter = len(sets[i] & sets[j])
        union = len(sets[i] | sets[j])
        if union and inter / union >= thr and inter > 0:
            want[(i, j)] = (inter, union, inter / union)
    assert want  # fixture sanity: some pairs survive

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(docs), pa.int64()),
                "text": pa.array([docs[i] for i in sorted(docs)], pa.string()),
            }
        )
    )
    out = ngram_jaccard_pairs(ds, n=n, df_cap=cap, threshold=thr)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    got = {
        (a, b): (c, u, j)
        for a, b, c, u, j in zip(
            tbl.column("a").to_pylist(),
            tbl.column("b").to_pylist(),
            tbl.column("common").to_pylist(),
            tbl.column("union_sz").to_pylist(),
            tbl.column("jaccard").to_pylist(),
        )
    }
    assert got.keys() == want.keys()
    for k, (c, u, j) in want.items():
        assert got[k][0] == c and got[k][1] == u
        assert got[k][2] == pytest.approx(j, abs=1e-15)

    # the 64-bit hashed-shingle scale variant must agree exactly on a
    # corpus this small (collisions astronomically unlikely)
    out_h = ngram_jaccard_pairs(
        ds, n=n, df_cap=cap, threshold=thr, hash_shingles=True
    )
    tbl_h = pa.concat_tables(
        out_h.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    got_h = {
        (a, b): (c, u)
        for a, b, c, u in zip(
            tbl_h.column("a").to_pylist(),
            tbl_h.column("b").to_pylist(),
            tbl_h.column("common").to_pylist(),
            tbl_h.column("union_sz").to_pylist(),
        )
    }
    assert got_h == {k: (c, u) for k, (c, u, _) in want.items()}


def test_redact_pii():
    from igraph_ray.functions.text import redact_pii

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    [
                        "mail a.b+c@x-corp.example.org now",
                        "host 192.168.0.1 and backup 10.0.0.254 "
                        "call +44 555 0176 or +1 555 123",
                        "no pii here",
                    ]
                ),
            }
        )
    )
    tbl = pa.concat_tables(
        redact_pii(ds).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("doc_id")
    assert tbl.column("email_n").to_pylist() == [1, 0, 0]
    assert tbl.column("ipv4_n").to_pylist() == [0, 2, 0]
    assert tbl.column("phone_n").to_pylist() == [0, 2, 0]
    red = tbl.column("redacted").to_pylist()
    assert red[0] == "mail <EMAIL> now"
    assert red[1] == "host <IP> and backup <IP> call <PHONE> or <PHONE>"
    assert red[2] == "no pii here"


def test_gopher_rules_edge_cases():
    from igraph_ray.functions.text import gopher_rules

    good = (
        "the quick brown fox jumps over that lazy dog and it will have "
        "been with us for quite some time now running through fields "
    ) * 4  # 96 words, all alphabetic, plenty of stopwords
    bullets = "\n".join(f"- item {i}" for i in range(10))  # 100% bullet lines
    ellipses = "\n".join(f"so it goes on {i}..." for i in range(10))
    symbols = "# " * 60 + "the word is that we have to be of and with it " * 2
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "text": pa.array(["", good, bullets, ellipses, symbols]),
            }
        )
    )
    tbl = pa.concat_tables(
        gopher_rules(ds).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("doc_id")
    rows = {r["doc_id"]: r for r in tbl.to_pylist()}
    # empty doc: zero words, ratios defined (0.0), rejected
    assert rows[0]["n_words"] == 0 and rows[0]["keep"] == 0
    assert rows[0]["mean_word_len"] == 0.0
    # good doc passes every rule
    assert rows[1]["n_words"] == 96 and rows[1]["keep"] == 1
    assert rows[1]["alpha_word_ratio"] == 1.0
    assert rows[1]["n_stop_hits"] >= 2
    # bullet-only doc: bullet_line_ratio == 1.0 > 0.9 -> reject
    assert rows[2]["bullet_line_ratio"] == 1.0 and rows[2]["keep"] == 0
    # ellipsis-terminated lines: ratio 1.0 > 0.3 -> reject
    assert rows[3]["ellipsis_line_ratio"] == 1.0 and rows[3]["keep"] == 0
    # symbol-heavy doc: 60 hashes over ~84 words -> symbol ratio > 0.1
    assert rows[4]["symbol_ratio"] > 0.1 and rows[4]["keep"] == 0


def test_c4_clean_rules():
    from igraph_ray.functions.text import c4_clean

    texts = [
        "Good line has five words here.\nshort.\nno punct five words here\n"
        "Another good sentence with words. And more! Yes?\n",
        "lorem ipsum dolor sit amet. This is a fine sentence. "
        "Another one here too. Third sentence is fine.",
        "code { x = 1; }",
        "",
        "Use javascript for this page today.\n"
        'He said "hello there my friend."\n'
        "One more good sentence right here. Then another one follows! Ok?",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    tbl = pa.concat_tables(
        c4_clean(ds).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("doc_id")
    rows = {r["doc_id"]: r for r in tbl.to_pylist()}
    # doc 0: trailing newline -> 5 lines, 2 survive (short./no-punct dropped)
    assert rows[0]["n_lines"] == 5 and rows[0]["n_kept_lines"] == 2
    assert rows[0]["keep"] == 1 and rows[0]["n_sentences"] == 4
    # lorem ipsum page: lines may survive but page is dropped
    assert rows[1]["has_lorem"] == 1 and rows[1]["keep"] == 0
    # curly-brace page dropped
    assert rows[2]["has_brace"] == 1 and rows[2]["keep"] == 0
    # empty doc: one empty line, nothing kept
    assert rows[3]["n_lines"] == 1 and rows[3]["cleaned_text"] == ""
    # javascript line dropped; quote-terminated line kept
    assert rows[4]["n_kept_lines"] == 2
    assert "javascript" not in rows[4]["cleaned_text"]
    assert '"' in rows[4]["cleaned_text"]


def test_curation_funnel_counts():
    from igraph_ray.functions.curation import curation_funnel

    good = (
        "The quick brown fox jumps over that lazy dog and it will have "
        "been with us for quite some time. And it keeps running today! "
        "Surely we have to be of and with it for a while now you see. "
    ) * 2  # passes Gopher (words/stopwords) and C4 (3+ sentences)
    docs = [{"doc_id": i, "text": good} for i in range(4)]  # 4 exact dupes
    docs.append({"doc_id": 10, "text": good + "A distinct closing line."})
    docs.append({"doc_id": 11, "text": "too short"})  # fails Gopher
    docs.append(
        {"doc_id": 12, "text": good + " brace { kills the page."}
    )  # passes Gopher, fails C4
    df = curation_funnel(ray.data.from_items(docs)).sort_values("stage")
    assert list(df["stage"]) == [1, 2, 3]
    assert list(df["stage_name"]) == ["gopher", "c4", "exact_dedup"]
    # gopher: 7 in, 6 out (doc 11 rejected)
    assert list(df["n_in"]) == [7, 6, 5]
    # c4: doc 12 rejected; dedup: 4 copies of `good` collapse to 1
    assert list(df["n_out"]) == [6, 5, 2]


def test_duplicate_span_stats():
    from igraph_ray.functions.dedup import duplicate_span_stats

    texts = [
        "a b c d e f g h i j",  # 3 windows; first shared with doc 1
        "a b c d e f g h x y",
        "unique words only here nothing repeats at all ever done",
        "short doc",  # < 8 words -> no row
        "r r r r r r r r r r r r r r r r",  # all windows identical
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    ).repartition(num_blocks=3)
    rows = {
        r["doc_id"]: r for r in duplicate_span_stats(ds, n=8).iter_rows()
    }
    assert set(rows) == {0, 1, 2, 4}
    assert rows[0]["n_windows"] == 3 and rows[0]["n_dup_windows"] == 1
    assert rows[1]["n_dup_windows"] == 1
    assert rows[2]["n_dup_windows"] == 0 and rows[2]["dup_ratio"] == 0.0
    assert rows[4]["n_windows"] == 9 and rows[4]["dup_ratio"] == 1.0


def test_extract_urls_and_domain_stats():
    from igraph_ray.functions.text import domain_stats, extract_urls

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [
                        "see https://a.com/x and http://b.org/y end",
                        "no urls here at all",
                        "dup https://a.com/x https://a.com/z bare https://",
                        "https://a.com/q starts the line",
                    ]
                ),
            }
        )
    )
    urls = ds_to_table(extract_urls(ds)).sort_by(
        [("doc_id", "ascending"), ("url", "ascending")]
    )
    assert urls.column("url").to_pylist() == [
        "http://b.org/y",
        "https://a.com/x",
        "https://a.com/x",
        "https://a.com/z",
        "https://a.com/q",
    ]
    assert urls.column("domain").to_pylist() == [
        "b.org",
        "a.com",
        "a.com",
        "a.com",
        "a.com",
    ]
    stats = ds_to_table(domain_stats(extract_urls(ds))).sort_by("domain")
    assert stats.column("domain").to_pylist() == ["a.com", "b.org"]
    assert stats.column("n_urls").to_pylist() == [4, 1]
    assert stats.column("n_docs").to_pylist() == [3, 1]


def test_mojibake_stats():
    """mojibake_stats counts double-decode artifacts and U+FFFD
    exactly, flags clean docs, and pure-Python recount agrees."""
    import ray.data

    from igraph_ray.functions.text import (
        MOJIBAKE_LITERALS,
        REPLACEMENT_CHAR,
        mojibake_stats,
    )

    texts = [
        "perfectly clean ascii",
        "caf" + MOJIBAKE_LITERALS[0] + " twice " + MOJIBAKE_LITERALS[0],
        "quote " + MOJIBAKE_LITERALS[6] + " dash " + MOJIBAKE_LITERALS[8],
        "lost " + REPLACEMENT_CHAR * 3,
        "unicode café résumé is fine",  # real accents are NOT mojibake
        "",
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = (
        pa.concat_tables(
            mojibake_stats(ray.data.from_arrow(t)).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
        .sort_by("doc_id")
        .to_pydict()
    )
    want_moji = [
        sum(s.count(lit) for lit in MOJIBAKE_LITERALS) for s in texts
    ]
    want_repl = [s.count(REPLACEMENT_CHAR) for s in texts]
    assert out["n_mojibake"] == want_moji == [0, 2, 2, 0, 0, 0]
    assert out["n_replacement"] == want_repl == [0, 0, 0, 3, 0, 0]
    assert out["is_clean"] == [1, 0, 0, 0, 1, 1]


# ---------------------------------------------------------------------------
# RAG-style overlapping chunking
# ---------------------------------------------------------------------------
def _brute_chunks(texts, chunk=5, stride=3):
    rows = []
    for i, t in enumerate(texts):
        ws = [w for w in t.split() if w]
        n = len(ws)
        if n == 0:
            continue
        nc = 1 if n <= chunk else -(-(n - chunk) // stride) + 1
        for c in range(nc):
            win = ws[c * stride : min(c * stride + chunk, n)]
            rows.append((i, c, " ".join(win), len(win)))
    return rows


def test_chunk_text_vs_brute():
    import ray.data

    from igraph_ray.functions.text import chunk_text

    texts = [
        "a b c d e f g h i j k",     # 11 words: chunks at 0,3,6
        "one two three",              # n <= chunk: one window
        "",                           # empty: none
        "   \t  ",                    # whitespace-only: none
        "w1 w2 w3 w4 w5",             # n == chunk exactly: one window
        "x1 x2 x3 x4 x5 x6",          # n == chunk+1: two windows
        "  padded   words  here  ",   # artifacts dropped
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    out = pa.concat_tables(
        chunk_text(ds, chunk_words=5, stride=3).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    got = sorted(
        zip(
            out.column("doc_id").to_pylist(),
            out.column("chunk_idx").to_pylist(),
            out.column("chunk_text").to_pylist(),
            out.column("n_words").to_pylist(),
        )
    )
    assert got == sorted(_brute_chunks(texts, 5, 3))
    # no window fully contained in its predecessor
    for d, c, txt, nw in got:
        if c > 0:
            assert (c - 1) * 3 + 5 < sum(
                1 for w in texts[d].split() if w
            ) or nw == 5


def test_fingerprint_pairs_vs_brute():
    import ray.data

    from igraph_ray.functions.dedup import fingerprint_pairs
    from igraph_ray.functions.text import _winnow_row

    base = (
        "the quick brown fox jumps over the lazy dog and keeps "
        "running through the quiet forest until dawn breaks"
    )
    texts = [
        base,
        base + " with a small tail added",       # near-dup of 0
        "completely different content that talks about graph engines "
        "and distributed dataflow systems at scale",
        base.replace("quick", "rapid"),           # still shares spans
        "short",                                  # below window: excluded
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    out = pa.concat_tables(
        fingerprint_pairs(ds, min_shared=2).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["shared"] for r in out.to_pylist()
    }
    # brute replay
    sets = {}
    for i, t in enumerate(texts):
        if len(t) >= 8 + 16 - 1:
            sets[i] = set(
                np.unique(_winnow_row(t.encode("utf-8"), 8, 16)).tolist()
            )
    want = {}
    for a in sets:
        for b in sets:
            if a < b:
                s = len(sets[a] & sets[b])
                if s >= 2:
                    want[(a, b)] = s
    assert got == want
    assert (0, 1) in got and (0, 3) in got  # the planted near-dups
    assert all(4 not in k for k in got)


def test_simplified_silhouette_vs_brute():
    import ray.data

    from igraph_ray.functions.similarity import simplified_silhouette

    rng = np.random.default_rng(8)
    # 3 well-separated Gaussian blobs + labels, some points mislabeled
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    pts, labs = [], []
    for i, c in enumerate(centers):
        pts.append(c + rng.normal(0, 0.5, size=(40, 2)))
        labs += [i] * 40
    labs = np.array(labs)
    labs[::17] = (labs[::17] + 1) % 3  # plant mislabels
    X = np.vstack(pts)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "embedding": pa.array(X.tolist(), pa.list_(pa.float64())),
                "label": pa.array(labs, pa.int64()),
            }
        )
    ).repartition(5)
    out = {
        r["label"]: (r["n"], r["mean_silhouette"])
        for r in simplified_silhouette(ds).to_pylist()
    }
    # brute replay
    cents = np.vstack(
        [X[labs == i].mean(axis=0) for i in range(3)]
    )
    dist = np.sqrt(
        ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    )
    a = dist[np.arange(len(X)), labs]
    m = dist.copy()
    m[np.arange(len(X)), labs] = np.inf
    b = m.min(axis=1)
    s = (b - a) / np.maximum(a, b)
    for i in range(3):
        want = s[labs == i].mean()
        assert out[i][0] == int((labs == i).sum())
        assert abs(out[i][1] - want) < 1e-9
    assert abs(out[-1][1] - s.mean()) < 1e-9
    # mislabeled points drag means below the clean-blob regime
    assert 0.5 < out[-1][1] < 1.0


def test_ngram_containment_vs_brute():
    import ray.data

    from igraph_ray.functions.dedup import ngram_jaccard_pairs

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    texts = [
        base,                                  # 0: long
        "gamma delta epsilon zeta eta theta",  # 1: fully quoted in 0
        "unrelated words entirely different text goes right here now",
        base + " phi chi psi omega",           # 3: superset of 0
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(2)
    out = pa.concat_tables(
        ngram_jaccard_pairs(
            ds, n=3, threshold=0.9, metric="containment"
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    got = {
        (r["a"], r["b"]): (r["common"], r["min_sz"], r["containment"])
        for r in out.to_pylist()
    }

    def sh(t):
        ws = t.split()
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    want = {}
    for a in range(4):
        for b in range(a + 1, 4):
            sa, sb = sh(texts[a]), sh(texts[b])
            c = len(sa & sb)
            m = min(len(sa), len(sb))
            if m and c / m >= 0.9:
                want[(a, b)] = (c, m, c / m)
    assert got == want
    assert (0, 1) in got and got[(0, 1)][2] == 1.0   # full quote
    assert (0, 3) in got and got[(0, 3)][2] == 1.0   # subset


def test_simplified_silhouette_single_cluster_is_zero():
    # one distinct label: b is a min over an all-masked row; the
    # conventional score is 0, not NaN (ADVICE r3)
    import ray.data

    from igraph_ray.functions.similarity import simplified_silhouette

    rng = np.random.default_rng(3)
    X = rng.normal(0, 1.0, size=(25, 4))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "embedding": pa.array(X.tolist(), pa.list_(pa.float64())),
                "label": pa.array(np.zeros(25, np.int64)),
            }
        )
    ).repartition(3)
    rows = {r["label"]: r["mean_silhouette"] for r in simplified_silhouette(ds).to_pylist()}
    assert rows[0] == 0.0 and rows[-1] == 0.0
    assert not any(np.isnan(v) for v in rows.values())


def test_multimodal_codec_injection_seam():
    """decode_images/sample_frames accept injected codec callables;
    the stub is just the injected default (round-4 seam)."""
    import ray.data

    from igraph_ray.functions.multimodal import (
        ImageDecoder,
        fake_decode_bytes,
        stub_frame_indices,
    )

    tbl = synth_multimodal_table(20)
    ds = ray.data.from_arrow(tbl)

    # a "real" codec: solid color from the first payload byte
    def solid(payload, h, w):
        v = payload[0] if payload else 0
        return np.full((max(h, 2), max(w, 2), 3), v, np.uint8)

    out = ds_to_table(
        decode_images(ds, out_h=2, out_w=2, decode_fn=solid)
    ).sort_by("item_id")
    for item, mean in zip(
        tbl.column("item_id").to_pylist(),
        out.column("mean_intensity").to_pylist(),
    ):
        v = tbl.column("payload")[item].as_py()[0]
        assert mean == float(v)

    # default path == explicit stub injection, deterministic
    d1 = ds_to_table(decode_images(ds, out_h=4, out_w=4)).sort_by("item_id")
    d2 = ds_to_table(
        decode_images(ds, out_h=4, out_w=4, decode_fn=fake_decode_bytes)
    ).sort_by("item_id")
    assert d1.equals(d2)

    # contract violation fails loudly, naming the seam
    def bad(payload, h, w):
        return np.zeros((h, w), np.float64)

    dec = ImageDecoder(decode_fn=bad)
    with pytest.raises(ValueError, match="decode_fn"):
        dec(tbl.slice(0, 2))

    # frame prober seam: payload-aware indices
    def probe(payload, n_frames, every_nth):
        return np.arange(0, min(int(n_frames), len(payload)), every_nth)

    fr_stub = ds_to_table(sample_frames(ds, every_nth=7))
    fr_probe = ds_to_table(
        sample_frames(ds, every_nth=7, frame_index_fn=probe)
    )
    assert fr_probe.num_rows <= fr_stub.num_rows
    fr_default = ds_to_table(
        sample_frames(ds, every_nth=7, frame_index_fn=stub_frame_indices)
    )
    assert (
        fr_stub.sort_by([("item_id", "ascending"), ("frame", "ascending")])
        .equals(
            fr_default.sort_by(
                [("item_id", "ascending"), ("frame", "ascending")]
            )
        )
    )
