"""ExactSubstr span removal (functions/dedup.py::
remove_duplicate_spans): pinned by a sequential pure-Python replay of
the documented rule (global first (doc, pos) occurrence kept, later
window occurrences deleted at word granularity); layout determinism;
short docs pass through normalized."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.functions.dedup import remove_duplicate_spans
from tests.util import ds_to_table

SPAN = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words


def _to_ds(texts, blocks=3):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(num_blocks=blocks)


def _brute(texts, n=8):
    words = [t.split() for t in texts]
    first = {}
    for i, ws in enumerate(words):
        low = [w.lower() for w in ws]
        for p in range(len(ws) - n + 1):
            g = " ".join(low[p : p + n])
            if g not in first:
                first[g] = (i, p)
    out = {}
    for i, ws in enumerate(words):
        low = [w.lower() for w in ws]
        cover = np.zeros(len(ws), bool)
        for p in range(len(ws) - n + 1):
            g = " ".join(low[p : p + n])
            if first[g] != (i, p):
                cover[p : p + n] = True
        kept = [w for w, c in zip(ws, cover) if not c]
        out[i] = (" ".join(kept), len(ws), int(cover.sum()))
    return out


def _got(texts, blocks=3):
    t = ds_to_table(remove_duplicate_spans(_to_ds(texts, blocks)))
    return {
        i: (s, nw, nr)
        for i, s, nw, nr in zip(
            t.column("doc_id").to_pylist(),
            t.column("text_clean").to_pylist(),
            t.column("n_words").to_pylist(),
            t.column("n_removed_words").to_pylist(),
        )
    }


def test_cross_doc_span_removed_from_later_doc(ray_session):
    texts = [
        f"intro words here {SPAN} trailing one two",
        f"other document start {SPAN} more stuff here now",
        "a fully unique document with no repeats at all today",
    ]
    got = _got(texts)
    assert got == _brute(texts)
    assert got[0][2] == 0          # first occurrence untouched
    assert got[1][2] == 8          # second lost the 8-word span
    assert "alpha" not in got[1][0]
    assert "alpha" in got[0][0]


def test_within_doc_repeat_and_overlaps(ray_session):
    texts = [
        f"{SPAN} middle filler words go here now {SPAN}",
        f"{SPAN} {SPAN}",  # adjacent repeats + overlapping windows
        "tiny doc",  # < 8 words: passes through normalized
        "",
    ]
    got = _got(texts)
    assert got == _brute(texts)
    assert got[2] == ("tiny doc", 2, 0)
    assert got[3] == ("", 0, 0)


def test_case_insensitive_matching_keeps_original_case(ray_session):
    texts = [
        f"{SPAN} tail",
        f"head {SPAN.upper()} tail words",
    ]
    got = _got(texts)
    assert got == _brute(texts)
    # uppercase copy matched case-insensitively (9 = span window +
    # the overlapping "beta..theta tail" window also seen in doc 0)
    assert got[1][2] == 9
    assert "ALPHA" not in got[1][0]


def test_layout_determinism(ray_session):
    rng = np.random.default_rng(4)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, 20).tolist()) for _ in range(25)
    ]
    texts += [texts[0], texts[3] + " " + texts[5]]
    assert _got(texts, blocks=1) == _got(texts, blocks=7) == _brute(texts)
