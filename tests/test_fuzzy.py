"""Edit-distance similarity self-join (functions/fuzzy.py): Myers
bit-parallel verify vs a reference DP, and the full prefix-filtered
pipeline vs brute force — including the short-string bucket cases the
prefix filter alone cannot cover."""

import random

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.functions.fuzzy import edit_distance_pairs, myers_distance_batch
from tests.util import ds_to_table


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


def test_myers_matches_dp():
    rng = random.Random(11)
    alpha = "abcdx"
    a = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        for _ in range(300)
    ]
    b = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        for _ in range(300)
    ]
    got = myers_distance_batch(pa.array(a), pa.array(b))
    exp = np.array([_lev(x, y) for x, y in zip(a, b)])
    assert (got == exp).all()


def test_myers_known_values():
    a = pa.array(["kitten", "flaw", "", "abc", "same"])
    b = pa.array(["sitting", "lawn", "xy", "", "same"])
    assert myers_distance_batch(a, b).tolist() == [3, 2, 2, 3, 0]


def test_myers_rejects_long_strings():
    with pytest.raises(ValueError, match="64 bytes"):
        myers_distance_batch(pa.array(["x" * 65]), pa.array(["y"]))


def _pairs_set(tbl: pa.Table) -> set[tuple[str, str, int]]:
    return set(
        zip(
            tbl.column("name_a").to_pylist(),
            tbl.column("name_b").to_pylist(),
            tbl.column("dist").to_pylist(),
        )
    )


def _brute(words: list[str], k: int) -> set[tuple[str, str, int]]:
    ws = sorted(set(words))
    out = set()
    for i in range(len(ws)):
        for j in range(i + 1, len(ws)):
            d = _lev(ws[i], ws[j])
            if d <= k:
                out.add((ws[i], ws[j], d))
    return out


def test_edit_distance_pairs_vs_brute_force():
    """Small alphabet + lengths 0..6 makes almost every string 'short'
    (<= k*q distinct grams), stressing the bucket path; a handful of
    long words stress the prefix filter and short<->long pairing."""
    rng = random.Random(5)
    words = sorted(
        {
            "".join(rng.choice("ab") for _ in range(rng.randint(0, 6)))
            for _ in range(120)
        }
        | {"kitten", "sitting", "kitchen", "mitten", "a", "", "xy", "ab"}
    )
    # duplicate input rows: the operator must dedup to distinct values
    ds = ray.data.from_items(
        [{"w": w} for w in words for _ in range(rng.randint(1, 3))]
    )
    got = _pairs_set(ds_to_table(edit_distance_pairs(ds, "w", k=2, q=2)))
    exp = _brute(words, 2)
    assert got == exp
    assert any(d == 1 for _, _, d in got) and any(d == 2 for _, _, d in got)


def test_edit_distance_pairs_k1():
    words = ["green gear", "green bear", "green gears", "purple sock"]
    ds = ray.data.from_items([{"w": w} for w in words])
    got = _pairs_set(ds_to_table(edit_distance_pairs(ds, "w", k=1, q=2)))
    assert got == _brute(words, 1)
    assert ("green bear", "green gear", 1) in got
