"""Grouping sets / CUBE, pivot, and moving-window aggregates vs
brute-force oracles."""

from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.cube import cube_sets, grouping_sets, pivot_counts
from igraph_ray.stages.window import moving_agg
from tests.util import ds_to_table


def test_cube_sets():
    assert set(cube_sets(("a", "b"))) == {
        (),
        ("a",),
        ("b",),
        ("a", "b"),
    }


def test_grouping_sets_cube():
    rng = np.random.default_rng(7)
    n = 600
    a = rng.choice(["x", "y", "z"], n)
    b = rng.choice(["p", "q"], n)
    v = rng.integers(-5, 50, n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"a": pa.array(a), "b": pa.array(b), "v": pa.array(v)})
    ).repartition(5)
    got = ds_to_table(grouping_sets(ds, ("a", "b"), ("v",), cube_sets(("a", "b"))))
    rows = {
        (ga, gb): (nn, sv)
        for ga, gb, nn, sv in zip(
            got.column("a").to_pylist(),
            got.column("b").to_pylist(),
            got.column("n").to_pylist(),
            got.column("sum_v").to_pylist(),
        )
    }
    want = defaultdict(lambda: [0, 0])
    for ai, bi, vi in zip(a, b, v):
        for ka in (ai, "ALL"):
            for kb in (bi, "ALL"):
                want[(ka, kb)][0] += 1
                want[(ka, kb)][1] += int(vi)
    assert rows == {k: tuple(x) for k, x in want.items()}


def test_grouping_sets_rejects_bad_set():
    ds = ray.data.from_arrow(pa.table({"a": ["x"], "v": [1]}))
    try:
        grouping_sets(ds, ("a",), ("v",), (("zz",),))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_pivot_counts():
    rng = np.random.default_rng(13)
    n = 500
    g = rng.integers(0, 6, n).astype(np.int64)
    p = rng.choice(["F", "O", "P", "?"], n, p=[0.3, 0.4, 0.2, 0.1])
    ds = ray.data.from_arrow(
        pa.table({"g": pa.array(g), "s": pa.array(p)})
    ).repartition(4)
    got = ds_to_table(pivot_counts(ds, "g", "s", ("F", "O", "P")))
    rows = {
        gg: (f, o, pp, t)
        for gg, f, o, pp, t in zip(
            got.column("g").to_pylist(),
            got.column("n_F").to_pylist(),
            got.column("n_O").to_pylist(),
            got.column("n_P").to_pylist(),
            got.column("total").to_pylist(),
        )
    }
    want = {}
    for gg in np.unique(g):
        c = Counter(p[g == gg])
        want[int(gg)] = (
            c.get("F", 0),
            c.get("O", 0),
            c.get("P", 0),
            int((g == gg).sum()),
        )
    assert rows == want


def test_moving_agg():
    rng = np.random.default_rng(29)
    n = 400
    key = rng.integers(0, 8, n).astype(np.int64)
    ts = rng.integers(0, 150, n).astype(np.int64)  # deliberate ties
    tie = np.arange(n, dtype=np.int64)
    val = rng.integers(-30, 90, n).astype(np.int64)
    w = 4
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(key),
                "ts": pa.array(ts),
                "event_id": pa.array(tie),
                "cents": pa.array(val),
            }
        )
    ).repartition(6)
    got = ds_to_table(
        moving_agg(ds, "user_id", "ts", "event_id", "cents", w, num_parts=4)
    )
    rows = {
        (k, t, e): (lg, ld, ms, mn)
        for k, t, e, lg, ld, ms, mn in zip(
            got.column("user_id").to_pylist(),
            got.column("ts").to_pylist(),
            got.column("event_id").to_pylist(),
            got.column("lag_cents").to_pylist(),
            got.column("lead_cents").to_pylist(),
            got.column("mov_sum").to_pylist(),
            got.column("mov_n").to_pylist(),
        )
    }
    per_key = defaultdict(list)
    for k, t, e, v in zip(key, ts, tie, val):
        per_key[int(k)].append((int(t), int(e), int(v)))
    want = {}
    for k, evs in per_key.items():
        evs.sort()
        vals = [v for _, _, v in evs]
        for i, (t, e, v) in enumerate(evs):
            lo = max(0, i - w + 1)
            want[(k, t, e)] = (
                vals[i - 1] if i > 0 else None,
                vals[i + 1] if i + 1 < len(vals) else None,
                sum(vals[lo : i + 1]),
                i - lo + 1,
            )
    assert rows == want
