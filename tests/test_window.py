"""Sessionization and tumbling windows vs brute-force oracles."""

from collections import defaultdict

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.window import (
    hopping_window,
    sessionize,
    tumbling_window,
)
from tests.util import ds_to_table

GAP = 100  # micros


def _events(seed=7, n=400, n_keys=13):
    rng = np.random.default_rng(seed)
    key = rng.integers(0, n_keys, n).astype(np.int64)
    ts = rng.integers(0, 4000, n).astype(np.int64)
    val = rng.integers(-50, 500, n).astype(np.int64)
    return key, ts, val


def _ds(key, ts, val):
    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(key),
                "ts": pa.array(ts),
                "cents": pa.array(val),
            }
        )
    ).repartition(5)


def _oracle_sessions(key, ts, val):
    per_key = defaultdict(list)
    for k, t, v in zip(key, ts, val):
        per_key[int(k)].append((int(t), int(v)))
    want = {}
    for k, rows in per_key.items():
        rows.sort()
        sid, start, last, cnt, s = 0, None, None, 0, 0
        for t, v in rows:
            if start is None or t - last > GAP:
                if start is not None:
                    want[(k, sid)] = (start, last, cnt, s)
                sid += 1
                start, cnt, s = t, 0, 0
            last, cnt, s = t, cnt + 1, s + v
        want[(k, sid)] = (start, last, cnt, s)
    return want


def test_sessionize():
    key, ts, val = _events()
    got = ds_to_table(
        sessionize(_ds(key, ts, val), "user_id", "ts", GAP, ("cents",))
    )
    rows = {
        (k, sid): (st, en, n, s)
        for k, sid, st, en, n, s in zip(
            got.column("user_id").to_pylist(),
            got.column("session_id").to_pylist(),
            got.column("session_start").to_pylist(),
            got.column("session_end").to_pylist(),
            got.column("n_events").to_pylist(),
            got.column("sum_cents").to_pylist(),
        )
    }
    assert rows == _oracle_sessions(key, ts, val)


def test_sessionize_timestamp_col():
    key, ts, val = _events(seed=3, n=60, n_keys=4)
    tbl = pa.table(
        {
            "user_id": pa.array(key),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "cents": pa.array(val),
        }
    )
    got = ds_to_table(
        sessionize(
            ray.data.from_arrow(tbl).repartition(3),
            "user_id",
            "ts",
            GAP,
            ("cents",),
        )
    )
    want = _oracle_sessions(key, ts, val)
    assert got.num_rows == len(want)
    first = {
        (k, sid): st
        for k, sid, st in zip(
            got.column("user_id").to_pylist(),
            got.column("session_id").to_pylist(),
            got.column("session_start").to_pylist(),
        )
    }
    assert first == {key: v[0] for key, v in want.items()}


def test_tumbling_window():
    key, ts, val = _events(seed=11)
    width = 250
    etype = (key % 3).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts),
                "etype": pa.array(etype),
                "cents": pa.array(val),
            }
        )
    ).repartition(4)
    got = ds_to_table(
        tumbling_window(ds, "ts", width, by=("etype",), sum_cols=("cents",))
    )
    rows = {
        (w, e): (n, s)
        for w, e, n, s in zip(
            got.column("window_start").to_pylist(),
            got.column("etype").to_pylist(),
            got.column("n_events").to_pylist(),
            got.column("sum_cents").to_pylist(),
        )
    }
    want = defaultdict(lambda: [0, 0])
    for t, e, v in zip(ts, etype, val):
        w = (int(t) // width) * width
        want[(w, int(e))][0] += 1
        want[(w, int(e))][1] += int(v)
    assert rows == {k: tuple(v) for k, v in want.items()}


def test_hopping_window():
    key, ts, val = _events(seed=19, n=300)
    width, hop = 300, 100
    ds = ray.data.from_arrow(
        pa.table({"ts": pa.array(ts), "cents": pa.array(val)})
    ).repartition(4)
    got = ds_to_table(
        hopping_window(ds, "ts", width, hop, sum_cols=("cents",))
    )
    rows = {
        w: (n, s)
        for w, n, s in zip(
            got.column("window_start").to_pylist(),
            got.column("n_events").to_pylist(),
            got.column("sum_cents").to_pylist(),
        )
    }
    want = defaultdict(lambda: [0, 0])
    for t, v in zip(ts, val):
        m = (int(t) - width) // hop + 1
        while m * hop <= int(t):
            if int(t) < m * hop + width:
                want[m * hop][0] += 1
                want[m * hop][1] += int(v)
            m += 1
    assert rows == {k: tuple(v) for k, v in want.items()}
