"""Funnel and cohort retention vs brute-force oracles."""

from collections import defaultdict

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.funnel import cohort_retention, funnel_counts
from tests.util import ds_to_table


def _events(n=600, users=25, seed=43):
    rng = np.random.default_rng(seed)
    key = rng.integers(0, users, n).astype(np.int64)
    ts = rng.integers(0, 1_000, n).astype(np.int64)
    tie = np.arange(n, dtype=np.int64)
    typ = rng.choice(["view", "click", "purchase", "other"], n)
    return key, ts, tie, typ


def _ds(key, ts, tie, typ):
    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(key),
                "ts": pa.array(ts),
                "event_id": pa.array(tie),
                "event_type": pa.array(typ),
            }
        )
    ).repartition(5)


def test_funnel_counts():
    key, ts, tie, typ = _events()
    steps = ("view", "click", "purchase")
    got_t = ds_to_table(
        funnel_counts(
            _ds(key, ts, tie, typ),
            "user_id",
            "ts",
            "event_id",
            "event_type",
            steps,
            num_parts=4,
        )
    )
    got = {
        s: n
        for s, n in zip(
            got_t.column("step").to_pylist(),
            got_t.column("n_users").to_pylist(),
        )
    }
    per = defaultdict(list)
    for k, t, e, y in zip(key, ts, tie, typ):
        per[int(k)].append((int(t), int(e), y))
    want = {i: 0 for i in range(1, len(steps) + 1)}
    for k, evs in per.items():
        evs.sort()
        i = 0
        for _, _, y in evs:
            if i < len(steps) and y == steps[i]:
                i += 1
                want[i] += 1
    assert got == want
    # funnel is monotone nonincreasing
    assert got[1] >= got[2] >= got[3]


def test_funnel_strict_order():
    # one user: purchase BEFORE click -> funnel stops at click... but a
    # later purchase exists for user 2
    rows = [
        (1, 0, 0, "view"),
        (1, 1, 1, "purchase"),
        (1, 2, 2, "click"),
        (2, 0, 3, "view"),
        (2, 1, 4, "click"),
        (2, 2, 5, "purchase"),
    ]
    key, ts, tie, typ = (
        np.array([r[0] for r in rows], np.int64),
        np.array([r[1] for r in rows], np.int64),
        np.array([r[2] for r in rows], np.int64),
        np.array([r[3] for r in rows]),
    )
    got_t = ds_to_table(
        funnel_counts(
            _ds(key, ts, tie, typ),
            "user_id",
            "ts",
            "event_id",
            "event_type",
            ("view", "click", "purchase"),
            num_parts=2,
        )
    )
    got = dict(
        zip(
            got_t.column("step").to_pylist(),
            got_t.column("n_users").to_pylist(),
        )
    )
    assert got == {1: 2, 2: 2, 3: 1}


def test_cohort_retention():
    key, ts, tie, typ = _events(seed=7)
    bucket = 100
    got_t = ds_to_table(
        cohort_retention(
            _ds(key, ts, tie, typ), "user_id", "ts", bucket, num_parts=4
        )
    )
    got = {
        (c, o): n
        for c, o, n in zip(
            got_t.column("cohort").to_pylist(),
            got_t.column("offset").to_pylist(),
            got_t.column("n_users").to_pylist(),
        )
    }
    per = defaultdict(set)
    for k, t in zip(key, ts):
        per[int(k)].add(int(t) // bucket)
    want = defaultdict(int)
    for k, buckets in per.items():
        c = min(buckets)
        for b in buckets:
            want[(c, b - c)] += 1
    assert got == dict(want)
    # offset-0 cell of each cohort equals its cohort size
    sizes = defaultdict(int)
    for k, buckets in per.items():
        sizes[min(buckets)] += 1
    for c, n in sizes.items():
        assert got[(c, 0)] == n
