"""broadcast_join / hash_join vs brute-force dict oracles."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.join import broadcast_join, hash_join
from tests.util import ds_to_table


def _sides(seed=5, n_left=300, n_keys=40):
    rng = np.random.default_rng(seed)
    lk = rng.integers(0, n_keys, n_left).astype(np.int64)
    lv = rng.integers(0, 1000, n_left).astype(np.int64)
    # right: unique keys, only the even ones (so some left rows miss)
    rk = np.arange(0, n_keys, 2, dtype=np.int64)
    rv = rk * 10
    left = ray.data.from_arrow(
        pa.table({"k": pa.array(lk), "lv": pa.array(lv)})
    ).repartition(4)
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array(rk), "rv": pa.array(rv)})
    ).repartition(2)
    return left, right, lk, lv, dict(zip(rk.tolist(), rv.tolist()))


def _rows(got, cols):
    return sorted(
        zip(*(got.column(c).to_pylist() for c in cols)),
        key=lambda r: tuple((x is None, x) for x in r),
    )


def test_broadcast_join_inner():
    left, right, lk, lv, rmap = _sides()
    got = ds_to_table(
        broadcast_join(left, right, on="k", right_on="rk")
    )
    want = sorted(
        (int(k), int(v), rmap[int(k)])
        for k, v in zip(lk, lv)
        if int(k) in rmap
    )
    assert _rows(got, ["k", "lv", "rv"]) == want


def test_broadcast_join_left():
    left, right, lk, lv, rmap = _sides()
    got = ds_to_table(
        broadcast_join(left, right, on="k", right_on="rk", how="left")
    )
    want = sorted(
        ((int(k), int(v), rmap.get(int(k))) for k, v in zip(lk, lv)),
        key=lambda r: tuple((x is None, x) for x in r),
    )
    assert _rows(got, ["k", "lv", "rv"]) == want


def test_hash_join_inner_matches_broadcast():
    left, right, lk, lv, rmap = _sides(seed=9)
    got = ds_to_table(
        hash_join(left, right, on="k", right_on="rk", num_partitions=3)
    )
    want = sorted(
        (int(k), int(v), rmap[int(k)])
        for k, v in zip(lk, lv)
        if int(k) in rmap
    )
    assert _rows(got, ["k", "lv", "rv"]) == want


def test_hash_join_left_outer_keeps_unmatched():
    left, right, lk, lv, rmap = _sides(seed=3)
    got = ds_to_table(
        hash_join(
            left, right, on="k", right_on="rk",
            how="left_outer", num_partitions=3,
        )
    )
    want = sorted(
        ((int(k), int(v), rmap.get(int(k))) for k, v in zip(lk, lv)),
        key=lambda r: tuple((x is None, x) for x in r),
    )
    assert _rows(got, ["k", "lv", "rv"]) == want


def test_hash_join_full_outer_two_sided():
    # left keys only reach 29; right has evens up to 48 → evens >= 30
    # are right-exclusive, odd left keys are left-exclusive
    rng = np.random.default_rng(3)
    lk = rng.integers(0, 30, 200).astype(np.int64)
    lv = rng.integers(0, 1000, 200).astype(np.int64)
    rk = np.arange(0, 50, 2, dtype=np.int64)
    rmap = dict(zip(rk.tolist(), (rk * 10).tolist()))
    left = ray.data.from_arrow(
        pa.table({"k": pa.array(lk), "lv": pa.array(lv)})
    ).repartition(4)
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array(rk), "rv": pa.array(rk * 10)})
    ).repartition(2)
    got = ds_to_table(
        hash_join(
            left, right, on="k", right_on="rk",
            how="full_outer", num_partitions=3,
        )
    )
    matched = set(lk.tolist())
    want = [
        (int(k), int(v), rmap.get(int(k))) for k, v in zip(lk, lv)
    ] + [
        (k, None, v) for k, v in rmap.items() if k not in matched
    ]
    want = sorted(
        want, key=lambda r: tuple((x is None, x) for x in r)
    )
    # full outer coalesces the key into the left key column
    assert _rows(got, ["k", "lv", "rv"]) == want
    # both exclusive sides genuinely exercised
    assert any(r[2] is None for r in want)
    assert any(r[1] is None for r in want)
