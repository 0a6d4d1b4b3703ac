"""HyperLogLog accuracy, determinism, and merge-invariance."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.sketch import hll_distinct, hll_distinct_by


def _ds(vals, parts=6):
    return ray.data.from_arrow(
        pa.table({"x": pa.array(np.asarray(vals, np.int64))})
    ).repartition(parts)


def test_hll_accuracy():
    rng = np.random.default_rng(2)
    for true_n in (100, 5_000, 60_000):
        vals = rng.integers(0, 10**12, true_n)
        vals = np.unique(vals)  # exact distinct = len(vals)
        data = np.concatenate([vals, vals[: len(vals) // 2]])  # dups
        rng.shuffle(data)
        est = hll_distinct(_ds(data), "x", p=14)
        rel = abs(est - len(vals)) / len(vals)
        assert rel < 0.03, (true_n, est, rel)


def test_hll_deterministic_and_partition_invariant():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 10**9, 20_000)
    e1 = hll_distinct(_ds(data, parts=3), "x")
    e2 = hll_distinct(_ds(data, parts=11), "x")
    assert e1 == e2  # register merge is order/partition independent


def test_hll_by_group():
    rng = np.random.default_rng(4)
    g = rng.integers(0, 3, 30_000).astype(np.int64)
    x = rng.integers(0, 10**9, 30_000).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"g": pa.array(g), "x": pa.array(x)})
    ).repartition(5)
    got = hll_distinct_by(ds, "g", "x", p=12)
    est = dict(
        zip(
            got.column("key").to_pylist(),
            got.column("approx_distinct").to_pylist(),
        )
    )
    for gv in (0, 1, 2):
        true = len(np.unique(x[g == gv]))
        rel = abs(est[gv] - true) / true
        assert rel < 0.06, (gv, est[gv], true, rel)
