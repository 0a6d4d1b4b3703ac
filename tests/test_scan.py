"""Global exclusive scan vs brute force."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.scan import exclusive_scan
from tests.util import ds_to_table


def test_exclusive_scan():
    rng = np.random.default_rng(3)
    n = 700
    key = rng.integers(0, 50, n).astype(np.int64)  # heavy ties
    tie = rng.permutation(n).astype(np.int64)
    val = rng.integers(-10, 100, n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array(key),
                "o_orderkey": pa.array(tie),
                "cents": pa.array(val),
            }
        )
    ).repartition(7)
    got_t = ds_to_table(exclusive_scan(ds, ("ts", "o_orderkey"), "cents"))
    got = {
        (k, t): s
        for k, t, s in zip(
            got_t.column("ts").to_pylist(),
            got_t.column("o_orderkey").to_pylist(),
            got_t.column("scan").to_pylist(),
        )
    }
    order = sorted(zip(key, tie, val))
    acc = 0
    want = {}
    for k, t, v in order:
        want[(k, t)] = acc
        acc += v
    assert got == want
    # layout-independent
    got2_t = ds_to_table(
        exclusive_scan(ds.repartition(3), ("ts", "o_orderkey"), "cents")
    )
    got2 = {
        (k, t): s
        for k, t, s in zip(
            got2_t.column("ts").to_pylist(),
            got2_t.column("o_orderkey").to_pylist(),
            got2_t.column("scan").to_pylist(),
        )
    }
    assert got2 == want
