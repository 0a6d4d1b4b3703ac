"""Per-key running-sum window function vs a brute-force oracle."""

from collections import defaultdict

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.window import running_agg
from tests.util import ds_to_table


def test_running_agg():
    rng = np.random.default_rng(17)
    n = 500
    key = rng.integers(0, 11, n).astype(np.int64)
    ts = rng.integers(0, 200, n).astype(np.int64)  # deliberate ts ties
    tie = np.arange(n, dtype=np.int64)
    val = rng.integers(-20, 100, n).astype(np.int64)
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
        running_agg(ds, "user_id", "ts", "event_id", "cents", num_parts=4)
    )
    rows = {
        (k, t, e): (rn, s)
        for k, t, e, rn, s in zip(
            got.column("user_id").to_pylist(),
            got.column("ts").to_pylist(),
            got.column("event_id").to_pylist(),
            got.column("row_number").to_pylist(),
            got.column("run_sum").to_pylist(),
        )
    }
    per_key = defaultdict(list)
    for k, t, e, v in zip(key, ts, tie, val):
        per_key[int(k)].append((int(t), int(e), int(v)))
    want = {}
    for k, evs in per_key.items():
        evs.sort()
        s = 0
        for rn, (t, e, v) in enumerate(evs, 1):
            s += v
            want[(k, t, e)] = (rn, s)
    assert rows == want
