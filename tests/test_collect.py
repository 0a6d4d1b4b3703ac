"""Ordered per-key collection vs brute-force oracle."""

from collections import defaultdict

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.collect import collect_ordered
from tests.util import ds_to_table


def _fixture(n=400, keys=9, seed=37):
    rng = np.random.default_rng(seed)
    key = rng.integers(0, keys, n).astype(np.int64)
    ts = rng.integers(0, 120, n).astype(np.int64)  # deliberate ties
    tie = np.arange(n, dtype=np.int64)
    val = rng.choice(["a", "b", "c", "d"], n)
    return key, ts, tie, val


def _want(key, ts, tie, val, limit=None):
    per = defaultdict(list)
    for k, t, e, v in zip(key, ts, tie, val):
        per[int(k)].append((int(t), int(e), v))
    out = {}
    for k, rows in per.items():
        rows.sort()
        vals = [v for _, _, v in rows]
        kept = vals if limit is None else vals[:limit]
        out[k] = (">".join(kept), len(vals))
    return out


def _got(ds_out):
    t = ds_to_table(ds_out)
    return {
        k: (j, n)
        for k, j, n in zip(
            t.column("user_id").to_pylist(),
            t.column("journey").to_pylist(),
            t.column("n_events").to_pylist(),
        )
    }


def test_collect_ordered_full():
    key, ts, tie, val = _fixture()
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(key),
                "ts": pa.array(ts),
                "event_id": pa.array(tie),
                "event_type": pa.array(val),
            }
        )
    ).repartition(5)
    got = _got(
        collect_ordered(
            ds, "user_id", "ts", "event_id", "event_type", num_parts=4
        )
    )
    assert got == _want(key, ts, tie, val)


def test_collect_ordered_limit():
    key, ts, tie, val = _fixture(seed=11)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(key),
                "ts": pa.array(ts),
                "event_id": pa.array(tie),
                "event_type": pa.array(val),
            }
        )
    ).repartition(3)
    got = _got(
        collect_ordered(
            ds,
            "user_id",
            "ts",
            "event_id",
            "event_type",
            limit=7,
            num_parts=4,
        )
    )
    assert got == _want(key, ts, tie, val, limit=7)
