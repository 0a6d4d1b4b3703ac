"""semi/anti join and grouped top-k vs brute-force oracles."""

from collections import defaultdict

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.join import semi_join
from igraph_ray.stages.topk import topk_per_group
from tests.util import ds_to_table


def test_semi_and_anti_join():
    rng = np.random.default_rng(3)
    lk = rng.integers(0, 30, 200).astype(np.int64)
    lv = np.arange(200, dtype=np.int64)
    left = ray.data.from_arrow(
        pa.table({"k": pa.array(lk), "v": pa.array(lv)})
    ).repartition(4)
    rk = np.array([1, 3, 5, 7, 9, 11, 3, 5], dtype=np.int64)  # dups ok
    right = ray.data.from_arrow(pa.table({"k": pa.array(rk)}))
    keys = set(rk.tolist())

    got = ds_to_table(semi_join(left, right, on="k"))
    want = sorted((int(a), int(b)) for a, b in zip(lk, lv) if int(a) in keys)
    assert (
        sorted(zip(got.column("k").to_pylist(), got.column("v").to_pylist()))
        == want
    )

    got = ds_to_table(semi_join(left, right, on="k", anti=True))
    want = sorted(
        (int(a), int(b)) for a, b in zip(lk, lv) if int(a) not in keys
    )
    assert (
        sorted(zip(got.column("k").to_pylist(), got.column("v").to_pylist()))
        == want
    )


def test_topk_per_group():
    rng = np.random.default_rng(8)
    n = 600
    g = rng.integers(0, 17, n).astype(np.int64)
    v = rng.integers(0, 50, n).astype(np.int64)  # deliberate value ties
    t = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {"grp": pa.array(g), "val": pa.array(v), "tie": pa.array(t)}
        )
    ).repartition(7)
    got = ds_to_table(
        topk_per_group(ds, "grp", "val", "tie", k=3, num_parts=4)
    )
    rows = {
        (gg, r): (vv, tt)
        for gg, vv, tt, r in zip(
            got.column("grp").to_pylist(),
            got.column("val").to_pylist(),
            got.column("tie").to_pylist(),
            got.column("rank").to_pylist(),
        )
    }
    per = defaultdict(list)
    for gg, vv, tt in zip(g, v, t):
        per[int(gg)].append((int(vv), int(tt)))
    want = {}
    for gg, items in per.items():
        items.sort(key=lambda x: (-x[0], x[1]))
        for r, (vv, tt) in enumerate(items[:3], 1):
            want[(gg, r)] = (vv, tt)
    assert rows == want
