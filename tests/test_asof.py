"""As-of join vs a brute-force oracle (backward inclusive, max-tie)."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.asof import asof_join
from tests.util import ds_to_table


def _brute(levents, rorders):
    out = {}
    for eid, k, t in levents:
        best = None
        for ok, kk, tt, price in rorders:
            if kk == k and tt <= t:
                if best is None or (tt, ok) > (best[2], best[0]):
                    best = (ok, kk, tt, price)
        out[eid] = (best[0], best[3]) if best else (None, None)
    return out


def test_asof_join_backward():
    rng = np.random.RandomState(7)
    n_l, n_r = 400, 150
    lk = rng.randint(0, 25, n_l)
    lt = rng.randint(0, 1000, n_l)
    rk = rng.randint(0, 25, n_r)
    rt = rng.randint(0, 1000, n_r)
    # force equal-timestamp right duplicates (tie-break = max orderkey)
    rk[10], rt[10], rk[11], rt[11] = 3, 500, 3, 500
    lk[0], lt[0] = 3, 500
    lev = [(i, int(lk[i]), int(lt[i])) for i in range(n_l)]
    ror = [
        (i, int(rk[i]), int(rt[i]), float(i) * 1.5) for i in range(n_r)
    ]
    left = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([e[0] for e in lev], pa.int64()),
                "user_id": pa.array([e[1] for e in lev], pa.int64()),
                "ts": pa.array([e[2] for e in lev], pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in ror], pa.int64()),
                "o_custkey": pa.array([r[1] for r in ror], pa.int64()),
                "o_orderdate": pa.array([r[2] for r in ror], pa.int64()),
                "o_totalprice": pa.array([r[3] for r in ror], pa.float64()),
            }
        )
    )
    out = asof_join(
        left,
        right,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_value_cols=["o_orderkey", "o_totalprice"],
        right_tiebreak="o_orderkey",
        num_parts=3,
    )
    t = ds_to_table(out)
    assert t.num_rows == n_l
    got = dict(
        zip(
            t.column("event_id").to_pylist(),
            zip(
                t.column("o_orderkey").to_pylist(),
                t.column("o_totalprice").to_pylist(),
            ),
        )
    )
    assert got == _brute(lev, ror)
    # the planted tie resolves to the larger orderkey (11)
    assert got[0][0] == 11


def _brute_fwd(levents, rorders):
    out = {}
    for eid, k, t in levents:
        best = None
        for ok, kk, tt, price in rorders:
            if kk == k and tt >= t:
                if best is None or (-tt, ok) > (-best[2], best[0]):
                    best = (ok, kk, tt, price)
        out[eid] = (best[0], best[3]) if best else (None, None)
    return out


def test_asof_join_forward():
    rng = np.random.RandomState(11)
    n_l, n_r = 300, 120
    lk = rng.randint(0, 20, n_l)
    lt = rng.randint(0, 1000, n_l)
    rk = rng.randint(0, 20, n_r)
    rt = rng.randint(0, 1000, n_r)
    # equal-timestamp right duplicates (tie = max orderkey) + an exact
    # left==right timestamp hit (forward INCLUSIVE)
    rk[5], rt[5], rk[6], rt[6] = 4, 700, 4, 700
    lk[0], lt[0] = 4, 700
    lev = [(i, int(lk[i]), int(lt[i])) for i in range(n_l)]
    ror = [
        (i, int(rk[i]), int(rt[i]), float(i) * 2.5) for i in range(n_r)
    ]
    left = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([e[0] for e in lev], pa.int64()),
                "user_id": pa.array([e[1] for e in lev], pa.int64()),
                "ts": pa.array([e[2] for e in lev], pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in ror], pa.int64()),
                "o_custkey": pa.array([r[1] for r in ror], pa.int64()),
                "o_orderdate": pa.array([r[2] for r in ror], pa.int64()),
                "o_totalprice": pa.array([r[3] for r in ror], pa.float64()),
            }
        )
    )
    out = asof_join(
        left,
        right,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_value_cols=["o_orderkey", "o_totalprice"],
        right_tiebreak="o_orderkey",
        num_parts=4,
        direction="forward",
    )
    t = ds_to_table(out)
    assert t.num_rows == n_l
    got = dict(
        zip(
            t.column("event_id").to_pylist(),
            zip(
                t.column("o_orderkey").to_pylist(),
                t.column("o_totalprice").to_pylist(),
            ),
        )
    )
    assert got == _brute_fwd(lev, ror)
