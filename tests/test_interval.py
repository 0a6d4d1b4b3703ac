"""Band join and interval join vs brute-force oracles."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.interval import band_join, interval_join
from tests.util import ds_to_table


def _pairs_set(tbl, cols):
    return set(zip(*(tbl.column(c).to_pylist() for c in cols)))


def test_band_join_brute_force():
    rng = np.random.default_rng(23)
    n = 400
    key = rng.integers(0, 9, n).astype(np.int64)
    ts = rng.integers(0, 5_000, n).astype(np.int64)  # many bin crossings
    eid = np.arange(n, dtype=np.int64)
    band = 700
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(key),
                "ts": pa.array(ts),
                "event_id": pa.array(eid),
            }
        )
    ).repartition(5)
    got = ds_to_table(
        band_join(ds, "user_id", "ts", "event_id", band, num_parts=4)
    )
    got_pairs = _pairs_set(
        got, ("user_id", "l_event_id", "r_event_id", "dt_us")
    )
    want = set()
    for i in range(n):
        for j in range(n):
            dt = ts[j] - ts[i]
            if key[i] == key[j] and 0 < dt <= band:
                want.add((int(key[i]), int(eid[i]), int(eid[j]), int(dt)))
    assert got_pairs == want
    assert got.num_rows == len(want)  # no duplicate pair rows


def test_band_join_bin_boundaries():
    # timestamps pinned on exact bin edges: dt == band (kept, strict
    # upper bound is inclusive), dt == 0 (dropped, strict lower)
    band = 100
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1], pa.int64()),
                "ts": pa.array([0, 0, 100, 201], pa.int64()),
                "event_id": pa.array([10, 11, 12, 13], pa.int64()),
            }
        )
    )
    got = ds_to_table(band_join(ds, "user_id", "ts", "event_id", band))
    got_pairs = _pairs_set(got, ("l_event_id", "r_event_id", "dt_us"))
    assert got_pairs == {(10, 12, 100), (11, 12, 100)}


def test_interval_join_brute_force():
    rng = np.random.default_rng(31)
    n_p, n_iv = 300, 120
    width = 500
    pk = rng.integers(0, 7, n_p).astype(np.int64)
    pt = rng.integers(0, 4_000, n_p).astype(np.int64)
    pid = np.arange(n_p, dtype=np.int64)
    ik = rng.integers(0, 7, n_iv).astype(np.int64)
    ist = rng.integers(0, 4_000, n_iv).astype(np.int64)
    iid = np.arange(1000, 1000 + n_iv, dtype=np.int64)
    points = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(pk),
                "ts": pa.array(pt),
                "event_id": pa.array(pid),
            }
        )
    ).repartition(4)
    ivs = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(ik),
                "ts": pa.array(ist),
                "click_id": pa.array(iid),
            }
        )
    ).repartition(3)
    got = ds_to_table(
        interval_join(
            points,
            ivs,
            key_col="user_id",
            ts_col="ts",
            point_id_col="event_id",
            iv_key_col="user_id",
            iv_start_col="ts",
            iv_len_us=width,
            iv_id_col="click_id",
            num_parts=4,
        )
    )
    got_pairs = _pairs_set(
        got, ("user_id", "event_id", "click_id", "offset_us")
    )
    want = set()
    for i in range(n_p):
        for j in range(n_iv):
            off = pt[i] - ist[j]
            if pk[i] == ik[j] and 0 <= off < width:
                want.add((int(pk[i]), int(pid[i]), int(iid[j]), int(off)))
    assert got_pairs == want
    assert got.num_rows == len(want)
