"""Exact histogram-refinement quantiles vs sort oracle + DuckDB
quantile_disc (pins the ceil(q*n)-1 rank semantics)."""

import math

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.quantile import exact_quantiles_int

QS = [0.01, 0.25, 0.5, 0.75, 0.95, 0.99]


def _check(vals: np.ndarray, branch: int):
    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(vals.astype(np.int64))})
    ).repartition(5)
    got = exact_quantiles_int(ds, "x", QS, branch=branch)
    got = dict(
        zip(got.column("q").to_pylist(), got.column("value").to_pylist())
    )
    s = np.sort(vals)
    n = len(s)
    for q in QS:
        want = int(s[max(0, math.ceil(q * n) - 1)])
        assert got[q] == want, (q, got[q], want)
    # and the rank rule matches duckdb quantile_disc
    con = duckdb.connect()
    con.register("t", pa.table({"x": pa.array(vals.astype(np.int64))}))
    for q in QS:
        (dk,) = con.sql(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()
        assert got[q] == dk, (q, got[q], dk)


def test_quantiles_wide_range():
    rng = np.random.default_rng(23)
    _check(rng.integers(-10**9, 10**9, 4000), branch=64)


def test_quantiles_narrow_and_duplicates():
    rng = np.random.default_rng(5)
    _check(rng.integers(0, 7, 3000), branch=4)


def test_quantiles_constant():
    _check(np.full(100, 42), branch=16)


def test_grouped_quantiles_vs_duckdb():
    """grouped_quantiles_int matches quantile_disc per group exactly,
    including duplicate-heavy, singleton and constant groups."""
    from igraph_ray.stages.quantile import grouped_quantiles_int

    rng = np.random.default_rng(7)
    g = rng.choice(["a", "b", "c", "d", "solo"], 4000,
                   p=[0.4, 0.3, 0.2, 0.0997, 0.0003])
    x = np.where(
        g == "c", 42, rng.integers(-1000, 1000, 4000)
    ).astype(np.int64)
    t = pa.table({"g": pa.array(g.tolist()), "x": pa.array(x)})
    ds = ray.data.from_arrow(t).repartition(7)
    out = pa.concat_tables(
        grouped_quantiles_int(ds, "g", "x", QS).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    got = {
        (r["g"], r["q"]): r["value"] for r in out.to_pylist()
    }
    con = duckdb.connect()
    con.register("t", t)
    n_groups = con.sql("SELECT COUNT(DISTINCT g) FROM t").fetchone()[0]
    assert len(got) == n_groups * len(QS)
    for q in QS:
        for grp, want in con.sql(
            f"SELECT g, quantile_disc(x, {q}) FROM t GROUP BY g"
        ).fetchall():
            assert got[(grp, q)] == want, (grp, q, got[(grp, q)], want)
