"""Grouped exact statistics: mode and Pearson correlation.

Both follow the repo's exact-sufficient-statistics discipline
(`kernels/partition_compare.py`): integer inputs (or fixed-decimal
floats scaled to exact ints) reduce to per-group integer sums carried
as decimal strings (arbitrary precision — no silent int64 wrap at any
scale), and the final float is ONE fixed IEEE expression over those
exact ints, so a DuckDB twin computing the same HUGEINT sums matches
bitwise.

- ``grouped_mode``: most frequent value per group, ties broken by the
  smallest value (deterministic; DuckDB twin = ROW_NUMBER ORDER BY
  cnt DESC, value ASC).  One (group, value) count shuffle + one
  per-group argmax over the distinct-value table — per-group memory is
  bounded by the value domain, not the row count.
- ``grouped_pearson``: r over fixed-decimal columns via exact
  (n, Σx, Σy, Σxy, Σx², Σy²); one pre-combined partials pass + one
  tiny per-group reduce.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data

_INT64_SAFE = 2.0**62


def grouped_mode(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
) -> ray.data.Dataset:
    """(group, mode, n) — the most frequent value of ``value_col`` per
    group (n = its multiplicity); ties broken by smallest value."""
    counts = ds.groupby([group_col, value_col]).count()

    def argmax(group: pa.Table) -> pa.Table:
        c = group.column("count()").to_numpy(zero_copy_only=False)
        v = group.column(value_col).to_pylist()
        best = 0
        for i in range(1, len(v)):
            if c[i] > c[best] or (c[i] == c[best] and v[i] < v[best]):
                best = i
        return pa.table(
            {
                group_col: group.column(group_col).slice(best, 1),
                "mode": group.column(value_col).slice(best, 1),
                "n": pa.array([int(c[best])], pa.int64()),
            }
        )

    return counts.groupby(group_col).map_groups(
        argmax, batch_format="pyarrow"
    )


def _dstr(x: np.ndarray) -> str:
    """Exact decimal-string sum of an int64 array (Python-int path when
    a float bound says int64 could wrap)."""
    if len(x) == 0:
        return "0"
    if float(np.sum(np.abs(x).astype(np.float64))) < _INT64_SAFE:
        return str(int(np.sum(x)))
    return str(sum(int(v) for v in x.tolist()))


def grouped_pearson(
    ds: ray.data.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
    x_decimals: int = 0,
    y_decimals: int = 2,
) -> ray.data.Dataset:
    """(group, n, corr) — Pearson r between two fixed-decimal columns.

    ``x_decimals``/``y_decimals`` declare the decimal precision at
    which the float columns are EXACT (e.g. prices in cents ⇒ 2); the
    scaled values are rounded to int64 and every sufficient statistic
    is an exact integer.  Final r = num / (sqrt(dx)·sqrt(dy)) with
    num = n·Σxy − Σx·Σy, dx = n·Σx² − (Σx)², dy likewise — one fixed
    IEEE chain over exact ints (bitwise SQL-twinnable); degenerate
    groups (dx·dy = 0) report r = 0.0.
    """
    xs = 10.0**x_decimals
    ys = 10.0**y_decimals

    def partials(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        x = np.rint(
            batch.column(x_col).to_numpy(zero_copy_only=False) * xs
        ).astype(np.int64)
        y = np.rint(
            batch.column(y_col).to_numpy(zero_copy_only=False) * ys
        ).astype(np.int64)
        uniq, inv = np.unique(g.to_pylist(), return_inverse=True)
        rows: dict[str, list] = {
            group_col: [],
            "n": [],
            "sx": [],
            "sy": [],
            "sxy": [],
            "sxx": [],
            "syy": [],
        }
        for i, gv in enumerate(uniq):
            m = inv == i
            xi, yi = x[m], y[m]
            rows[group_col].append(gv)
            rows["n"].append(str(int(m.sum())))
            rows["sx"].append(_dstr(xi))
            rows["sy"].append(_dstr(yi))
            # products can exceed int64 — go through Python ints when
            # the float bound trips
            for key, arr in (
                ("sxy", (xi, yi)),
                ("sxx", (xi, xi)),
                ("syy", (yi, yi)),
            ):
                a, b = arr
                bound = float(
                    np.sum(np.abs(a.astype(np.float64)) * np.abs(b.astype(np.float64)))
                )
                if bound < _INT64_SAFE:
                    rows[key].append(str(int(np.sum(a * b))))
                else:
                    rows[key].append(
                        str(
                            sum(
                                int(p) * int(q)
                                for p, q in zip(a.tolist(), b.tolist())
                            )
                        )
                    )
        return pa.table(
            {
                group_col: pa.array(rows[group_col]),
                **{
                    k: pa.array(rows[k], pa.string())
                    for k in ("n", "sx", "sy", "sxy", "sxx", "syy")
                },
            }
        )

    parts = ds.select_columns([group_col, x_col, y_col]).map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    )

    def reduce(group: pa.Table) -> pa.Table:
        n = sum(int(v) for v in group.column("n").to_pylist())
        sx = sum(int(v) for v in group.column("sx").to_pylist())
        sy = sum(int(v) for v in group.column("sy").to_pylist())
        sxy = sum(int(v) for v in group.column("sxy").to_pylist())
        sxx = sum(int(v) for v in group.column("sxx").to_pylist())
        syy = sum(int(v) for v in group.column("syy").to_pylist())
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        if dx > 0 and dy > 0:
            r = float(num) / (math.sqrt(float(dx)) * math.sqrt(float(dy)))
        else:
            r = 0.0
        return pa.table(
            {
                group_col: group.column(group_col).slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "corr": pa.array([r], pa.float64()),
            }
        )

    return parts.groupby(group_col).map_groups(
        reduce, batch_format="pyarrow"
    )


def grouped_ols(
    ds: ray.data.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
    x_decimals: int = 0,
    y_decimals: int = 2,
) -> ray.data.Dataset:
    """(group, n, slope, intercept) — per-group simple linear
    regression y ≈ slope·x + intercept from the same exact integer
    sufficient statistics as ``grouped_pearson``:
    slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) and
    intercept = (Σy − slope·Σx)/n, each ONE fixed IEEE chain over the
    exact ints (bitwise SQL-twinnable, descaled at the end);
    degenerate groups (constant x) report slope = 0, intercept =
    mean y."""
    xs = 10.0**x_decimals
    ys = 10.0**y_decimals

    def partials(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        x = np.rint(
            batch.column(x_col).to_numpy(zero_copy_only=False) * xs
        ).astype(np.int64)
        y = np.rint(
            batch.column(y_col).to_numpy(zero_copy_only=False) * ys
        ).astype(np.int64)
        uniq, inv = np.unique(g.to_pylist(), return_inverse=True)
        rows = {group_col: [], "n": [], "sx": [], "sy": [], "sxy": [], "sxx": []}
        for i, gv in enumerate(uniq):
            m = inv == i
            xi, yi = x[m], y[m]
            rows[group_col].append(gv)
            rows["n"].append(str(int(m.sum())))
            rows["sx"].append(_dstr(xi))
            rows["sy"].append(_dstr(yi))
            for key, (a, b) in (("sxy", (xi, yi)), ("sxx", (xi, xi))):
                bound = float(
                    np.sum(
                        np.abs(a.astype(np.float64))
                        * np.abs(b.astype(np.float64))
                    )
                )
                if bound < _INT64_SAFE:
                    rows[key].append(str(int(np.sum(a * b))))
                else:
                    rows[key].append(
                        str(
                            sum(
                                int(p) * int(q)
                                for p, q in zip(a.tolist(), b.tolist())
                            )
                        )
                    )
        return pa.table(
            {
                group_col: pa.array(rows[group_col]),
                **{
                    k: pa.array(rows[k], pa.string())
                    for k in ("n", "sx", "sy", "sxy", "sxx")
                },
            }
        )

    parts = ds.select_columns([group_col, x_col, y_col]).map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    )

    def reduce(group: pa.Table) -> pa.Table:
        n = sum(int(v) for v in group.column("n").to_pylist())
        sx = sum(int(v) for v in group.column("sx").to_pylist())
        sy = sum(int(v) for v in group.column("sy").to_pylist())
        sxy = sum(int(v) for v in group.column("sxy").to_pylist())
        sxx = sum(int(v) for v in group.column("sxx").to_pylist())
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        if dx > 0:
            # slope/intercept in SCALED units, then descale — the
            # fixed chain the SQL twin replays
            slope_s = float(num) / float(dx)
            inter_s = (float(sy) - slope_s * float(sx)) / float(n)
            slope = slope_s / (ys / xs)
            intercept = inter_s / ys
        else:
            slope = 0.0
            intercept = (float(sy) / float(n)) / ys if n else 0.0
        return pa.table(
            {
                group_col: group.column(group_col).slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "slope": pa.array([slope], pa.float64()),
                "intercept": pa.array([intercept], pa.float64()),
            }
        )

    return parts.groupby(group_col).map_groups(
        reduce, batch_format="pyarrow"
    )
