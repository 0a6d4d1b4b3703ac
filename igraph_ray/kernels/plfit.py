"""Power-law degree-distribution fit (igraph ``igraph_power_law_fit``
surface; Clauset–Shalizi–Newman 2009 continuous MLE with KS-minimizing
xmin scan — the same estimator igraph's plfit uses in continuous
mode).

Distributed shape: everything reduces through the DEGREE HISTOGRAM —
one distributed ``groupby(degree).count()`` (tiny result: one row per
distinct degree) — after which the xmin scan is a vectorized
O(D^2) pass over that table on the driver (D = distinct degrees,
hundreds even on billion-vertex graphs, since degree values repeat).
No O(V) data leaves the cluster.

For each candidate xmin (every distinct degree value):

    alpha(xmin) = 1 + n_tail / sum_{d >= xmin} c_d * ln(d / xmin)
    KS(xmin)    = max_d | ECDF_tail(d) - (1 - (d / xmin)^(1 - alpha)) |

and the fit picks the xmin minimizing KS (ties -> smallest xmin).
Degrees below 1 are excluded (log undefined), matching plfit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count


def fit_power_law_histogram(
    deg_values: np.ndarray, deg_counts: np.ndarray
) -> dict:
    """CSN fit from a (degree value, count) histogram.  Returns
    ``{"xmin", "alpha", "n_tail", "ks"}``."""
    order = np.argsort(deg_values)
    d = deg_values[order].astype(np.float64)
    c = deg_counts[order].astype(np.float64)
    keep = d >= 1.0
    d, c = d[keep], c[keep]
    if len(d) == 0:
        return {"xmin": 0.0, "alpha": 0.0, "n_tail": 0, "ks": 0.0}

    logd = np.log(d)
    # suffix sums: tail size and tail sum of c*ln(d) per candidate
    n_suf = np.cumsum(c[::-1])[::-1]
    slog_suf = np.cumsum((c * logd)[::-1])[::-1]

    best = None
    for i in range(len(d)):
        xmin = d[i]
        n_tail = n_suf[i]
        if n_tail < 2:
            continue
        s = slog_suf[i] - n_tail * logd[i]
        if s <= 0:
            continue
        alpha = 1.0 + n_tail / s
        # KS over the tail: ECDF evaluated at the upper edge of each
        # distinct value vs the fitted continuous CDF at that value
        tail_d = d[i:]
        tail_c = c[i:]
        ecdf = np.cumsum(tail_c) / n_tail
        model = 1.0 - np.power(tail_d / xmin, 1.0 - alpha)
        ks = float(np.max(np.abs(ecdf - model)))
        cand = (ks, xmin, alpha, int(n_tail))
        if best is None or cand[0] < best[0] or (
            cand[0] == best[0] and cand[1] < best[1]
        ):
            best = cand
    if best is None:
        return {"xmin": float(d[0]), "alpha": 0.0, "n_tail": 0, "ks": 0.0}
    ks, xmin, alpha, n_tail = best
    return {"xmin": xmin, "alpha": alpha, "n_tail": n_tail, "ks": ks}


def fit_power_law(degrees: ray.data.Dataset, degree_col: str = "degree") -> dict:
    """CSN power-law fit of a per-vertex degree dataset: distributed
    histogram reduce, then the vectorized driver-side xmin scan."""
    hist = degrees.groupby(degree_col).aggregate(
        Count(degree_col, alias_name="n")
    )
    blocks = [
        b
        for b in hist.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    if not blocks:
        return {"xmin": 0.0, "alpha": 0.0, "n_tail": 0, "ks": 0.0}
    tbl = pa.concat_tables(blocks)
    return fit_power_law_histogram(
        tbl.column(degree_col).to_numpy(zero_copy_only=False),
        tbl.column("n").to_numpy(zero_copy_only=False),
    )
