"""Power-law fit vs a brute-force CSN reference and known-alpha
recovery."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.plfit import (
    fit_power_law,
    fit_power_law_histogram,
)


def _brute_csn(values):
    """Raw-sample CSN scan (no histogram shortcuts)."""
    x = np.sort(np.asarray(values, dtype=np.float64))
    x = x[x >= 1.0]
    best = None
    for xmin in np.unique(x):
        tail = x[x >= xmin]
        n = len(tail)
        if n < 2:
            continue
        s = np.sum(np.log(tail / xmin))
        if s <= 0:
            continue
        alpha = 1.0 + n / s
        dvals, counts = np.unique(tail, return_counts=True)
        ecdf = np.cumsum(counts) / n
        model = 1.0 - np.power(dvals / xmin, 1.0 - alpha)
        ks = float(np.max(np.abs(ecdf - model)))
        if best is None or ks < best[0] or (ks == best[0] and xmin < best[1]):
            best = (ks, float(xmin), alpha, n)
    return best


def test_histogram_fit_matches_bruteforce():
    rng = np.random.RandomState(7)
    vals = np.floor(rng.pareto(1.8, 4000) + 1).astype(np.int64)
    dv, dc = np.unique(vals, return_counts=True)
    ours = fit_power_law_histogram(dv, dc)
    ks, xmin, alpha, n = _brute_csn(vals)
    assert ours["xmin"] == xmin
    assert abs(ours["alpha"] - alpha) < 1e-12
    assert ours["n_tail"] == n
    assert abs(ours["ks"] - ks) < 1e-12


def test_recovers_known_alpha():
    # deterministic inverse-transform samples from a continuous
    # power law with alpha = 2.5, xmin = 1
    u = (np.arange(1, 20001) - 0.5) / 20000.0
    x = np.power(1.0 - u, -1.0 / 1.5)  # CDF^-1 for alpha=2.5
    dv, dc = np.unique(np.round(x, 6), return_counts=True)
    res = fit_power_law_histogram(dv, dc)
    assert abs(res["alpha"] - 2.5) < 0.1
    assert res["xmin"] < 2.0


def test_dataset_entrypoint(ray_session):
    rng = np.random.RandomState(3)
    vals = np.floor(rng.pareto(1.5, 1000) + 1).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"degree": pa.array(vals)}))
    res = fit_power_law(ds)
    dv, dc = np.unique(vals, return_counts=True)
    ref = fit_power_law_histogram(dv, dc)
    assert res == ref


def test_degenerate_inputs():
    assert fit_power_law_histogram(
        np.array([5]), np.array([1])
    )["n_tail"] == 0
    res = fit_power_law_histogram(np.array([0]), np.array([10]))
    assert res["n_tail"] == 0
