"""Distributed PCA vs dense numpy reference."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.functions.pca import pca_fit, pca_project
from tests.util import ds_to_table


def _make_ds(x, ids=None):
    n, d = x.shape
    if ids is None:
        ids = np.arange(n, dtype=np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(x.reshape(-1).astype(np.float32)), d
                ),
            }
        )
    ).repartition(4)


def _np_pca(x, k):
    mean = x.mean(axis=0)
    xc = x - mean
    cov = xc.T @ xc / (len(x) - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order]
    for j in range(k):
        i = int(np.argmax(np.abs(comps[:, j])))
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    return mean, comps, evals[order]


def test_pca_fit_matches_numpy():
    rng = np.random.default_rng(3)
    # anisotropic cloud: two dominant directions
    base = rng.normal(size=(200, 6))
    base[:, 0] *= 10.0
    base[:, 1] *= 4.0
    x = base.astype(np.float32).astype(np.float64)
    mean, comps, var = pca_fit(_make_ds(base.astype(np.float32)), "embedding", 3)
    mean_ref, comps_ref, var_ref = _np_pca(x, 3)
    assert np.allclose(mean, mean_ref, atol=1e-9)
    assert np.allclose(var, var_ref, rtol=1e-9)
    assert np.allclose(comps, comps_ref, atol=1e-8)
    assert var[0] >= var[1] >= var[2]


def test_pca_project():
    rng = np.random.default_rng(9)
    x32 = rng.normal(size=(120, 5)).astype(np.float32)
    x = x32.astype(np.float64)
    out, var = pca_project(_make_ds(x32), "vec_id", "embedding", 2)
    tbl = ds_to_table(out)
    got = {
        i: np.asarray(p)
        for i, p in zip(
            tbl.column("vec_id").to_pylist(),
            tbl.column("projection").to_pylist(),
        )
    }
    mean_ref, comps_ref, _ = _np_pca(x, 2)
    want = (x - mean_ref) @ comps_ref
    for i in range(len(x)):
        assert np.allclose(got[i], want[i], atol=1e-8), i
    # projections are centered
    tot = np.sum([got[i] for i in range(len(x))], axis=0)
    assert np.allclose(tot, 0.0, atol=1e-6)


def test_pca_determinism_across_partitionings():
    rng = np.random.default_rng(21)
    x32 = rng.normal(size=(90, 4)).astype(np.float32)
    m1, c1, v1 = pca_fit(_make_ds(x32), "embedding", 2)
    ds2 = _make_ds(x32).repartition(9)
    m2, c2, v2 = pca_fit(ds2, "embedding", 2)
    assert np.allclose(m1, m2, atol=1e-12)
    assert np.allclose(c1, c2, atol=1e-12)
    assert np.allclose(v1, v2, rtol=1e-12)
