"""Distributed PCA over an embedding column — the dimensionality-
reduction step of an embedding pipeline (whitening / compaction before
ANN or clustering).

Ray-Data shape (scale notes):

* Pass 1 is map-only: each batch emits ONE row holding its partial
  sufficient statistics — count, per-dimension sum (D floats) and the
  D×D Gram matrix flattened (D² floats).  A single tiny reduce (sum of
  per-batch rows on the driver; at most one small row per block) gives
  the exact global mean and covariance — the fact table is never
  shuffled and never materialized.  D is the embedding width (64
  here); D² doubles per block is negligible against the data.
* The D×D eigendecomposition runs on the driver (``numpy.linalg.eigh``
  on a 64×64 symmetric matrix — microseconds), mirroring the standard
  big-data PCA split: distributed moments, local spectral solve.
* Pass 2 is map-only projection: ``(X - mean) @ components`` per
  batch, numpy matmul, components broadcast by closure capture (a few
  KB).

Deterministic sign convention: each component's entry of largest
absolute value is made positive, so outputs are reproducible across
runs and partitionings (eigenvector sign is otherwise arbitrary).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    m = flat.to_numpy(zero_copy_only=False).astype(np.float64)
    return m.reshape(len(arr), -1)


def pca_fit(
    ds: ray.data.Dataset, vec_col: str, n_components: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact covariance PCA: returns ``(mean [D], components [D, k],
    explained_variance [k])``, components in descending-eigenvalue
    order with the deterministic sign convention."""

    def partials(batch: pa.Table) -> pa.Table:
        x = _batch_matrix(batch, vec_col)
        n, d = x.shape
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "s": pa.array(
                    [x.sum(axis=0).tolist()], pa.list_(pa.float64())
                ),
                "g": pa.array(
                    [(x.T @ x).reshape(-1).tolist()],
                    pa.list_(pa.float64()),
                ),
            }
        )

    rows = ds.map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    n = sum(r["n"] for r in rows)
    if n < 2:
        raise ValueError("need at least 2 vectors for PCA")
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]) for r in rows], axis=0)
    d = len(s)
    mean = s / n
    # covariance = E[xxT] - mean meanT, unbiased n-1 normalization
    cov = (g.reshape(d, d) - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order]
    # deterministic sign: largest-|entry| coordinate positive
    for j in range(comps.shape[1]):
        i = int(np.argmax(np.abs(comps[:, j])))
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    return mean, comps, evals[order]


def pca_project(
    ds: ray.data.Dataset,
    id_col: str,
    vec_col: str,
    n_components: int,
) -> tuple[ray.data.Dataset, np.ndarray]:
    """Rows ``(<id>, projection [list<double>, k])`` plus the explained
    variances.  Two passes over the data, both map-only."""
    mean, comps, var = pca_fit(ds, vec_col, n_components)

    def project(batch: pa.Table) -> pa.Table:
        x = _batch_matrix(batch, vec_col)
        p = (x - mean) @ comps
        proj = pa.FixedSizeListArray.from_arrays(
            pa.array(np.ascontiguousarray(p).reshape(-1)), p.shape[1]
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                "projection": proj,
            }
        )

    out = ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
    return out, var
