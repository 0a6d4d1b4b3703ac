"""Model-based document quality scoring — the trainable stand-in for
a fastText-style quality classifier (the heuristic side is
``functions/text.py``: gopher_rules / quality_score).

``train_logreg`` fits L2-regularized logistic regression by
full-batch gradient descent where each iteration is ONE
``map_batches`` pass emitting per-batch gradient partials (the
k-means/PCA sufficient-statistics shape: X^T(σ(Xw)−y) and the loss,
pre-combined per block, reduced on the driver — O(d) driver state).
Deterministic: zero init, fixed iteration count, float64 partials.

``score_logreg`` applies the weights in a single streaming map.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _features(batch: pa.Table, cols: list[str]) -> np.ndarray:
    x = np.stack(
        [
            batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols
        ],
        axis=1,
    )
    return np.concatenate([x, np.ones((len(x), 1))], axis=1)  # bias


def train_logreg(
    ds: ray.data.Dataset,
    feature_cols: list[str],
    label_col: str,
    iters: int = 200,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> tuple[np.ndarray, list[float]]:
    """Returns ``(weights [d+1 incl. bias], loss history)``."""
    d = len(feature_cols) + 1
    w = np.zeros(d)
    n_total = ds.count()
    losses: list[float] = []
    data = ds.select_columns(feature_cols + [label_col]).materialize()
    for _ in range(iters):
        wref = ray.put(w)

        def partial(batch: pa.Table, _wr=wref) -> pa.Table:
            ww = ray.get(_wr)
            x = _features(batch, feature_cols)
            y = (
                batch.column(label_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
            z = x @ ww
            p = 1.0 / (1.0 + np.exp(-z))
            g = x.T @ (p - y)
            # numerically-stable log-loss
            loss = float(
                np.sum(np.logaddexp(0.0, z) - y * z)
            )
            return pa.table(
                {
                    "g": pa.array([g.tolist()], pa.list_(pa.float64())),
                    "loss": pa.array([loss], pa.float64()),
                }
            )

        grad = np.zeros(d)
        loss = 0.0
        for b in data.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None):
            for row in b.column("g").to_pylist():
                grad += np.asarray(row)
            loss += float(
                b.column("loss").to_numpy(zero_copy_only=False).sum()
            )
        grad = grad / n_total + l2 * w
        w = w - lr * grad
        losses.append(loss / n_total)
    return w, losses


def score_logreg(
    ds: ray.data.Dataset,
    weights: np.ndarray,
    feature_cols: list[str],
    out_col: str = "quality_prob",
) -> ray.data.Dataset:
    wref = ray.put(np.asarray(weights, np.float64))

    def _f(batch: pa.Table) -> pa.Table:
        w = ray.get(wref)
        x = _features(batch, feature_cols)
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        return batch.append_column(out_col, pa.array(p))

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)
