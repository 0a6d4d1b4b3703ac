"""Distributed logistic regression vs a local numpy replay."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.functions.quality_model import score_logreg, train_logreg


def _table(n=400, seed=2):
    rng = np.random.default_rng(seed)
    x1 = rng.standard_normal(n)
    x2 = rng.standard_normal(n)
    # linearly separable-ish with noise-free labels
    y = ((2.0 * x1 - 1.5 * x2 + 0.3) > 0).astype(np.int64)
    return pa.table(
        {
            "f1": pa.array(x1),
            "f2": pa.array(x2),
            "label": pa.array(y),
        }
    )


def _local_gd(tbl, iters=200, lr=0.5, l2=1e-4):
    x = np.stack(
        [tbl.column("f1").to_numpy(), tbl.column("f2").to_numpy()], axis=1
    )
    x = np.concatenate([x, np.ones((len(x), 1))], axis=1)
    y = tbl.column("label").to_numpy().astype(np.float64)
    w = np.zeros(3)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        grad = x.T @ (p - y) / len(x) + l2 * w
        w = w - lr * grad
    return w


def test_logreg_matches_local_replay_and_separates():
    tbl = _table()
    ds = ray.data.from_arrow(tbl).repartition(num_blocks=4)
    w, losses = train_logreg(ds, ["f1", "f2"], "label")
    # distributed full-batch GD == local GD up to float reduction order
    assert np.allclose(w, _local_gd(tbl), atol=1e-9)
    # loss decreases
    assert losses[-1] < losses[0] / 2
    # scoring recovers the labels on separable data
    scored = score_logreg(ds, w, ["f1", "f2"])
    out = pa.concat_tables(
        scored.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    pred = (out.column("quality_prob").to_numpy() > 0.5).astype(np.int64)
    acc = (pred == out.column("label").to_numpy()).mean()
    assert acc > 0.95
