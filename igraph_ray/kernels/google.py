"""K6 — dense Google matrix (SURVEY.md §2.1 K6).

``G = α·A_norm + dangling fixups + (1−α)·p`` as a dense numpy matrix —
the reference's debug/small-graph formulation
(``pagerank_alg.py:176-268``).  Deliberately NOT distributed: it is a
test oracle for the distributed K1 kernel and raises beyond a small
vertex-count guard.
"""

from __future__ import annotations

import numpy as np

_MAX_DENSE_VERTICES = 20_000


def google_matrix(
    src: np.ndarray,
    dst: np.ndarray,
    weight: np.ndarray | None = None,
    num_vertices: int | None = None,
    alpha: float = 0.85,
    personalization: dict[int, float] | None = None,
    dangling: dict[int, float] | None = None,
) -> np.ndarray:
    """Dense stochastic Google matrix over vids 0..n-1."""
    n = int(num_vertices or (max(src.max(), dst.max()) + 1 if len(src) else 0))
    if n > _MAX_DENSE_VERTICES:
        raise ValueError(
            f"google_matrix is a dense small-graph oracle (n={n} > "
            f"{_MAX_DENSE_VERTICES}); use kernels.pagerank for scale"
        )
    w = weight if weight is not None else np.ones(len(src))
    a = np.zeros((n, n))
    np.add.at(a, (src, dst), w)

    if personalization is None:
        p = np.full(n, 1.0 / max(n, 1))
    else:
        s = float(sum(personalization.values()))
        p = np.array([personalization.get(v, 0.0) / s for v in range(n)])
    if dangling is None:
        dw = p
    else:
        s = float(sum(dangling.values()))
        dw = np.array([dangling.get(v, 0.0) / s for v in range(n)])

    out = a.sum(axis=1)
    is_dangling = out == 0
    a[is_dangling] = dw
    out = a.sum(axis=1)
    a = a / out[:, None]
    return alpha * a + (1 - alpha) * p


def pagerank_dense(
    src: np.ndarray,
    dst: np.ndarray,
    num_vertices: int,
    alpha: float = 0.85,
    max_iter: int = 1000,
    tol: float = 1e-12,
    **kw,
) -> np.ndarray:
    """Power iteration on the dense Google matrix (oracle)."""
    g = google_matrix(src, dst, num_vertices=num_vertices, alpha=alpha, **kw)
    n = num_vertices
    x = np.full(n, 1.0 / max(n, 1))
    for _ in range(max_iter):
        x_new = x @ g
        if np.abs(x_new - x).sum() < n * tol:
            return x_new
        x = x_new
    return x
