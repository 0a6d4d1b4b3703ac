"""Oracle tests for kernels/partition_compare.py — brute-force numpy
implementations of Rand/ARI/NMI/VI/split-join computed directly from
the raw label arrays (independent of the distributed reduction path),
plus hand-checked small fixtures and degenerate conventions."""

from __future__ import annotations

import math

import numpy as np
import pytest
import ray.data

from igraph_ray.kernels.partition_compare import compare_partitions


def _brute(a: np.ndarray, b: np.ndarray) -> dict:
    n = len(a)
    ua, ia = np.unique(a, return_inverse=True)
    ub, ib = np.unique(b, return_inverse=True)
    cont = np.zeros((len(ua), len(ub)), dtype=np.int64)
    np.add.at(cont, (ia, ib), 1)
    ma, mb = cont.sum(axis=1), cont.sum(axis=0)

    def c2(x):
        return int(np.sum(x.astype(object) * (x.astype(object) - 1) // 2))

    p_ij, p_a, p_b = c2(cont.ravel()), c2(ma), c2(mb)
    T = n * (n - 1) // 2
    rand = float(T + 2 * p_ij - p_a - p_b) / float(T) if T else 1.0
    den = (p_a + p_b) * T - 2 * p_a * p_b
    ari = float(2 * (p_ij * T - p_a * p_b)) / float(den) if den else 1.0

    def xlx(x):
        xf = x[x > 0].astype(float)
        return float(np.sum(xf * np.log(xf)))

    h_a = math.log(n) - xlx(ma) / n
    h_b = math.log(n) - xlx(mb) / n
    mi = max(xlx(cont.ravel()) / n - xlx(ma) / n - xlx(mb) / n + math.log(n), 0.0)
    nmi = 2 * mi / (h_a + h_b) if (h_a + h_b) > 0 else 1.0
    vi = max(h_a + h_b - 2 * mi, 0.0)
    sj = 2 * n - int(cont.max(axis=1).sum()) - int(cont.max(axis=0).sum())
    return dict(
        pairs_ij=p_ij, pairs_a=p_a, pairs_b=p_b, rand=rand,
        adjusted_rand=ari, nmi=nmi, vi=vi, split_join=sj,
        n_labels_a=len(ua), n_labels_b=len(ub),
    )


def _run(a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    ds = ray.data.from_items(
        [{"la": str(x), "lb": str(y)} for x, y in zip(a, b)]
    )
    return compare_partitions(ds, "la", "lb").iloc[0], _brute(a, b)


@pytest.mark.parametrize("seed,ka,kb", [(0, 3, 3), (1, 5, 2), (2, 7, 7)])
def test_random_labelings_vs_brute(seed, ka, kb):
    rng = np.random.default_rng(seed)
    n = 500
    a = rng.integers(0, ka, n)
    b = (a + (rng.random(n) < 0.3) * rng.integers(1, kb + 1, n)) % kb
    got, want = _run(a, b)
    for k in ("pairs_ij", "pairs_a", "pairs_b", "split_join",
              "n_labels_a", "n_labels_b"):
        assert got[k] == want[k], k
    for gk, wk in (("rand_index", "rand"), ("adjusted_rand", "adjusted_rand"),
                   ("nmi", "nmi"), ("vi", "vi")):
        assert got[gk] == pytest.approx(want[wk], abs=1e-12), gk
    assert got["n"] == n


def test_identical_partitions():
    a = np.array([0, 0, 1, 1, 2, 2, 2])
    got, _ = _run(a, a)
    assert got["rand_index"] == 1.0
    assert got["adjusted_rand"] == 1.0
    assert got["nmi"] == pytest.approx(1.0)
    assert got["vi"] == 0.0
    assert got["split_join"] == 0


def test_trivial_single_cluster_both():
    a = np.zeros(10, dtype=int)
    got, _ = _run(a, a)
    assert got["rand_index"] == 1.0 and got["adjusted_rand"] == 1.0
    assert got["nmi"] == 1.0 and got["vi"] == 0.0


def test_independent_vs_refinement():
    # refinement of A into B: every B-cell inside one A-cell
    a = np.repeat([0, 1], 50)
    b = np.repeat([0, 1, 2, 3], 25)
    got, want = _run(a, b)
    assert got["adjusted_rand"] == pytest.approx(want["adjusted_rand"])
    # VI between a partition and its refinement = H(B|A)
    assert got["vi"] == pytest.approx(math.log(2), abs=1e-12)


def test_exact_reduce_matches_object_path():
    # force the arbitrary-precision branch indirectly via _comb2_exact
    from igraph_ray.kernels.partition_compare import _comb2_exact

    big = np.array([2**33, 2**33, 5], dtype=np.int64)
    want = sum(int(c) * (int(c) - 1) // 2 for c in big)
    assert _comb2_exact(big) == want
