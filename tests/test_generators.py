"""Deterministic distributed graph generators: exactness (gnm),
reproducibility across block layouts, and distribution shape."""

import numpy as np
import pyarrow as pa

from igraph_ray.sources.generators import (
    chung_lu_edges,
    gnm_edges,
    rmat_edges,
)
from tests.util import ds_to_table


def _pairs(tbl: pa.Table) -> set[tuple[int, int]]:
    return set(
        zip(tbl.column("src").to_pylist(), tbl.column("dst").to_pylist())
    )


def test_gnm_exact_distinct():
    n, m = 50, 400
    tbl = ds_to_table(gnm_edges(n, m, seed=7))
    assert tbl.num_rows == m
    got = _pairs(tbl)
    assert len(got) == m  # without replacement: all distinct
    for u, v in got:
        assert 0 <= u < v < n  # canonical, loop-free


def test_gnm_block_layout_invariant():
    # same seed ⇒ identical edge SET regardless of parallelism
    a = _pairs(ds_to_table(gnm_edges(40, 300, seed=3, override_num_blocks=1)))
    b = _pairs(ds_to_table(gnm_edges(40, 300, seed=3, override_num_blocks=8)))
    assert a == b
    c = _pairs(ds_to_table(gnm_edges(40, 300, seed=4)))
    assert a != c  # seed changes the sample


def test_gnm_full_domain_is_permutation():
    n = 30
    dom = n * (n - 1) // 2
    tbl = ds_to_table(gnm_edges(n, dom, seed=1))
    assert len(_pairs(tbl)) == dom  # every pair exactly once


def test_rmat_shape_and_determinism():
    tbl = ds_to_table(rmat_edges(scale=10, m=20_000, seed=5))
    assert tbl.num_rows == 20_000
    src = tbl.column("src").to_numpy(zero_copy_only=False)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False)
    assert src.min() >= 0 and max(src.max(), dst.max()) < 1024
    deg = np.bincount(np.concatenate([src, dst]), minlength=1024)
    # heavy tail: hottest vertex far above the mean degree
    assert deg.max() > 10 * deg.mean()
    again = ds_to_table(rmat_edges(scale=10, m=20_000, seed=5))
    assert _pairs(tbl) == _pairs(again)


def test_chung_lu_powerlaw_skew():
    n, m = 2000, 30_000
    tbl = ds_to_table(chung_lu_edges(n, m, alpha=2.3, seed=9))
    assert 0 < tbl.num_rows <= m  # loops dropped
    src = tbl.column("src").to_numpy(zero_copy_only=False)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False)
    assert src.min() >= 0 and max(src.max(), dst.max()) < n
    deg = np.bincount(np.concatenate([src, dst]), minlength=n)
    order = np.sort(deg)[::-1]
    # rank-1 vertex dominates; tail is sparse (power-law signature)
    assert order[0] > 20 * max(1, order[n // 2])
    again = ds_to_table(chung_lu_edges(n, m, alpha=2.3, seed=9))
    assert tbl.sort_by([("src", "ascending"), ("dst", "ascending")]).equals(
        again.sort_by([("src", "ascending"), ("dst", "ascending")])
    )


def test_watts_strogatz_ring_and_rewire():
    import numpy as np

    from igraph_ray.sources.generators import watts_strogatz_edges

    n, k = 200, 4
    # beta = 0: the exact ring lattice
    ds = watts_strogatz_edges(n, k, beta=0.0, seed=7)
    t = ds_to_table(ds)
    pairs = set(
        zip(t.column("src").to_pylist(), t.column("dst").to_pylist())
    )
    want = {(i, (i + j) % n) for i in range(n) for j in (1, 2)}
    assert pairs == want

    # beta = 0.3: edge count preserved, src side untouched, a
    # nontrivial fraction rewired away from the lattice
    ds2 = watts_strogatz_edges(n, k, beta=0.3, seed=7)
    t2 = ds_to_table(ds2)
    assert t2.num_rows == n * k // 2
    src = np.asarray(t2.column("src").to_pylist())
    dst = np.asarray(t2.column("dst").to_pylist())
    assert set(src.tolist()) == set(range(n))
    lattice = np.array(
        [((d - s) % n) in (1, 2) for s, d in zip(src, dst)]
    )
    frac_rewired = 1.0 - lattice.mean()
    assert 0.15 < frac_rewired < 0.45  # ~beta, minus back-luck hits

    # determinism across block layouts
    t3 = ds_to_table(
        watts_strogatz_edges(n, k, beta=0.3, seed=7, override_num_blocks=9)
    )
    assert sorted(zip(t3.column("src").to_pylist(), t3.column("dst").to_pylist())) == sorted(zip(src.tolist(), dst.tolist()))


def test_barabasi_albert_structure():
    from igraph_ray.sources.generators import barabasi_albert_edges

    n, d = 2000, 3
    t = ds_to_table(barabasi_albert_edges(n, d, seed=1))
    src = t.column("src").to_numpy().astype(np.int64)
    dst = t.column("dst").to_numpy().astype(np.int64)
    assert len(src) == n * d
    # every target is an already-existing vertex
    assert (dst <= src).all()
    deg = np.bincount(np.concatenate([src, dst]), minlength=n)
    assert deg.mean() == 2 * d
    # preferential attachment: heavy tail + rich-get-richer
    assert deg.max() >= 20 * d
    assert deg[:100].mean() > 3 * deg[-1000:].mean()


def test_barabasi_albert_deterministic_partition_invariant():
    from igraph_ray.sources.generators import barabasi_albert_edges

    a = ds_to_table(barabasi_albert_edges(500, 2, seed=9)).sort_by(
        [("src", "ascending"), ("dst", "ascending")]
    )
    b = ds_to_table(
        barabasi_albert_edges(500, 2, seed=9, override_num_blocks=7)
    ).sort_by([("src", "ascending"), ("dst", "ascending")])
    assert a.equals(b)
    c = ds_to_table(barabasi_albert_edges(500, 2, seed=10)).sort_by(
        [("src", "ascending"), ("dst", "ascending")]
    )
    assert not a.equals(c)


def test_configuration_model_degree_sequence_exact():
    from igraph_ray.sources.generators import configuration_model_edges

    rng = np.random.default_rng(3)
    deg = rng.integers(1, 8, size=200)
    if deg.sum() % 2:
        deg[0] += 1
    t = ds_to_table(configuration_model_edges(deg, seed=5))
    src = t.column("src").to_numpy()
    dst = t.column("dst").to_numpy()
    got = np.bincount(np.concatenate([src, dst]), minlength=200)
    assert np.array_equal(got, deg)  # exact sequence, loops count 2
    # deterministic + partition-invariant
    t2 = ds_to_table(
        configuration_model_edges(deg, seed=5, override_num_blocks=7)
    )
    a = t.sort_by([("src", "ascending"), ("dst", "ascending")])
    b = t2.sort_by([("src", "ascending"), ("dst", "ascending")])
    assert a.equals(b)
    # odd sum rejected
    import pytest

    with pytest.raises(ValueError):
        configuration_model_edges(np.array([1, 1, 1]))


def test_grg_exact_vs_bruteforce():
    """grg_edges matches the O(n²) brute-force oracle exactly: same
    splitmix positions, every pair within radius, none outside."""
    from igraph_ray.sources.generators import _hash2, grg_edges

    n, radius, seed = 400, 0.06, 9
    ids = np.arange(n, dtype=np.uint64)
    x = _hash2(ids, 1, seed).astype(np.float64) * 2.0**-64
    y = _hash2(ids, 2, seed).astype(np.float64) * 2.0**-64
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    near = dx * dx + dy * dy <= radius * radius
    ii, jj = np.nonzero(np.triu(near, k=1))
    want = set(zip(ii.tolist(), jj.tolist()))
    got = _pairs(ds_to_table(grg_edges(n, radius, seed=seed)))
    assert got == want
    assert len(got) > 50  # non-trivial fixture


def test_grg_partition_invariant_and_canonical():
    from igraph_ray.sources.generators import grg_edges

    a = _pairs(ds_to_table(grg_edges(300, 0.07, seed=2, override_num_blocks=1)))
    b = _pairs(ds_to_table(grg_edges(300, 0.07, seed=2, override_num_blocks=9)))
    assert a == b
    for u, v in a:
        assert 0 <= u < v < 300  # canonical src<dst, no loops
    c = _pairs(ds_to_table(grg_edges(300, 0.07, seed=3)))
    assert a != c


def test_grg_bad_radius_rejected():
    import pytest

    from igraph_ray.sources.generators import grg_edges

    with pytest.raises(ValueError):
        grg_edges(10, 0.0)
    with pytest.raises(ValueError):
        grg_edges(10, 1.5)


def test_sbm_exact_vs_bruteforce():
    """sbm_edges matches the per-pair brute-force replay exactly, and
    per-block-pair densities track the pref matrix."""
    from igraph_ray.sources.generators import _hash2, sbm_edges

    sizes = [40, 35, 25]
    P = [[0.45, 0.06, 0.02], [0.06, 0.4, 0.05], [0.02, 0.05, 0.3]]
    seed = 13
    n = sum(sizes)
    starts = np.concatenate([[0], np.cumsum(sizes)])
    thr = np.array(
        [[int(p * (1 << 53)) for p in row] for row in P], np.int64
    )
    want = set()
    t = 0
    for u in range(n):
        for v in range(u + 1, n):
            r = int(_hash2(np.array([t], np.uint64), 7, seed)[0]) >> 11
            bu = int(np.searchsorted(starts, u, side="right")) - 1
            bv = int(np.searchsorted(starts, v, side="right")) - 1
            if r < thr[bu, bv]:
                want.add((u, v))
            t += 1
    got = _pairs(ds_to_table(sbm_edges(sizes, P, seed=seed)))
    assert got == want
    # density shape: diagonal blocks much denser than off-diagonal
    d00 = sum(1 for u, v in got if v < 40) / (40 * 39 / 2)
    d01 = sum(1 for u, v in got if u < 40 <= v < 75) / (40 * 35)
    assert d00 > 4 * d01


def test_sbm_partition_invariant_and_validation():
    import pytest

    from igraph_ray.sources.generators import sbm_edges

    sizes = [30, 30]
    P = [[0.3, 0.04], [0.04, 0.3]]
    a = _pairs(ds_to_table(sbm_edges(sizes, P, seed=1, override_num_blocks=1)))
    b = _pairs(ds_to_table(sbm_edges(sizes, P, seed=1, override_num_blocks=7)))
    assert a == b and len(a) > 50
    for u, v in a:
        assert 0 <= u < v < 60
    with pytest.raises(ValueError):
        sbm_edges([30, 30], [[0.5, 0.1], [0.2, 0.5]])  # asymmetric
    with pytest.raises(ValueError):
        sbm_edges([30, -1], P)
    with pytest.raises(ValueError):
        sbm_edges([30, 30], [[1.5, 0.1], [0.1, 0.5]])
