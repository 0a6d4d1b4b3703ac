"""HyperLogLog accuracy, determinism, and merge-invariance."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.sketch import hll_distinct, hll_distinct_by


def _ds(vals, parts=6):
    return ray.data.from_arrow(
        pa.table({"x": pa.array(np.asarray(vals, np.int64))})
    ).repartition(parts)


def test_hll_accuracy():
    rng = np.random.default_rng(2)
    for true_n in (100, 5_000, 60_000):
        vals = rng.integers(0, 10**12, true_n)
        vals = np.unique(vals)  # exact distinct = len(vals)
        data = np.concatenate([vals, vals[: len(vals) // 2]])  # dups
        rng.shuffle(data)
        est = hll_distinct(_ds(data), "x", p=14)
        rel = abs(est - len(vals)) / len(vals)
        assert rel < 0.03, (true_n, est, rel)


def test_hll_deterministic_and_partition_invariant():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 10**9, 20_000)
    e1 = hll_distinct(_ds(data, parts=3), "x")
    e2 = hll_distinct(_ds(data, parts=11), "x")
    assert e1 == e2  # register merge is order/partition independent


def test_hll_by_group():
    rng = np.random.default_rng(4)
    g = rng.integers(0, 3, 30_000).astype(np.int64)
    x = rng.integers(0, 10**9, 30_000).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"g": pa.array(g), "x": pa.array(x)})
    ).repartition(5)
    got = hll_distinct_by(ds, "g", "x", p=12)
    est = dict(
        zip(
            got.column("key").to_pylist(),
            got.column("approx_distinct").to_pylist(),
        )
    )
    for gv in (0, 1, 2):
        true = len(np.unique(x[g == gv]))
        rel = abs(est[gv] - true) / true
        assert rel < 0.06, (gv, est[gv], true, rel)


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def _docs(texts, parts=4):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(parts)


def test_cms_overestimates_and_is_tight_when_sparse():
    from igraph_ray.stages.sketch import cms_build_text, cms_estimate

    texts = ["apple banana apple", "banana cherry", "apple date date"]
    grid = cms_build_text(_docs(texts), depth=3, width=4096)
    terms = np.array(["apple", "banana", "cherry", "date", "missing"])
    est = cms_estimate(grid, terms)
    true = np.array([3, 2, 1, 2, 0])
    assert (est >= true).all()
    # 5 distinct terms in a 4096-wide grid: no collisions w.h.p. per row,
    # and MIN across 3 rows makes exactness near-certain — assert it.
    assert (est == true).all(), (est, true)


def test_cms_partition_invariant_and_merge_additive():
    from igraph_ray.stages.sketch import cms_build_text, cms_estimate

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(500)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 30)))
        for _ in range(200)
    ]
    g1 = cms_build_text(_docs(texts, parts=2), depth=3, width=512)
    g2 = cms_build_text(_docs(texts, parts=13), depth=3, width=512)
    assert (g1 == g2).all()  # counter grid is order/partition independent
    # additivity: grid(A+B) == grid(A) + grid(B)
    ga = cms_build_text(_docs(texts[:90], parts=3), depth=3, width=512)
    gb_ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    np.arange(90, len(texts), dtype=np.int64)
                ),
                "text": pa.array(texts[90:], pa.string()),
            }
        )
    ).repartition(3)
    from igraph_ray.stages.sketch import cms_build_text as _b

    gb = _b(gb_ds, depth=3, width=512)
    assert (ga + gb == g1).all()
    # estimates bound truth for every vocab word
    from collections import Counter

    truth = Counter(w for t in texts for w in t.split())
    est = cms_estimate(g1, np.array(vocab))
    for w, e in zip(vocab, est):
        assert e >= truth.get(w, 0)


# ---------------------------------------------------------------------------
# DDSketch
# ---------------------------------------------------------------------------


def test_ddsketch_relative_error_bound():
    from igraph_ray.stages.sketch import ddsketch_build, ddsketch_quantiles

    rng = np.random.default_rng(5)
    vals = np.exp(rng.normal(8, 2, 50_000))  # lognormal, wide range
    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(vals, pa.float64())})
    ).repartition(9)
    alpha = 0.01
    sk = ddsketch_build(ds, "x", alpha=alpha)
    assert sk["total"] == len(vals)
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    est = ddsketch_quantiles(sk, qs)
    srt = np.sort(vals)
    for q, e in zip(qs, est):
        true = srt[int(np.floor(q * (len(vals) - 1)))]
        assert abs(e - true) <= alpha * true * 1.0001, (q, e, true)


def test_ddsketch_partition_invariant_and_mergeable():
    from igraph_ray.stages.sketch import (
        ddsketch_build,
        ddsketch_merge,
        ddsketch_quantiles,
    )

    rng = np.random.default_rng(8)
    vals = rng.integers(1, 10**6, 20_000).astype(np.float64)

    def mk(v, parts):
        return ray.data.from_arrow(
            pa.table({"x": pa.array(v, pa.float64())})
        ).repartition(parts)

    s1 = ddsketch_build(mk(vals, 3), "x")
    s2 = ddsketch_build(mk(vals, 17), "x")
    assert (s1["idx"] == s2["idx"]).all()
    assert (s1["cnt"] == s2["cnt"]).all()
    # merge(A, B) == build(A + B) bucket-exactly
    sa = ddsketch_build(mk(vals[:7000], 2), "x")
    sb = ddsketch_build(mk(vals[7000:], 5), "x")
    sm = ddsketch_merge(sa, sb)
    assert (sm["idx"] == s1["idx"]).all()
    assert (sm["cnt"] == s1["cnt"]).all()
    assert sm["total"] == s1["total"]
    est = ddsketch_quantiles(sm, [0.5])
    true = np.sort(vals)[int(np.floor(0.5 * (len(vals) - 1)))]
    assert abs(est[0] - true) <= 0.01 * true * 1.0001


def test_ddsketch_zero_bucket():
    from igraph_ray.stages.sketch import ddsketch_build, ddsketch_quantiles

    vals = np.r_[np.zeros(60), np.full(40, 1000.0)]
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals)})).repartition(4)
    sk = ddsketch_build(ds, "x")
    assert sk["n_zero"] == 60
    est = ddsketch_quantiles(sk, [0.25, 0.5, 0.9])
    assert est[0] == 0.0 and est[1] == 0.0
    assert abs(est[2] - 1000.0) <= 0.01 * 1000.0 * 1.0001


def test_hll_set_ops_accuracy_and_union_merge():
    import numpy as np

    from igraph_ray.stages.sketch import hll_distinct, hll_set_ops

    rng = np.random.default_rng(4)
    # group a: 0..19999, group b: 10000..34999 → overlap 10000
    a_vals = np.arange(0, 20_000, dtype=np.int64)
    b_vals = np.arange(10_000, 35_000, dtype=np.int64)
    g = np.concatenate(
        [np.zeros(len(a_vals), np.int64), np.ones(len(b_vals), np.int64)]
    )
    v = np.concatenate([a_vals, b_vals])
    sh = rng.permutation(len(v))
    ds = ray.data.from_arrow(
        pa.table({"g": pa.array(g[sh]), "v": pa.array(v[sh])})
    ).repartition(6)
    out = hll_set_ops(ds, "g", "v", 0, 1)
    assert abs(out["n_a"] - 20_000) / 20_000 < 0.03
    assert abs(out["n_b"] - 25_000) / 25_000 < 0.03
    assert abs(out["union"] - 35_000) / 35_000 < 0.03
    assert abs(out["intersection"] - 10_000) / 10_000 < 0.12
    # register union == HLL of the concatenated stream (lossless)
    both = ray.data.from_arrow(pa.table({"v": pa.array(v)}))
    assert out["union"] == hll_distinct(both, "v")
    # determinism across layouts
    out2 = hll_set_ops(ds.repartition(2), "g", "v", 0, 1)
    assert out == out2


def test_hll_registers_reproduce_estimate(ray_session):
    """hll_registers_by (the SQL-twin surface) carries exactly the
    state hll_distinct_by estimates from: rebuilding the dense
    register array from the nonzero rows and running _estimate
    reproduces the per-group estimates bitwise."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from igraph_ray.stages.sketch import (
        _estimate,
        hll_distinct_by,
        hll_registers_by,
    )

    rng = np.random.default_rng(7)
    n = 5000
    tbl = pa.table(
        {
            "g": pa.array(rng.integers(0, 3, n).astype("str")),
            "u": pa.array(rng.integers(0, 800, n)),
        }
    )
    ds = ray.data.from_arrow(tbl)
    est = hll_distinct_by(ds, "g", "u", p=10)
    regs = hll_registers_by(ds, "g", "u", p=10)
    want = dict(
        zip(est.column("key").to_pylist(),
            est.column("approx_distinct").to_pylist())
    )
    by_key: dict = {}
    for k, i, v in zip(
        regs.column("key").to_pylist(),
        regs.column("reg_index").to_pylist(),
        regs.column("reg_value").to_pylist(),
    ):
        by_key.setdefault(k, np.zeros(1 << 10, np.uint8))[i] = v
    assert set(by_key) == set(want)
    for k, arr in by_key.items():
        assert float(_estimate(arr)) == want[k], k
