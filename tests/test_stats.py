"""Grouped mode / Pearson correlation vs brute-force oracles."""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.stats import grouped_mode, grouped_pearson
from tests.util import ds_to_table


def test_grouped_mode_vs_brute():
    rng = random.Random(11)
    groups = [f"g{rng.randrange(6)}" for _ in range(500)]
    vals = [f"v{rng.randrange(9)}" for _ in range(500)]
    ds = ray.data.from_arrow(
        pa.table({"g": pa.array(groups), "v": pa.array(vals)})
    ).repartition(5)
    out = ds_to_table(grouped_mode(ds, "g", "v"))
    got = {
        r["g"]: (r["mode"], r["n"]) for r in out.to_pylist()
    }
    want = {}
    per = defaultdict(Counter)
    for g, v in zip(groups, vals):
        per[g][v] += 1
    for g, cnt in per.items():
        best = min(cnt, key=lambda v: (-cnt[v], v))
        want[g] = (best, cnt[best])
    assert got == want


def test_grouped_mode_tie_breaks_to_smallest():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array(["a"] * 4),
                "v": pa.array(["z", "z", "b", "b"]),
            }
        )
    )
    out = ds_to_table(grouped_mode(ds, "g", "v")).to_pylist()
    assert out == [{"g": "a", "mode": "b", "n": 2}]


def _brute_pearson(rows, xd=0, yd=2):
    per = defaultdict(list)
    for g, x, y in rows:
        per[g].append((round(x * 10**xd), round(y * 10**yd)))
    out = {}
    for g, pts in per.items():
        n = len(pts)
        sx = sum(p for p, _ in pts)
        sy = sum(q for _, q in pts)
        sxy = sum(p * q for p, q in pts)
        sxx = sum(p * p for p, _ in pts)
        syy = sum(q * q for _, q in pts)
        num = n * sxy - sx * sy
        dx, dy = n * sxx - sx * sx, n * syy - sy * sy
        r = (
            float(num) / (math.sqrt(float(dx)) * math.sqrt(float(dy)))
            if dx > 0 and dy > 0
            else 0.0
        )
        out[g] = (n, r)
    return out


def test_grouped_pearson_vs_brute_and_numpy():
    rng = random.Random(3)
    rows = [
        (
            f"g{rng.randrange(4)}",
            float(rng.randrange(1, 50)),
            rng.randrange(100, 10_000_000) / 100.0,
        )
        for _ in range(800)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array([r[0] for r in rows]),
                "x": pa.array([r[1] for r in rows]),
                "y": pa.array([r[2] for r in rows]),
            }
        )
    ).repartition(7)
    out = ds_to_table(grouped_pearson(ds, "g", "x", "y")).to_pylist()
    got = {r["g"]: (r["n"], r["corr"]) for r in out}
    want = _brute_pearson(rows)
    assert set(got) == set(want)
    for g in want:
        assert got[g][0] == want[g][0]
        # bitwise vs the fixed-chain brute oracle
        assert got[g][1] == want[g][1]
        # and sane vs numpy's corrcoef
        xs = np.array([x for gg, x, _ in rows if gg == g])
        ys = np.array([y for gg, _, y in rows if gg == g])
        assert abs(got[g][1] - np.corrcoef(xs, ys)[0, 1]) < 1e-9


def test_grouped_pearson_degenerate_group():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array(["a", "a", "b", "b"]),
                "x": pa.array([1.0, 1.0, 1.0, 2.0]),
                "y": pa.array([3.0, 4.0, 3.0, 4.0]),
            }
        )
    )
    out = {
        r["g"]: r["corr"]
        for r in ds_to_table(grouped_pearson(ds, "g", "x", "y")).to_pylist()
    }
    assert out["a"] == 0.0  # constant x → degenerate
    assert abs(out["b"] - 1.0) < 1e-12


def test_grouped_ols_vs_brute():
    rng = random.Random(9)
    rows = [
        (
            f"g{rng.randrange(3)}",
            float(rng.randrange(1, 50)),
            rng.randrange(100, 5_000_000) / 100.0,
        )
        for _ in range(600)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array([r[0] for r in rows]),
                "x": pa.array([r[1] for r in rows]),
                "y": pa.array([r[2] for r in rows]),
            }
        )
    ).repartition(5)
    from igraph_ray.stages.stats import grouped_ols

    out = {
        r["g"]: (r["n"], r["slope"], r["intercept"])
        for r in ds_to_table(grouped_ols(ds, "g", "x", "y")).to_pylist()
    }
    per = defaultdict(list)
    for g, x, y in rows:
        per[g].append((round(x), round(y * 100)))
    for g, pts in per.items():
        n = len(pts)
        sx = sum(p for p, _ in pts)
        sy = sum(q for _, q in pts)
        sxy = sum(p * q for p, q in pts)
        sxx = sum(p * p for p, _ in pts)
        num, dx = n * sxy - sx * sy, n * sxx - sx * sx
        slope_s = float(num) / float(dx)
        inter_s = (float(sy) - slope_s * float(sx)) / float(n)
        assert out[g][0] == n
        assert out[g][1] == slope_s / 100.0
        assert out[g][2] == inter_s / 100.0
        # sanity vs numpy lstsq
        xs = np.array([x for gg, x, _ in rows if gg == g])
        ys_ = np.array([y for gg, _, y in rows if gg == g])
        A = np.vstack([xs, np.ones(len(xs))]).T
        sl, ic = np.linalg.lstsq(A, ys_, rcond=None)[0]
        assert abs(out[g][1] - sl) < 1e-7
        assert abs(out[g][2] - ic) < 1e-5


def test_numeric_assortativity_composition_vs_nx():
    """grouped_pearson over both arc orientations == nx
    numeric_assortativity_coefficient."""
    import networkx as nx

    from igraph_ray.stages.stats import grouped_pearson

    G = nx.gnm_random_graph(40, 100, seed=12)
    rng = random.Random(1)
    attr = {v: rng.randrange(0, 9) for v in G.nodes()}
    nx.set_node_attributes(G, attr, "size")
    xs, ys = [], []
    for u, v in G.edges():
        xs += [float(attr[u]), float(attr[v])]
        ys += [float(attr[v]), float(attr[u])]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array(["all"] * len(xs)),
                "x": pa.array(xs),
                "y": pa.array(ys),
            }
        )
    ).repartition(4)
    out = ds_to_table(
        grouped_pearson(ds, "g", "x", "y", x_decimals=0, y_decimals=0)
    ).to_pylist()[0]
    want = nx.numeric_assortativity_coefficient(G, "size")
    assert abs(out["corr"] - want) < 1e-9
