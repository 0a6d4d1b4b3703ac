"""Structural diversity (kernels/metrics.py::diversity — igraph
``igraph_diversity`` semantics): pinned by a pure-Python entropy
replay over weighted fixtures; uniform weights → 1; degree-1 → 0;
layout-independent."""

import math

import networkx as nx
import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.metrics import diversity
from tests.util import ds_to_table


def _ds(edges, blocks=3):
    return ray.data.from_arrow(
        pa.table(
            {
                "src_key": pa.array([f"v{a}" for a, _, _ in edges]),
                "dst_key": pa.array([f"v{b}" for _, b, _ in edges]),
                "weight": pa.array([float(w) for _, _, w in edges]),
            }
        )
    ).repartition(num_blocks=blocks)


def _brute(edges):
    inc = {}
    for a, b, w in edges:
        inc.setdefault(a, []).append(float(w))
        inc.setdefault(b, []).append(float(w))
    out = {}
    for v, ws in inc.items():
        k = len(ws)
        if k <= 1:
            out[f"v{v}"] = (k, 0.0)
            continue
        s = sum(ws)
        h = -sum((w / s) * math.log(w / s) for w in ws) / math.log(k)
        out[f"v{v}"] = (k, h)
    return out


def _got(edges, blocks=3):
    t = ds_to_table(diversity(_ds(edges, blocks)))
    return {
        k: (d, h)
        for k, d, h in zip(
            t.column("key").to_pylist(),
            t.column("degree").to_pylist(),
            t.column("diversity").to_pylist(),
        )
    }


def test_uniform_star_is_one_and_leaves_zero(ray_session):
    edges = [(0, i, 2.5) for i in range(1, 6)]
    got = _got(edges)
    assert got["v0"][0] == 5
    assert abs(got["v0"][1] - 1.0) < 1e-12
    for i in range(1, 6):
        assert got[f"v{i}"] == (1, 0.0)


def test_matches_brute_on_random_weighted_graph(ray_session):
    G = nx.gnm_random_graph(40, 120, seed=8)
    rng = np.random.default_rng(3)
    edges = [(u, v, float(rng.integers(1, 9))) for u, v in G.edges()]
    got, want = _got(edges), _brute(edges)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-9, k


def test_layout_independent(ray_session):
    G = nx.gnm_random_graph(30, 80, seed=2)
    rng = np.random.default_rng(5)
    edges = [(u, v, float(rng.integers(1, 5))) for u, v in G.edges()]
    a, b = _got(edges, blocks=1), _got(edges, blocks=9)
    assert set(a) == set(b)
    for k in a:
        assert a[k][0] == b[k][0]
        assert abs(a[k][1] - b[k][1]) < 1e-12
