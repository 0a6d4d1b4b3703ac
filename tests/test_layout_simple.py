"""Closed-form / tree layouts (kernels/layout.py round-5 additions):
circle, star, grid (igraph layout_circle / layout_star /
layout_grid — exact geometric invariants), and the simplified
Reingold–Tilford tree layout (depth/centering/post-order structure
on hand-built trees)."""

import math

import networkx as nx
import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.layout import (
    circle_layout,
    grid_layout,
    reingold_tilford,
    star_layout,
)
from tests.util import graph_from_nx


def _vids_ds(n):
    return ray.data.from_arrow(
        pa.table({"vid": pa.array(range(n), pa.int64())})
    )


def _xy(out):
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("vid")
    return (
        tbl.column("x").to_numpy(zero_copy_only=False),
        tbl.column("y").to_numpy(zero_copy_only=False),
    )


def test_circle_layout_geometry(ray_session):
    n = 12
    x, y = _xy(circle_layout(_vids_ds(n), n))
    r = np.hypot(x, y)
    assert np.allclose(r, 1.0)
    ang = np.arctan2(y, x)
    want = np.array(
        [math.atan2(math.sin(2 * math.pi * i / n),
                    math.cos(2 * math.pi * i / n)) for i in range(n)]
    )
    assert np.allclose(ang, want)


def test_star_layout_geometry(ray_session):
    n = 9
    x, y = _xy(star_layout(_vids_ds(n), n, center=0))
    assert x[0] == 0.0 and y[0] == 0.0
    assert np.allclose(np.hypot(x[1:], y[1:]), 1.0)
    # spokes evenly spaced: n-1 distinct angles
    ang = np.sort(np.mod(np.arctan2(y[1:], x[1:]), 2 * np.pi))
    gaps = np.diff(np.concatenate([ang, [ang[0] + 2 * np.pi]]))
    assert np.allclose(gaps, 2 * np.pi / (n - 1))


def test_grid_layout_row_major(ray_session):
    n = 10  # w = ceil(sqrt(10)) = 4
    x, y = _xy(grid_layout(_vids_ds(n), n))
    assert x.tolist() == [0, 1, 2, 3, 0, 1, 2, 3, 0, 1]
    assert y.tolist() == [0, 0, 0, 0, 1, 1, 1, 1, 2, 2]


def test_reingold_tilford_structure(tmp_graph_dir):
    # perfect binary tree of depth 3
    G = nx.balanced_tree(2, 3)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    tbl = reingold_tilford(g, root=0)
    vid = tbl.column("vid").to_numpy(zero_copy_only=False)
    x = tbl.column("x").to_numpy(zero_copy_only=False)
    y = tbl.column("y").to_numpy(zero_copy_only=False)
    pos = {int(v): i for i, v in enumerate(vid)}
    depth = dict(nx.single_source_shortest_path_length(G, 0))
    for v in G.nodes():
        assert y[pos[v]] == depth[v], v
    # leaves occupy consecutive integer x in vid (left-to-right) order
    leaves = [v for v in sorted(G.nodes()) if depth[v] == 3]
    assert [x[pos[v]] for v in leaves] == list(
        map(float, range(len(leaves)))
    )
    # every internal vertex is centered over its children
    for v in sorted(G.nodes()):
        ch = [c for c in G.neighbors(v) if depth.get(c) == depth[v] + 1]
        if ch:
            assert x[pos[v]] == np.mean([x[pos[c]] for c in ch]), v


def test_reingold_tilford_forest(tmp_graph_dir):
    # two components: path rooted at 0, triangle rooted at its min vid
    G = nx.Graph()
    G.add_edges_from([(0, 1), (1, 2), (10, 11), (11, 12), (12, 10)])
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    tbl = reingold_tilford(g, root=0)
    d = {
        int(v): (float(xx), float(yy))
        for v, xx, yy in zip(
            tbl.column("vid").to_pylist(),
            tbl.column("x").to_pylist(),
            tbl.column("y").to_pylist(),
        )
    }
    assert len(d) == 6
    assert d[0][1] == 0.0 and d[1][1] == 1.0 and d[2][1] == 2.0
    # second component laid out to the right of the first
    assert min(d[v][0] for v in (10, 11, 12)) >= max(
        d[v][0] for v in (0, 1, 2)
    )
