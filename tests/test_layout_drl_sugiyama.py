"""DRL (OpenOrd phase schedule) and Sugiyama (layered DAG) layouts —
kernels/layout.py round-5 completions of the igraph layout family."""

import networkx as nx
import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.layout import drl_layout, sugiyama_layout
from tests.util import graph_from_nx


def _gather(out):
    if isinstance(out, pa.Table):
        return out.sort_by("vid")
    return pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("vid")


def test_drl_deterministic_and_clustered(tmp_graph_dir):
    # two dense cliques joined by one bridge edge: after the DRL
    # schedule, intra-clique distances should be far below the
    # inter-clique distance (expansion phase pulls clusters tight)
    G = nx.connected_caveman_graph(2, 6)
    graph = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    t1 = _gather(drl_layout(graph, iterations=40))
    t2 = _gather(drl_layout(graph, iterations=40))
    assert t1.equals(t2)  # deterministic: no RNG anywhere
    x = t1.column("x").to_numpy(zero_copy_only=False)
    y = t1.column("y").to_numpy(zero_copy_only=False)
    p = np.stack([x, y], axis=1)
    a, b = p[:6], p[6:]
    intra = max(
        np.linalg.norm(a - a.mean(0), axis=1).mean(),
        np.linalg.norm(b - b.mean(0), axis=1).mean(),
    )
    inter = np.linalg.norm(a.mean(0) - b.mean(0))
    assert inter > intra  # clusters separated
    assert (x >= 0).all() and (x <= 1).all()
    assert (y >= 0).all() and (y <= 1).all()


def _arcs_ds(pairs):
    src = pa.array([a for a, _ in pairs], pa.int64())
    dst = pa.array([b for _, b in pairs], pa.int64())
    return ray.data.from_arrow(pa.table({"src": src, "dst": dst}))


def test_sugiyama_dag_layering(ray_session):
    # a DAG: layering must satisfy y[dst] >= y[src] + 1 for EVERY arc
    # (no cycle removal needed) and equal the longest-path depth
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (0, 4)]
    tbl = _gather(sugiyama_layout(_arcs_ds(pairs)))
    y = dict(
        zip(
            tbl.column("vid").to_pylist(),
            tbl.column("y").to_pylist(),
        )
    )
    for a, b in pairs:
        assert y[b] >= y[a] + 1
    assert y[0] == 0 and y[3] == 2 and y[4] == 3  # longest paths


def test_sugiyama_cycle_and_x_distinct(ray_session):
    # a 3-cycle plus a tail: cycle removal must leave a valid
    # layering for all but the reversed back arcs; x must be distinct
    # within each layer
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    tbl = _gather(sugiyama_layout(_arcs_ds(pairs)))
    vid = tbl.column("vid").to_pylist()
    x = tbl.column("x").to_pylist()
    y = tbl.column("y").to_pylist()
    assert sorted(vid) == [0, 1, 2, 3, 4]
    ymap = dict(zip(vid, y))
    forward = sum(1 for a, b in pairs if ymap[b] >= ymap[a] + 1)
    assert forward >= len(pairs) - 1  # at most one reversed back arc
    by_layer = {}
    for v, xi, yi in zip(vid, x, y):
        by_layer.setdefault(yi, []).append(xi)
    for xs in by_layer.values():
        assert len(set(xs)) == len(xs)
    # x centered: dummy-free layers have mean 0 (dummies occupy
    # slots in subdivided layers, shifting the real-only mean)


def test_sugiyama_barycenter_reduces_crossings(ray_session):
    # bipartite graph with a known planar order: barycenter sweeps
    # should produce zero crossings (a straight matching)
    pairs = [(0, 10), (1, 11), (2, 12), (3, 13)]
    tbl = _gather(sugiyama_layout(_arcs_ds(pairs)))
    pos = dict(
        zip(
            tbl.column("vid").to_pylist(),
            tbl.column("x").to_pylist(),
        )
    )
    order_top = sorted([0, 1, 2, 3], key=lambda v: pos[v])
    order_bot = sorted([10, 11, 12, 13], key=lambda v: pos[v])
    assert [v + 10 for v in order_top] == order_bot  # no crossings
