"""Disk-staged graph build (``build_graph_disk``): block-for-block
parity with the in-store shuffle build, per-partition resume, and
kernel equivalence."""

import os
import shutil

import networkx as nx
import numpy as np
import pytest

from igraph_ray.api import build_graph, edges_dataset, state_to_table
from igraph_ray.kernels.pagerank import pagerank
from tests.util import nx_edge_arrays


def _edges():
    G = nx.gnm_random_graph(120, 400, seed=21, directed=True)
    src, dst = nx_edge_arrays(G)
    return src, dst


def _load_blocks(graph_dir):
    out = {}
    csr = os.path.join(graph_dir, "csr")
    for name in sorted(os.listdir(csr)):
        blk = {}
        for f in sorted(os.listdir(os.path.join(csr, name))):
            if f.endswith(".npy"):
                blk[f] = np.load(os.path.join(csr, name, f))
        out[name] = blk
    return out


def test_disk_build_parity_with_memory(ray_session, tmp_path):
    src, dst = _edges()
    g_mem = build_graph(
        edges_dataset(src, dst), str(tmp_path / "mem"), num_parts=5
    )
    g_disk = build_graph(
        edges_dataset(src, dst),
        str(tmp_path / "disk"),
        num_parts=5,
        mode="disk",
    )
    assert g_mem.num_vertices == g_disk.num_vertices
    assert g_mem.num_edges == g_disk.num_edges
    assert g_mem.parts == g_disk.parts
    bm = _load_blocks(str(tmp_path / "mem"))
    bd = _load_blocks(str(tmp_path / "disk"))
    assert bm.keys() == bd.keys()
    for name in bm:
        assert bm[name].keys() == bd[name].keys(), name
        for f in bm[name]:
            assert np.array_equal(bm[name][f], bd[name][f]), (name, f)
    # stage dir cleaned up by default
    assert not os.path.isdir(str(tmp_path / "disk" / "stage"))

    r_mem = state_to_table(
        pagerank(g_mem, tol=1e-10, max_iter=100).state, ["vid", "rank"]
    )
    r_disk = state_to_table(
        pagerank(g_disk, tol=1e-10, max_iter=100).state, ["vid", "rank"]
    )
    assert r_mem.equals(r_disk)


def test_disk_build_resume_skips_built_parts(ray_session, tmp_path):
    src, dst = _edges()
    gdir = str(tmp_path / "g")
    g1 = build_graph(
        edges_dataset(src, dst),
        gdir,
        num_parts=4,
        mode="disk",
    )
    blocks_before = _load_blocks(gdir)
    # simulate a killed run: one partition block lost, stage retained
    from igraph_ray.stages.partition import build_graph_disk

    lost = f"part_{g1.parts[1]}"
    shutil.rmtree(os.path.join(gdir, "csr", lost))
    # stage dir was cleaned; a fresh resume restages then rebuilds
    # only the missing partition (others are detected complete)
    g2 = build_graph_disk(
        edges_dataset(src, dst),
        gdir,
        num_parts=4,
        resume=True,
    )
    assert g2.num_vertices == g1.num_vertices
    assert g2.num_edges == g1.num_edges
    blocks_after = _load_blocks(gdir)
    assert blocks_before.keys() == blocks_after.keys()
    for name in blocks_before:
        for f in blocks_before[name]:
            assert np.array_equal(
                blocks_before[name][f], blocks_after[name][f]
            ), (name, f)


def test_disk_build_with_isolated_vertices(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    src, dst = [0, 1, 2], [1, 2, 0]
    vertices = ray.data.from_arrow(
        pa.table({"vid": pa.array([0, 1, 2, 7, 9], pa.int64())})
    )
    g = build_graph(
        edges_dataset(src, dst),
        str(tmp_path / "g"),
        num_parts=2,
        vertices=vertices,
        mode="disk",
    )
    assert g.num_vertices == 5
    assert g.num_edges == 3
