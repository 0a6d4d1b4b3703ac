"""C1 tests: resume equivalence (bitwise state), lineage rows, and the
_SUCCESS commit protocol (FIXTURES.md §4)."""

import os

import networkx as nx
import pyarrow.parquet as pq

from igraph_ray.kernels import connected_components, pagerank
from igraph_ray.state.checkpoint import latest_complete_iteration
from tests.util import graph_from_nx, state_dict


def test_pagerank_resume_bitwise(tmp_graph_dir, tmp_path):
    G = nx.gnm_random_graph(120, 480, seed=1)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    full = pagerank(g, tol=1e-10, max_iter=40, raise_on_nonconvergence=False)
    ck = str(tmp_path / "ck")
    pagerank(
        g, tol=1e-10, max_iter=5, checkpoint_dir=ck,
        raise_on_nonconvergence=False,
    )
    resumed = pagerank(
        g, tol=1e-10, max_iter=40, checkpoint_dir=ck, resume=True,
        raise_on_nonconvergence=False,
    )
    assert resumed.iterations == full.iterations
    a = state_dict(full.state, "rank")
    b = state_dict(resumed.state, "rank")
    assert a == b  # bitwise: same floats, not approx


def test_pagerank_resume_bitwise_dangling(tmp_graph_dir, tmp_path):
    """Resume equivalence on a DIRECTED graph with dangling (zero
    out-degree) vertices — exercises the dangling-mass sort in apply
    (kernels/pagerank.py) under the resume path."""
    G = nx.gnp_random_graph(100, 0.04, seed=7, directed=True)
    # gnp at this density leaves several sinks; guarantee at least one
    G.add_edge(0, 99)
    for e in list(G.out_edges(99)):
        G.remove_edge(*e)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3, symmetrize=False)
    full = pagerank(g, tol=1e-10, max_iter=40, raise_on_nonconvergence=False)
    ck = str(tmp_path / "ck")
    pagerank(
        g, tol=1e-10, max_iter=5, checkpoint_dir=ck,
        raise_on_nonconvergence=False,
    )
    resumed = pagerank(
        g, tol=1e-10, max_iter=40, checkpoint_dir=ck, resume=True,
        raise_on_nonconvergence=False,
    )
    assert resumed.iterations == full.iterations
    assert state_dict(full.state, "rank") == state_dict(resumed.state, "rank")


def test_resume_bitwise_under_split_blocks(tmp_graph_dir, tmp_path):
    """Deterministic reproduction of the round-2 flake: a checkpoint
    whose parquet files SPLIT each partition's rows across two files
    must still resume bitwise-identically (load_state canonicalizes
    block layout back to one block per partition)."""
    import glob

    import pyarrow as pa

    G = nx.gnm_random_graph(120, 480, seed=1)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    full = pagerank(g, tol=1e-10, max_iter=40, raise_on_nonconvergence=False)
    ck = str(tmp_path / "ck")
    pagerank(
        g, tol=1e-10, max_iter=5, checkpoint_dir=ck,
        raise_on_nonconvergence=False,
    )
    # adversarially re-shard the committed state: read all rows, then
    # write MANY small files, each mixing rows of different partitions
    state_dir = os.path.join(ck, "iter_00004", "state")
    tbl = pq.read_table(state_dir)
    for f in glob.glob(os.path.join(state_dir, "*.parquet")):
        os.remove(f)
    n = tbl.num_rows
    step = max(1, n // 7)
    for i, lo in enumerate(range(0, n, step)):
        pq.write_table(
            tbl.slice(lo, step), os.path.join(state_dir, f"shard_{i}.parquet")
        )
    resumed = pagerank(
        g, tol=1e-10, max_iter=40, checkpoint_dir=ck, resume=True,
        raise_on_nonconvergence=False,
    )
    assert resumed.iterations == full.iterations
    assert state_dict(full.state, "rank") == state_dict(resumed.state, "rank")


def test_components_resume_exact(tmp_graph_dir, tmp_path):
    G = nx.gnm_random_graph(150, 170, seed=4)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    full = connected_components(g)
    ck = str(tmp_path / "ck")
    connected_components(g, max_iter=2, checkpoint_dir=ck)
    resumed = connected_components(g, checkpoint_dir=ck, resume=True)
    assert state_dict(full.state, "comp") == state_dict(resumed.state, "comp")


def test_lineage_rows(tmp_graph_dir, tmp_path):
    G = nx.gnm_random_graph(60, 200, seed=6)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    ck = str(tmp_path / "ck")
    pagerank(g, tol=1e-10, max_iter=3, checkpoint_dir=ck,
             raise_on_nonconvergence=False)
    it = latest_complete_iteration(ck)
    assert it == 2
    lineage = pq.read_table(
        os.path.join(ck, f"iter_{it:05d}", "lineage.parquet")
    )
    assert set(lineage.column_names) == {"part", "iteration", "rows", "residual"}
    assert sum(lineage.column("rows").to_pylist()) == g.num_vertices
    assert all(i == it for i in lineage.column("iteration").to_pylist())


def test_incomplete_checkpoint_ignored(tmp_graph_dir, tmp_path):
    G = nx.gnm_random_graph(40, 120, seed=8)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    ck = str(tmp_path / "ck")
    pagerank(g, tol=1e-10, max_iter=3, checkpoint_dir=ck,
             raise_on_nonconvergence=False)
    # simulate a kill mid-write of iteration 3: state dir without marker
    broken = os.path.join(ck, "iter_00003")
    os.makedirs(os.path.join(broken, "state"))
    assert latest_complete_iteration(ck) == 2


def test_partial_checkpoint_overwritten(tmp_graph_dir, tmp_path):
    """A retry of an iteration whose previous write died mid-flight
    (state files present, no _SUCCESS) must not duplicate rows."""
    import shutil

    import networkx as nx
    import pyarrow as pa

    from igraph_ray.state.checkpoint import CheckpointManager

    G = nx.gnm_random_graph(50, 150, seed=12)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    ck = str(tmp_path / "ck")
    run = pagerank(g, tol=1e-10, max_iter=3, checkpoint_dir=ck,
                   raise_on_nonconvergence=False)
    # simulate a partial write of iteration 2: drop the marker, keep files
    d = os.path.join(ck, "iter_00002")
    os.remove(os.path.join(d, "_SUCCESS"))
    mgr = CheckpointManager(ck)
    mgr.save_state(run.state, 2, {})
    reloaded = mgr.load_state(2)
    assert reloaded.count() == g.num_vertices  # no duplicated rows
