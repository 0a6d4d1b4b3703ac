"""Scatter partial-batch contract (kernels/base.py VertexKernel.scatter
doc): when one partition's state rows split across blocks — checkpoint
reload or dynamic block splitting — the concatenated per-slice message
tables must reduce to the same apply result as a single full batch.

These tests drive ScatterStage directly on a full state table vs. the
same rows split into slices (in driver process: the CSR cache works
locally), then compare the applied state."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from igraph_ray.kernels.base import ScatterStage, init_state_dataset
from tests.util import ds_to_table, graph_from_nx


def _apply_all(kernel, msgs: pa.Table) -> dict[int, tuple]:
    """Group messages by dst_part, apply, return {vid: values}."""
    out = {}
    for part in np.unique(msgs.column("dst_part").to_numpy(zero_copy_only=False)):
        grp = msgs.filter(pc.equal(msgs.column("dst_part"), int(part)))
        res = kernel.apply(grp, int(part))
        for row in res.to_pylist():
            vid = row.pop("vid")
            row.pop("part", None)
            out[vid] = tuple(row.values())
    return out


def _split_vs_full(kernel, graph, state_tbl, n_slices=3):
    stage = ScatterStage(kernel, graph)
    full = _apply_all(kernel, stage(state_tbl))
    n = state_tbl.num_rows
    step = max(1, -(-n // n_slices))
    slices = [state_tbl.slice(lo, step) for lo in range(0, n, step)]
    split_msgs = pa.concat_tables([stage(s) for s in slices])
    split = _apply_all(kernel, split_msgs)
    return full, split


def _init_state_table(kernel, graph) -> pa.Table:
    # shuffled row order so slices mix vids arbitrarily
    tbl = ds_to_table(init_state_dataset(kernel, graph))
    rng = np.random.default_rng(0)
    return tbl.take(pa.array(rng.permutation(tbl.num_rows)))


def test_wl_scatter_partial_batch(tmp_graph_dir):
    from igraph_ray.kernels.wl import WLKernel

    G = nx.gnm_random_graph(60, 180, seed=3)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    # non-uniform colors so absent-slot zero-fill would corrupt hashes
    colors = {v: (v % 7) + 1 for v in G.nodes()}
    kernel = WLKernel(num_parts=g.num_parts, rounds=3, init_colors=colors)
    state = _init_state_table(kernel, g)
    full, split = _split_vs_full(kernel, g, state)
    assert full == split  # exact int64 hashes


def test_fiedler_scatter_partial_batch(tmp_graph_dir):
    from igraph_ray.kernels.spectral import FiedlerKernel

    G = nx.gnm_random_graph(60, 180, seed=5)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    kernel = FiedlerKernel(
        num_vertices=g.num_vertices, num_parts=g.num_parts, sigma=24.0,
        mean=0.3, norm=2.0,
    )
    state = _init_state_table(kernel, g)
    full, split = _split_vs_full(kernel, g, state)
    assert set(full) == set(split)
    for vid in full:
        np.testing.assert_allclose(full[vid], split[vid], rtol=1e-12)


def test_voterank_weaken_partial_batch(tmp_graph_dir):
    from igraph_ray.kernels.voterank import VoteRankKernel

    G = nx.gnm_random_graph(60, 180, seed=9)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    kernel = VoteRankKernel(num_parts=g.num_parts, delta=0.25)
    kernel.phase = "weaken"
    kernel.last_selected = 10
    state = _init_state_table(kernel, g)
    full, split = _split_vs_full(kernel, g, state)
    # neighbor abilities decremented exactly once, not once per slice
    assert full == split
    nbrs = set(G.adj[10])
    for v in nbrs:
        assert full[v][0] == 0.75
    assert full[10][0] == 0.0


def test_girth_probe_scatter_partial_batch(tmp_graph_dir):
    from igraph_ray.kernels.girth import GirthProbeKernel
    from igraph_ray.kernels.multibfs import pivot_distances

    G = nx.petersen_graph()
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    pivots = np.array([0, 3, 7], np.int64)
    dk = pivot_distances(g, pivots)
    kernel = GirthProbeKernel(num_parts=g.num_parts, k=len(pivots))
    state = ds_to_table(dk.state)
    rng = np.random.default_rng(1)
    state = state.take(pa.array(rng.permutation(state.num_rows)))
    full, split = _split_vs_full(kernel, g, state)
    assert full == split  # exact candidate values under re-blocking
