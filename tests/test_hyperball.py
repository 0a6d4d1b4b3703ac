"""HyperBall vs a bitwise local replay + exact-BFS sanity."""

import networkx as nx
import numpy as np

from igraph_ray.kernels.hyperball import (
    estimate,
    hyperball,
    init_registers,
)
from tests.util import graph_from_nx


def _local_hyperball(G):
    """Same algorithm, plain numpy: returns (final regs, nf list)."""
    nodes = sorted(G.nodes())
    idx = {v: i for i, v in enumerate(nodes)}
    regs = init_registers(np.asarray(nodes, np.int64))
    nf = [float(len(nodes))]
    while True:
        new = regs.copy()
        for u, v in G.edges():
            if u == v:
                continue
            new[idx[u]] = np.maximum(new[idx[u]], regs[idx[v]])
            new[idx[v]] = np.maximum(new[idx[v]], regs[idx[u]])
        nf.append(float(estimate(new).sum()))
        if (new == regs).all():
            nf.pop()
            break
        regs = new
    return regs, nf


def _state_regs(run):
    rows = {}
    for b in run.state.iter_batches(batch_format="pyarrow", batch_size=None):
        vids = b.column("vid").to_pylist()
        cols = [
            b.column(f"r{i}").to_numpy(zero_copy_only=False)
            for i in range(8)
        ]
        stacked = np.stack(cols, axis=1)
        regs = stacked.view(np.uint8).reshape(len(vids), 64)
        for i, v in enumerate(vids):
            rows[v] = regs[i].copy()
    return rows


def test_hyperball_bitwise_vs_local_replay(tmp_graph_dir):
    G = nx.gnm_random_graph(80, 160, seed=23)
    graph = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    run, nf, eff = hyperball(graph)
    ref_regs, ref_nf = _local_hyperball(G)
    got = _state_regs(run)
    nodes = sorted(G.nodes())
    for i, v in enumerate(nodes):
        assert (got[v] == ref_regs[i]).all(), v
    assert np.allclose(nf, ref_nf, rtol=1e-12)
    assert 0 < eff <= len(nf) - 1


def test_hyperball_estimates_near_exact(tmp_graph_dir):
    # connected graph: the final ball of every vertex is the whole
    # vertex set; with m=64 registers the estimate is within ~3 sigma
    G = nx.connected_watts_strogatz_graph(300, 6, 0.2, seed=5)
    graph = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    run, nf, eff = hyperball(graph)
    n = G.number_of_nodes()
    # all vertices converge to the SAME register set -> one shared
    # estimate for the full vertex set
    ests = []
    for b in run.state.iter_batches(batch_format="pyarrow", batch_size=None):
        ests += b.column("est").to_pylist()
    ests = np.asarray(ests)
    assert len(ests) == n
    assert abs(ests.mean() - n) / n < 0.4  # 3 x 13% rse
    # neighborhood function is monotone nondecreasing
    assert all(b >= a - 1e-9 for a, b in zip(nf, nf[1:]))
    # effective diameter is far below n for a small-world graph
    assert eff < 12
