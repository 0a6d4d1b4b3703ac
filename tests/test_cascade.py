"""Independent cascade (deterministic live-edge form) vs sequential replay."""

from __future__ import annotations

import tempfile

import networkx as nx
import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.cascade import independent_cascade, live_arcs
from igraph_ray.utils import hash_int64
from tests.util import ds_to_table


def _edges_ds(arcs) -> ray.data.Dataset:
    s = np.asarray([a for a, _ in arcs], np.int64)
    d = np.asarray([b for _, b in arcs], np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(s),
                "dst": pa.array(d),
                "weight": pa.array(np.ones(len(s))),
            }
        )
    )


def _verts_ds(n: int) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table({"vid": pa.array(np.arange(n, dtype=np.int64))})
    )


def _sequential_ic(arcs, n, seeds, p_milli) -> dict[int, int]:
    """Reference: same coins, plain BFS over the live subgraph."""
    s = np.asarray([a for a, _ in arcs], np.int64)
    d = np.asarray([b for _, b in arcs], np.int64)
    live = hash_int64((s << 20) | d) % np.uint64(1000) < np.uint64(p_milli)
    adj: dict[int, list[int]] = {}
    for a, b in zip(s[live], d[live]):
        adj.setdefault(int(a), []).append(int(b))
    rounds = {int(v): 0 for v in seeds}
    frontier = sorted(rounds)
    r = 0
    while frontier:
        r += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in rounds:
                    rounds[v] = r
                    nxt.append(v)
        frontier = nxt
    return rounds


def _run(arcs, n, seeds, p_milli) -> dict[int, int]:
    out = ds_to_table(
        independent_cascade(
            _edges_ds(arcs),
            tempfile.mkdtemp(prefix="igr_ic_"),
            seeds,
            p_milli,
            vertices=_verts_ds(n),
        )
    )
    return dict(
        zip(out.column("vid").to_pylist(), out.column("round").to_pylist())
    )


def test_cascade_matches_sequential_replay():
    G = nx.gnp_random_graph(80, 0.06, seed=9, directed=True)
    arcs = sorted(G.edges())
    for p in (0, 250, 500, 1000):
        assert _run(arcs, 80, [0, 3], p) == _sequential_ic(arcs, 80, [0, 3], p)


def test_cascade_p0_and_p1_limits():
    G = nx.gnp_random_graph(50, 0.1, seed=4, directed=True)
    arcs = sorted(G.edges())
    # p=0: nothing spreads, seeds alone at round 0
    assert _run(arcs, 50, [7, 11], 0) == {7: 0, 11: 0}
    # p=1000: every arc live — rounds are plain multi-source BFS levels
    got = _run(arcs, 50, [7, 11], 1000)
    want: dict[int, int] = {}
    for lvl in (
        nx.single_source_shortest_path_length(G, 7),
        nx.single_source_shortest_path_length(G, 11),
    ):
        for v, d in lvl.items():
            want[v] = min(want.get(v, 1 << 30), d)
    assert got == want


def test_cascade_partition_invariance():
    G = nx.gnp_random_graph(60, 0.08, seed=2, directed=True)
    arcs = sorted(G.edges())
    base = _run(arcs, 60, [1], 400)
    # different block layout → identical spread
    ds = _edges_ds(arcs).repartition(7)
    out = ds_to_table(
        independent_cascade(
            ds,
            tempfile.mkdtemp(prefix="igr_ic_"),
            [1],
            400,
            vertices=_verts_ds(60),
        )
    )
    got = dict(
        zip(out.column("vid").to_pylist(), out.column("round").to_pylist())
    )
    assert got == base


def test_live_arcs_filter_is_exact():
    arcs = [(i, (i * 7 + 1) % 40) for i in range(40)]
    kept = ds_to_table(live_arcs(_edges_ds(arcs), 300))
    s = np.asarray([a for a, _ in arcs], np.int64)
    d = np.asarray([b for _, b in arcs], np.int64)
    m = hash_int64((s << 20) | d) % np.uint64(1000) < np.uint64(300)
    want = set(zip(s[m].tolist(), d[m].tolist()))
    got = set(
        zip(kept.column("src").to_pylist(), kept.column("dst").to_pylist())
    )
    assert got == want


def test_live_arcs_fuse_guard_raises_out_of_range():
    # dst >= 2^fuse_bits would overlap src bits and correlate coins —
    # must raise loudly (ADVICE r3), mirroring node2vec's fuse guard
    import pytest

    bad = _edges_ds([(0, 1 << 20), (1, 2)])
    # Ray wraps the worker-side ValueError in RayTaskError — match text
    with pytest.raises(Exception, match="fuse range"):
        ds_to_table(live_arcs(bad, 500))
    # a wider fuse accepts the same vids
    ok = ds_to_table(live_arcs(_edges_ds([(0, 1 << 20), (1, 2)]), 1000, fuse_bits=24))
    assert ok.num_rows == 2
