"""Oracle tests for local bridges, effective size, and the s-metric
(nx.local_bridges / nx.effective_size / nx.s_metric parity)."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.kernels.metrics import (
    effective_size,
    local_bridges,
    s_metric,
)
from tests.util import ds_to_table, nx_edge_arrays


def _pairs_ds(G, parts=3) -> ray.data.Dataset:
    src, dst = nx_edge_arrays(G)
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).repartition(parts)


def test_local_bridges_vs_nx():
    G = nx.gnm_random_graph(80, 160, seed=7)
    got = ds_to_table(local_bridges(_pairs_ds(G)))
    ours = {
        frozenset((a, b))
        for a, b in zip(
            got.column("src").to_pylist(), got.column("dst").to_pylist()
        )
    }
    want = {
        frozenset((u, v)) for u, v in nx.local_bridges(G, with_span=False)
    }
    assert ours == want
    assert len(want) > 0  # fixture actually exercises the filter


def test_local_bridges_triangle_plus_tail():
    # triangle 0-1-2 plus tail 2-3: only the tail is a local bridge
    G = nx.Graph([(0, 1), (1, 2), (0, 2), (2, 3)])
    got = ds_to_table(local_bridges(_pairs_ds(G, parts=1)))
    ours = {
        frozenset((a, b))
        for a, b in zip(
            got.column("src").to_pylist(), got.column("dst").to_pylist()
        )
    }
    assert ours == {frozenset((2, 3))}


def test_effective_size_vs_nx():
    G = nx.gnm_random_graph(60, 150, seed=11)
    G.remove_nodes_from(list(nx.isolates(G)))
    got = ds_to_table(effective_size(_pairs_ds(G)))
    ours = dict(
        zip(
            got.column("key").to_pylist(),
            got.column("effective_size").to_pylist(),
        )
    )
    want = nx.effective_size(G)
    assert set(ours) == set(want)
    for v in want:
        assert ours[v] == pytest.approx(want[v], abs=1e-12), v


def test_effective_size_deterministic_across_layouts():
    G = nx.gnm_random_graph(50, 120, seed=3)
    G.remove_nodes_from(list(nx.isolates(G)))
    a = ds_to_table(effective_size(_pairs_ds(G, parts=1))).sort_by("key")
    b = ds_to_table(effective_size(_pairs_ds(G, parts=7))).sort_by("key")
    assert a.column("effective_size").to_pylist() == b.column(
        "effective_size"
    ).to_pylist()  # bitwise
    assert a.column("ties2").to_pylist() == b.column("ties2").to_pylist()


def test_s_metric_vs_nx():
    G = nx.gnm_random_graph(70, 200, seed=5)
    got = s_metric(_pairs_ds(G))
    want = sum(G.degree(u) * G.degree(v) for u, v in G.edges())
    assert got == want
    assert float(got) == pytest.approx(nx.s_metric(G))
