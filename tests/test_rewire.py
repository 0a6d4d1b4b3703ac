"""Degree-preserving rewiring (stages/rewire.py): exact degree
preservation, simplicity, determinism, seed sensitivity."""

import networkx as nx
import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.rewire import rewire_edges
from tests.util import ds_to_table


def _canon_ds(G, parts=5):
    src = np.array([min(u, v) for u, v in G.edges()], np.int64)
    dst = np.array([max(u, v) for u, v in G.edges()], np.int64)
    return (
        ray.data.from_arrow(
            pa.table({"src": pa.array(src), "dst": pa.array(dst)})
        ).repartition(parts),
        src,
        dst,
    )


def _edge_set(t):
    return set(
        zip(t.column("src").to_pylist(), t.column("dst").to_pylist())
    )


def test_rewire_preserves_degrees_and_simplicity():
    G = nx.gnm_random_graph(200, 900, seed=3)
    ds, src, dst = _canon_ds(G)
    t = ds_to_table(rewire_edges(ds, rounds=3, seed=11))
    s2 = t.column("src").to_numpy(zero_copy_only=False)
    d2 = t.column("dst").to_numpy(zero_copy_only=False)
    assert len(s2) == len(src)
    assert (s2 < d2).all()  # canonical, no self-loops
    assert len(_edge_set(t)) == len(s2)  # simple
    deg0 = np.bincount(np.r_[src, dst], minlength=200)
    deg1 = np.bincount(np.r_[s2, d2], minlength=200)
    assert (deg0 == deg1).all()
    # and it actually rewires
    frac = 1 - len(_edge_set(t) & set(zip(src.tolist(), dst.tolist()))) / len(src)
    assert frac > 0.5


def test_rewire_deterministic_and_partition_invariant():
    G = nx.gnm_random_graph(120, 500, seed=9)
    ds5, _, _ = _canon_ds(G, parts=5)
    ds11, _, _ = _canon_ds(G, parts=11)
    a = _edge_set(ds_to_table(rewire_edges(ds5, rounds=2, seed=4)))
    b = _edge_set(ds_to_table(rewire_edges(ds5, rounds=2, seed=4)))
    assert a == b  # same seed → identical
    c = _edge_set(ds_to_table(rewire_edges(ds11, rounds=2, seed=4)))
    assert a == c  # block layout does not change the result
    d = _edge_set(ds_to_table(rewire_edges(ds5, rounds=2, seed=5)))
    assert a != d  # seed matters


def test_rewire_star_is_fixed_point():
    # a star has no valid swap (every swap creates a self-loop at the
    # hub or a duplicate spoke) — the edge set must survive unchanged
    G = nx.star_graph(12)
    ds, src, dst = _canon_ds(G, parts=2)
    t = ds_to_table(rewire_edges(ds, rounds=3, seed=1))
    assert _edge_set(t) == set(zip(src.tolist(), dst.tolist()))
