"""Dominator tree vs nx.immediate_dominators (exact)."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.kernels.dominators import dominator_tree


def _ds(src, dst):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(np.asarray(src, dtype=np.int64)),
                "dst": pa.array(np.asarray(dst, dtype=np.int64)),
            }
        )
    )


def _as_dict(tbl, root=0):
    """Our table includes the root row (idom[root]=root, the igraph
    convention); this nx build omits it — compare without it."""
    d = dict(
        zip(tbl.column("vid").to_pylist(), tbl.column("idom").to_pylist())
    )
    assert d[root] == root
    del d[root]
    return d


def test_classic_flowgraph(ray_session):
    # the Cooper-Harvey-Kennedy paper's running example shape
    src = [0, 0, 1, 2, 2, 3, 4, 5, 5, 6]
    dst = [1, 2, 3, 3, 4, 5, 5, 6, 3, 5]
    ours = _as_dict(dominator_tree(_ds(src, dst), root=0))
    G = nx.DiGraph(zip(src, dst))
    ref = nx.immediate_dominators(G, 0)
    assert ours == ref


@pytest.mark.parametrize("seed", [0, 3, 8, 21])
def test_random_digraphs_match_nx(ray_session, seed):
    rng = np.random.default_rng(seed)
    n, m = 60, 220
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ours = _as_dict(dominator_tree(_ds(src, dst), root=0))
    G = nx.DiGraph()
    G.add_nodes_from(range(n))
    G.add_edges_from(zip(src.tolist(), dst.tolist()))
    ref = nx.immediate_dominators(G, 0)
    assert ours == ref


def test_unreachable_vertices_omitted(ray_session):
    src = [0, 1, 5]
    dst = [1, 2, 6]
    ours = _as_dict(dominator_tree(_ds(src, dst), root=0))
    assert ours == {1: 0, 2: 1}


def test_diamond_with_loop(ray_session):
    src = [0, 0, 1, 2, 3, 3]
    dst = [1, 2, 3, 3, 0, 4]
    ours = _as_dict(dominator_tree(_ds(src, dst), root=0))
    G = nx.DiGraph(zip(src, dst))
    ref = nx.immediate_dominators(G, 0)
    assert ours == ref


def test_gather_bound_raises(ray_session):
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        dominator_tree(_ds([0, 1], [1, 2]), root=0, gather_max_arcs=1)
