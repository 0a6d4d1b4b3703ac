"""Property-based oracle tests (hypothesis): random small graphs must
match networkx exactly for components/triangles and allclose for
PageRank — beyond the hand-picked fixtures."""

import networkx as nx
import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

from igraph_ray.api import edges_dataset
from igraph_ray.kernels import connected_components, pagerank, triangle_counts
from tests.util import (
    ds_to_table,
    graph_from_nx,
    min_vid_components,
    nx_edge_arrays,
    state_dict,
)

_graph_strategy = st.builds(
    lambda n, m, seed: nx.gnm_random_graph(n, min(m, n * (n - 1) // 2), seed=seed),
    n=st.integers(4, 28),
    m=st.integers(3, 60),
    seed=st.integers(0, 10_000),
)

_settings = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(G=_graph_strategy)
@_settings
def test_components_property(G):
    import tempfile

    d = tempfile.mkdtemp(prefix="igr_prop_cc_")
    g = graph_from_nx(G, d, num_parts=2)
    run = connected_components(g)
    assert state_dict(run.state, "comp") == min_vid_components(G)


@given(G=_graph_strategy)
@_settings
def test_triangles_property(G):
    src, dst = nx_edge_arrays(G)
    if len(src) == 0:
        return
    tc = ds_to_table(triangle_counts(edges_dataset(src, dst)))
    got = dict(
        zip(tc.column("vid").to_pylist(), tc.column("triangles").to_pylist())
    )
    ref = {v: t for v, t in nx.triangles(G).items() if v in got}
    assert got == ref


@given(G=_graph_strategy)
@_settings
def test_pagerank_property(G):
    import tempfile

    d = tempfile.mkdtemp(prefix="igr_prop_pr_")
    g = graph_from_nx(G, d, num_parts=2)
    run = pagerank(g, tol=1e-9, max_iter=300, raise_on_nonconvergence=False)
    ours = state_dict(run.state, "rank")
    ref = _pagerank_python(G, tol=1e-12, max_iter=2000)
    assert max(abs(ours[v] - ref[v]) for v in ref) < 1e-6
