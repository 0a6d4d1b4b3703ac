"""K2 oracle tests: exact equality with networkx after min-vid
canonicalization (SURVEY.md §2.3(2))."""

import networkx as nx

from igraph_ray.api import build_graph, edges_dataset
from igraph_ray.kernels import connected_components
from tests.util import graph_from_nx, min_vid_components, state_dict


def test_two_paths(tmp_graph_dir):
    src = [0, 1, 2, 10, 11]
    dst = [1, 2, 3, 11, 12]
    g = build_graph(
        edges_dataset(src, dst), tmp_graph_dir, num_parts=2, symmetrize=True
    )
    run = connected_components(g)
    comp = state_dict(run.state, "comp")
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 12: 10}
    assert run.converged


def test_gnm_exact(tmp_graph_dir):
    G = nx.gnm_random_graph(200, 220, seed=9)  # sparse → many components
    g = graph_from_nx(G, tmp_graph_dir, num_parts=4)
    run = connected_components(g)
    assert state_dict(run.state, "comp") == min_vid_components(G)


def test_directed_weak(tmp_graph_dir):
    # arcs only one way; weak components ignore direction
    src = [0, 1, 5]
    dst = [1, 2, 6]
    g = build_graph(
        edges_dataset(src, dst), tmp_graph_dir, num_parts=2, symmetrize=True
    )
    run = connected_components(g)
    comp = state_dict(run.state, "comp")
    assert comp == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5}


def test_isolated_vertices(tmp_graph_dir):
    import pyarrow as pa
    import ray.data

    vds = ray.data.from_arrow(
        pa.table({"vid": pa.array([0, 1, 2, 99], pa.int64())})
    )
    g = build_graph(
        edges_dataset([0], [1]),
        tmp_graph_dir,
        num_parts=2,
        vertices=vds,
        symmetrize=True,
    )
    run = connected_components(g)
    comp = state_dict(run.state, "comp")
    assert comp == {0: 0, 1: 0, 2: 2, 99: 99}


def test_idempotent_rerun(tmp_graph_dir):
    G = nx.gnm_random_graph(80, 100, seed=2)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    a = state_dict(connected_components(g).state, "comp")
    b = state_dict(connected_components(g).state, "comp")
    assert a == b
