"""Eigenvector centrality + HITS oracle tests (igraph
``eigenvector_centrality`` / ``hub_score`` / ``authority_score``
parity; nx twin for eigenvector, dense-numpy eigendecomposition for
HITS since scipy/nx.hits is unavailable in this container)."""

import numpy as np
import networkx as nx
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.kernels.eigenvector import eigenvector_centrality
from igraph_ray.kernels.hits import hits
from tests.util import ds_to_table, graph_from_nx, nx_edge_arrays


def _col_dict(ds, col):
    tbl = ds_to_table(ds)
    return dict(
        zip(tbl.column("vid").to_pylist(), tbl.column(col).to_pylist())
    )


def test_eigenvector_matches_nx_gnm(tmp_graph_dir):
    G = nx.gnm_random_graph(80, 240, seed=19)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    got = _col_dict(
        eigenvector_centrality(g, G.number_of_nodes(), tol=1e-8), "centrality"
    )
    ref = nx.eigenvector_centrality(G, tol=1e-8, max_iter=500)
    for v in G.nodes():
        assert got[v] == pytest.approx(ref[v], abs=1e-5), v


def test_eigenvector_path_graph_symmetry(tmp_graph_dir):
    G = nx.path_graph(7)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    got = _col_dict(
        eigenvector_centrality(g, 7, tol=1e-10, max_iter=1000), "centrality"
    )
    # symmetric path: centrality symmetric around the middle, max at 3
    assert got[0] == pytest.approx(got[6], abs=1e-6)
    assert got[1] == pytest.approx(got[5], abs=1e-6)
    assert max(got, key=got.get) == 3


def test_eigenvector_raises_on_nonconvergence(tmp_graph_dir):
    from igraph_ray.kernels.pagerank import PowerIterationFailedConvergence

    G = nx.gnm_random_graph(30, 60, seed=3)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    with pytest.raises(PowerIterationFailedConvergence):
        eigenvector_centrality(g, 30, tol=1e-14, max_iter=2)


def _dense_hits_reference(G, n):
    A = np.zeros((n, n))
    for u, v in G.edges():
        A[u, v] = 1.0
    def principal(M):
        w, V = np.linalg.eigh(M)
        vec = np.abs(V[:, np.argmax(w)])
        return vec / vec.sum()
    return principal(A.T @ A), principal(A @ A.T)  # authorities, hubs


def test_hits_matches_dense_eig(tmp_graph_dir):
    G = nx.gnp_random_graph(40, 0.12, seed=7, directed=True)
    n = G.number_of_nodes()
    src, dst = nx_edge_arrays(G)
    arcs = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    )
    out = ds_to_table(hits(arcs, tmp_graph_dir, n, tol=1e-10))
    auth = dict(zip(out.column("vid").to_pylist(), out.column("authority").to_pylist()))
    hub = dict(zip(out.column("vid").to_pylist(), out.column("hub").to_pylist()))
    ref_a, ref_h = _dense_hits_reference(G, n)
    assert len(auth) == n
    for v in range(n):
        assert auth[v] == pytest.approx(ref_a[v], abs=1e-5), ("a", v)
        assert hub[v] == pytest.approx(ref_h[v], abs=1e-5), ("h", v)


def test_hits_star_graph(tmp_graph_dir):
    # arcs 1→0, 2→0, 3→0: vertex 0 is the only authority, 1-3 equal hubs
    arcs = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 2, 3], pa.int64()),
                "dst": pa.array([0, 0, 0], pa.int64()),
            }
        )
    )
    out = ds_to_table(hits(arcs, tmp_graph_dir, 4, tol=1e-10))
    auth = dict(zip(out.column("vid").to_pylist(), out.column("authority").to_pylist()))
    hub = dict(zip(out.column("vid").to_pylist(), out.column("hub").to_pylist()))
    assert auth[0] == pytest.approx(1.0)
    for v in (1, 2, 3):
        assert auth[v] == pytest.approx(0.0)
        assert hub[v] == pytest.approx(1 / 3)
    assert hub[0] == pytest.approx(0.0)


def test_eigenvector_fixed_integer_direction(tmp_graph_dir):
    """The integer-exact fixed-power variant (the SQL-twin surface)
    points in the nx eigenvector direction and is bitwise stable
    across partitionings."""
    from igraph_ray.kernels.eigenvector import eigenvector_fixed_integer

    G = nx.gnm_random_graph(80, 240, seed=19)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    tbl = eigenvector_fixed_integer(g, G.number_of_nodes())
    got = dict(
        zip(tbl.column("vid").to_pylist(), tbl.column("centrality").to_pylist())
    )
    ref = nx.eigenvector_centrality(G, tol=1e-10, max_iter=1000)
    a = np.array([got[v] for v in sorted(G.nodes())])
    b = np.array([ref[v] for v in sorted(G.nodes())])
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.995, cos
    assert abs(float(a @ a) - 1.0) < 1e-12  # L2-normalized output

    g2 = graph_from_nx(G, f"{tmp_graph_dir}/alt", num_parts=5)
    tbl2 = eigenvector_fixed_integer(g2, G.number_of_nodes())
    got2 = dict(
        zip(tbl2.column("vid").to_pylist(), tbl2.column("centrality").to_pylist())
    )
    assert got == got2  # bitwise partition-independence


def test_hits_fixed_integer_direction(tmp_graph_dir):
    """Integer-exact fixed-power HITS (the SQL-twin surface): both
    halves point in the dense-eig direction; sum-normalized."""
    from igraph_ray.kernels.hits import hits_fixed_integer

    G = nx.gnp_random_graph(40, 0.12, seed=7, directed=True)
    n = G.number_of_nodes()
    src, dst = nx_edge_arrays(G)
    arcs = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    )
    out = hits_fixed_integer(arcs, tmp_graph_dir, n)
    auth = np.array(out.column("authority").to_pylist())
    hub = np.array(out.column("hub").to_pylist())
    ref_a, ref_h = _dense_hits_reference(G, n)
    vids = out.column("vid").to_pylist()
    a = np.array([ref_a[v] for v in vids])
    h = np.array([ref_h[v] for v in vids])

    def cos(x, y):
        return float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y) + 1e-30))

    assert cos(auth, a) > 0.99, cos(auth, a)
    assert cos(hub, h) > 0.99, cos(hub, h)
    assert abs(auth.sum() - 1.0) < 1e-9
    assert abs(hub.sum() - 1.0) < 1e-9
