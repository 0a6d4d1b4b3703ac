"""k-dim Laplacian spectral embedding vs dense numpy.linalg.eigh."""

from __future__ import annotations

import tempfile

import networkx as nx
import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.api import build_graph
from igraph_ray.kernels.spectral_embed import spectral_embedding


def _graph(G, num_parts=3):
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    w = [d.get("weight", 1.0) for _, _, d in G.edges(data=True)]
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "weight": pa.array(w, pa.float64()),
            }
        )
    )
    verts = ray.data.from_arrow(
        pa.table({"vid": pa.array(sorted(G.nodes()), pa.int64())})
    )
    return build_graph(
        edges,
        tempfile.mkdtemp(prefix="igr_se_"),
        num_parts=num_parts,
        vertices=verts,
        symmetrize=True,
    )


def _dense_lap(G):
    nodes = sorted(G.nodes())
    pos = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    L = np.zeros((n, n))
    for u, v, d in G.edges(data=True):
        w = d.get("weight", 1.0)
        L[pos[u], pos[v]] -= w
        L[pos[v], pos[u]] -= w
        L[pos[u], pos[u]] += w
        L[pos[v], pos[v]] += w
    return L


def _run(G, k, tol=3e-9):
    graph = _graph(G)
    emb, lams = spectral_embedding(graph, G.number_of_nodes(), k=k, tol=tol)
    tbl = pa.concat_tables(
        emb.iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("vid")
    X = np.stack(
        [
            tbl.column(f"e{i}").to_numpy(zero_copy_only=False)
            for i in range(k)
        ],
        axis=1,
    )
    return X, lams


def test_spectral_embedding_path_graph():
    G = nx.path_graph(8)
    X, lams = _run(G, k=2)
    w, V = np.linalg.eigh(_dense_lap(G))
    # eigenvalues 1..3 (skipping the trivial 0)
    assert np.max(np.abs(lams - w[1:3])) < 1e-5
    for i in range(2):
        # individual eigenvector alignment up to sign
        assert abs(abs(X[:, i] @ V[:, i + 1]) - 1.0) < 1e-3, i


def test_spectral_embedding_weighted_barbell():
    # two K6 cliques + a 2-path bridge: the cluster-cut eigenvalues
    # sit far below the intra-clique spectrum, so the k=2 invariant
    # subspace converges fast — and the weights keep the spectrum
    # simple (weighted coverage)
    rng = np.random.default_rng(5)
    G = nx.barbell_graph(6, 2)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.integers(1, 4))
    assert nx.is_connected(G)
    X, lams = _run(G, k=2)
    w, V = np.linalg.eigh(_dense_lap(G))
    assert np.max(np.abs(lams - w[1:3])) < 1e-5
    for i in range(2):
        assert abs(abs(X[:, i] @ V[:, i + 1]) - 1.0) < 1e-3, i
    # lanes orthonormal
    assert np.max(np.abs(X.T @ X - np.eye(2))) < 1e-8
    # column 0 = Fiedler direction
    assert abs(lams[0] - w[1]) < 1e-5


def test_spectral_embedding_degenerate_pair_subspace():
    # C6 has doubly-degenerate eigenvalues: compare subspaces, not
    # individual vectors
    G = nx.cycle_graph(6)
    X, lams = _run(G, k=2)
    w, V = np.linalg.eigh(_dense_lap(G))
    assert np.max(np.abs(lams - w[1:3])) < 1e-5
    P_true = V[:, 1:3] @ V[:, 1:3].T
    P_got = X @ X.T
    assert np.max(np.abs(P_true - P_got)) < 1e-3
