"""Deterministic random-walk corpus tests: the distributed walker
pipeline must reproduce the single-machine reference walk exactly
(same splitmix choice rule over dst-ascending adjacency)."""

import networkx as nx
import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.walks import random_walks, walk_choice
from tests.util import ds_to_table, graph_from_nx


def _ref_walk(G, wid, start, length, seed):
    path = [start]
    cur = start
    for step in range(1, length + 1):
        nbrs = sorted(G.neighbors(cur))
        if not nbrs:
            path.extend([-1] * (length + 1 - len(path)))
            break
        idx = int(
            walk_choice(
                np.array([wid], np.int64),
                step,
                seed,
                np.array([len(nbrs)], np.int64),
            )[0]
        )
        cur = nbrs[idx]
        path.append(cur)
    return path


def _walks_dict(ds, length):
    tbl = ds_to_table(ds)
    cols = [tbl.column(f"p{i}").to_pylist() for i in range(length + 1)]
    return {
        w: [cols[i][r] for i in range(length + 1)]
        for r, w in enumerate(tbl.column("walk_id").to_pylist())
    }


def test_walks_match_reference(tmp_graph_dir):
    G = nx.gnm_random_graph(100, 250, seed=11)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=4)
    starts = np.arange(100, dtype=np.int64)
    L = 12
    got = _walks_dict(random_walks(g, starts, L, seed=7), L)
    assert len(got) == 100
    for wid in range(100):
        assert got[wid] == _ref_walk(G, wid, wid, L, 7), wid


def test_walks_retire_at_dangling(tmp_graph_dir):
    # directed path 0→1→2 with no out-edges at 2: every walk retires
    from igraph_ray.api import build_graph, edges_dataset

    g = build_graph(
        edges_dataset([0, 1], [1, 2]),
        tmp_graph_dir,
        num_parts=2,
        symmetrize=False,
    )
    L = 5
    got = _walks_dict(random_walks(g, [0], L, seed=0), L)
    assert got[0] == [0, 1, 2, -1, -1, -1]


def test_walks_seed_changes_corpus(tmp_graph_dir):
    G = nx.gnm_random_graph(60, 200, seed=2)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    starts = np.arange(60, dtype=np.int64)
    a = _walks_dict(random_walks(g, starts, 8, seed=1), 8)
    b = _walks_dict(random_walks(g, starts, 8, seed=2), 8)
    assert a != b
    # and identical when repeated (bitwise reproducibility)
    a2 = _walks_dict(random_walks(g, starts, 8, seed=1), 8)
    assert a == a2


# ---------------------------------------------------------------------------
# node2vec second-order biased walks
# ---------------------------------------------------------------------------
def _seq_node2vec(G, starts, length, p, q, seed):
    """Sequential replay of the engine's deterministic rules."""
    import numpy as np

    from igraph_ray.kernels.walks import _u01_edge, walk_choice

    adj = {v: sorted(G.neighbors(v)) for v in G.nodes()}
    rows = []
    for wid, s in enumerate(starts):
        path = [int(s)]
        prev, cur = -1, int(s)
        for step in range(1, length + 1):
            nbrs = adj.get(cur, [])
            if cur < 0 or not nbrs:
                path.append(-1)
                cur = -1
                continue
            if step == 1:
                k = int(
                    walk_choice(
                        np.array([wid], np.int64),
                        step,
                        seed,
                        np.array([len(nbrs)], np.int64),
                    )[0]
                )
                nxt = nbrs[k]
            else:
                best_key, nxt = None, None
                for x in nbrs:
                    if x == prev:
                        b = 1.0 / p
                    elif G.has_edge(prev, x):
                        b = 1.0
                    else:
                        b = 1.0 / q
                    u = float(
                        _u01_edge(
                            np.array([wid], np.int64),
                            np.array([x], np.int64),
                            step,
                            seed,
                        )[0]
                    )
                    key = np.log(u) / b
                    if (
                        best_key is None
                        or key > best_key
                        or (key == best_key and x < nxt)
                    ):
                        best_key, nxt = key, x
            path.append(int(nxt))
            prev, cur = cur, int(nxt)
        rows.append((wid, path))
    return {wid: tuple(pp) for wid, pp in rows}


def _run_n2v(G, starts, length, p, q, seed=0, num_parts=4):
    import tempfile

    from igraph_ray.api import build_graph
    from igraph_ray.kernels.walks import node2vec_walks

    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "weight": pa.array(np.ones(len(src))),
            }
        )
    )
    verts = ray.data.from_arrow(
        pa.table({"vid": pa.array(sorted(G.nodes()), pa.int64())})
    )
    graph = build_graph(
        edges,
        tempfile.mkdtemp(prefix="igr_n2v_"),
        num_parts=num_parts,
        vertices=verts,
        symmetrize=True,
    )
    out = pa.concat_tables(
        node2vec_walks(graph, starts, length, p=p, q=q, seed=seed)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    cols = [f"p{i}" for i in range(length + 1)]
    return {
        r["walk_id"]: tuple(r[c] for c in cols) for r in out.to_pylist()
    }


def test_node2vec_matches_sequential_replay():
    import networkx as nx

    G = nx.gnm_random_graph(50, 160, seed=13)
    starts = list(range(0, 50, 3))
    for p, q in ((1.0, 1.0), (0.25, 4.0), (4.0, 0.25)):
        got = _run_n2v(G, starts, 8, p, q, seed=5)
        want = _seq_node2vec(G, starts, 8, p, q, 5)
        assert got == want


def test_node2vec_walks_are_paths_and_partition_invariant():
    import networkx as nx

    G = nx.gnm_random_graph(40, 100, seed=3)
    starts = list(range(0, 40, 4))
    a = _run_n2v(G, starts, 6, 0.5, 2.0, seed=1, num_parts=2)
    b = _run_n2v(G, starts, 6, 0.5, 2.0, seed=1, num_parts=7)
    assert a == b
    for wid, path in a.items():
        for i in range(len(path) - 1):
            if path[i + 1] >= 0:
                assert G.has_edge(path[i], path[i + 1])


def test_node2vec_weighted_matches_sequential_replay():
    import networkx as nx
    import tempfile

    from igraph_ray.api import build_graph
    from igraph_ray.kernels.walks import _u01_edge, node2vec_walks

    rng = np.random.default_rng(6)
    G = nx.gnm_random_graph(30, 90, seed=2)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.integers(1, 5))

    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    w = [G[u][v]["weight"] for u, v in G.edges()]
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
    graph = build_graph(
        edges,
        tempfile.mkdtemp(prefix="igr_n2vw_"),
        num_parts=4,
        vertices=verts,
        symmetrize=True,
    )
    starts = list(range(0, 30, 4))
    p, q, seed, L = 0.5, 2.0, 3, 6
    out = pa.concat_tables(
        node2vec_walks(
            graph, starts, L, p=p, q=q, seed=seed, weighted=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    cols = [f"p{i}" for i in range(L + 1)]
    got = {r["walk_id"]: tuple(r[c] for c in cols) for r in out.to_pylist()}

    # sequential replay: ES pick with bias = w (× n2v factor past hop 1)
    adj = {v: sorted(G.neighbors(v)) for v in G.nodes()}
    want = {}
    for wid, s in enumerate(starts):
        path = [int(s)]
        prev, cur = -1, int(s)
        for step in range(1, L + 1):
            nbrs = adj.get(cur, [])
            if cur < 0 or not nbrs:
                path.append(-1)
                cur = -1
                continue
            best_key, nxt = None, None
            for x in nbrs:
                b = G[cur][x]["weight"]
                if step > 1:
                    if x == prev:
                        b *= 1.0 / p
                    elif G.has_edge(prev, x):
                        b *= 1.0
                    else:
                        b *= 1.0 / q
                u = float(
                    _u01_edge(
                        np.array([wid], np.int64),
                        np.array([x], np.int64),
                        step,
                        seed,
                    )[0]
                )
                key = np.log(u) / b
                if best_key is None or key > best_key or (
                    key == best_key and x < nxt
                ):
                    best_key, nxt = key, x
            path.append(int(nxt))
            prev, cur = cur, int(nxt)
        want[wid] = tuple(path)
    assert got == want


def test_rebuild_same_dir_invalidates_worker_caches(tmp_graph_dir):
    # rebuilding a graph into the SAME directory inside one Ray session
    # must not let long-lived workers serve the previous build's
    # adjacency (ADVICE r3 medium: _ADJ_CACHE keyed only by dir+part)
    from igraph_ray.api import build_graph, edges_dataset
    from igraph_ray.stages.partition import GraphMeta

    g1 = build_graph(
        edges_dataset([0], [1]), tmp_graph_dir, num_parts=2, symmetrize=False
    )
    got1 = _walks_dict(random_walks(g1, [0], 2, seed=0), 2)
    assert got1[0] == [0, 1, -1]
    g2 = build_graph(
        edges_dataset([0], [2]), tmp_graph_dir, num_parts=2, symmetrize=False
    )
    assert g2.build_id and g2.build_id != g1.build_id
    assert GraphMeta.load(tmp_graph_dir).build_id == g2.build_id
    got2 = _walks_dict(random_walks(g2, [0], 2, seed=0), 2)
    assert got2[0] == [0, 2, -1]
