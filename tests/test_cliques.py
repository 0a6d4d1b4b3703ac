"""K4 counting vs a brute-force oracle on random graphs."""

from itertools import combinations

import networkx as nx
import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.cliques import four_clique_counts, total_four_cliques
from tests.util import ds_to_table


def _edges_ds(G):
    src = np.array([u for u, v in G.edges()], dtype=np.int64)
    dst = np.array([v for u, v in G.edges()], dtype=np.int64)
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).repartition(4)


def _oracle(G):
    want = {v: 0 for v in G.nodes()}
    total = 0
    adj = {v: set(G[v]) for v in G.nodes()}
    for a, b, c, d in combinations(sorted(G.nodes()), 4):
        if (
            b in adj[a]
            and c in adj[a]
            and d in adj[a]
            and c in adj[b]
            and d in adj[b]
            and d in adj[c]
        ):
            total += 1
            for x in (a, b, c, d):
                want[x] += 1
    return want, total


def test_four_cliques_dense_random():
    G = nx.gnp_random_graph(40, 0.35, seed=7)
    got = ds_to_table(
        four_clique_counts(
            _edges_ds(G),
            vertices=ray.data.from_arrow(
                pa.table({"vid": pa.array(sorted(G.nodes()), pa.int64())})
            ),
        )
    )
    rows = dict(
        zip(got.column("vid").to_pylist(), got.column("c4").to_pylist())
    )
    want, total = _oracle(G)
    assert rows == want
    assert total > 0  # fixture sanity: the graph actually has K4s
    assert sum(rows.values()) // 4 == total


def test_four_cliques_sparse_plus_planted():
    G = nx.gnm_random_graph(120, 240, seed=3)
    # plant two overlapping K4s and a K5 (5 K4s inside)
    for quad in ([200, 201, 202, 203], [202, 203, 204, 205]):
        for x, y in combinations(quad, 2):
            G.add_edge(x, y)
    for x, y in combinations([300, 301, 302, 303, 304], 2):
        G.add_edge(x, y)
    got = ds_to_table(
        four_clique_counts(
            _edges_ds(G),
            vertices=ray.data.from_arrow(
                pa.table({"vid": pa.array(sorted(G.nodes()), pa.int64())})
            ),
        )
    )
    rows = dict(
        zip(got.column("vid").to_pylist(), got.column("c4").to_pylist())
    )
    want, total = _oracle(G)
    assert rows == want
    assert rows[300] == 4  # each K5 vertex is in C(4,3)=4 K4s
    assert total >= 7


def test_total_four_cliques():
    G = nx.complete_graph(6)  # C(6,4) = 15
    ds = four_clique_counts(_edges_ds(G))
    assert total_four_cliques(ds) == 15


def test_four_cycle_count_known_graphs():
    import networkx as nx
    import numpy as np

    from igraph_ray.kernels.cliques import four_cycle_count

    def arcs_of(G):
        from tests.util import nx_edge_arrays

        src, dst = nx_edge_arrays(G)
        s = np.concatenate([src, dst])
        d = np.concatenate([dst, src])
        return ray.data.from_arrow(
            pa.table({"src": pa.array(s), "dst": pa.array(d)})
        ).repartition(3)

    def dense_c4(G):
        nodes = sorted(G.nodes())
        idx = {v: i for i, v in enumerate(nodes)}
        n = len(nodes)
        A = np.zeros((n, n), np.int64)
        for u, v in G.edges():
            if u != v:
                A[idx[u], idx[v]] = A[idx[v], idx[u]] = 1
        co = A @ A
        tot = 0
        for i in range(n):
            for j in range(i + 1, n):
                m = co[i, j]
                tot += m * (m - 1) // 2
        return tot // 2

    cases = [
        (nx.complete_graph(4), 3),
        (nx.cycle_graph(4), 1),
        (nx.petersen_graph(), 0),  # girth 5
        (nx.complete_bipartite_graph(2, 3), 3),
        (nx.gnm_random_graph(30, 90, seed=8), None),
    ]
    for G, known in cases:
        got = four_cycle_count(arcs_of(G))
        want = dense_c4(G) if known is None else known
        assert got == want, (G, got, want)


def test_maximal_cliques_vs_nx():
    import networkx as nx
    import ray.data

    from igraph_ray.kernels.maxcliques import maximal_cliques

    for seed, n, m in ((3, 30, 90), (7, 40, 160), (11, 25, 120)):
        G = nx.gnm_random_graph(n, m, seed=seed)
        ds = _edges_ds(G)
        verts = ray.data.from_arrow(
            pa.table({"vid": pa.array(sorted(G.nodes()), pa.int64())})
        )
        got = {
            frozenset(r["clique"])
            for r in maximal_cliques(ds, vertices=verts).iter_rows()
        }
        want = {frozenset(c) for c in nx.find_cliques(G)}
        assert got == want, seed


def test_maximal_cliques_isolated_and_min_size():
    import networkx as nx
    import ray.data

    from igraph_ray.kernels.maxcliques import maximal_cliques

    G = nx.complete_graph(4)
    G.add_edge(10, 11)
    G.add_node(42)  # isolated -> maximal singleton
    ds = _edges_ds(G)
    verts = ray.data.from_arrow(
        pa.table({"vid": pa.array(sorted(G.nodes()), pa.int64())})
    )
    got = {
        frozenset(r["clique"])
        for r in maximal_cliques(ds, vertices=verts).iter_rows()
    }
    assert got == {
        frozenset({0, 1, 2, 3}),
        frozenset({10, 11}),
        frozenset({42}),
    }
    big = {
        frozenset(r["clique"])
        for r in maximal_cliques(ds, vertices=verts, min_size=3).iter_rows()
    }
    assert big == {frozenset({0, 1, 2, 3})}


# ---------------------------------------------------------------------------
# square clustering (nx.square_clustering)
# ---------------------------------------------------------------------------
def test_square_clustering_vs_nx():
    import networkx as nx

    from igraph_ray.kernels.cliques import square_clustering

    for G in (
        nx.cycle_graph(4),
        nx.complete_bipartite_graph(3, 4),
        nx.gnm_random_graph(40, 120, seed=8),
        nx.star_graph(6),
        nx.gnm_random_graph(60, 90, seed=21),
    ):
        src = [u for u, v in G.edges()]
        dst = [v for u, v in G.edges()]
        pairs = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array(src, pa.int64()),
                    "dst": pa.array(dst, pa.int64()),
                }
            )
        )
        verts = ray.data.from_arrow(
            pa.table({"vid": pa.array(sorted(G.nodes()), pa.int64())})
        )
        out = pa.concat_tables(
            square_clustering(pairs, vertices=verts).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
        got = dict(
            zip(
                out.column("vid").to_pylist(),
                out.column("squares").to_pylist(),
            )
        )
        want = nx.square_clustering(G)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == want[v] or abs(got[v] - want[v]) < 1e-12, (
                G,
                v,
                got[v],
                want[v],
            )


def test_local_efficiency_vs_nx():
    import networkx as nx

    from igraph_ray.kernels.cliques import local_efficiency

    for G in (
        nx.gnm_random_graph(30, 90, seed=5),
        nx.star_graph(5),
        nx.complete_graph(6),
        nx.path_graph(7),
        nx.gnm_random_graph(40, 60, seed=17),
    ):
        src = [u for u, v in G.edges()]
        dst = [v for u, v in G.edges()]
        pairs = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array(src, pa.int64()),
                    "dst": pa.array(dst, pa.int64()),
                }
            )
        )
        got = local_efficiency(pairs, G.number_of_nodes())
        want = nx.local_efficiency(G)
        assert abs(got - want) < 1e-12, (got, want)
