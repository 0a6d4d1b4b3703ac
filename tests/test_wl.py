"""WL color refinement vs local replay + networkx WL classes."""

import networkx as nx
import numpy as np

from igraph_ray.kernels.wl import wl_colors, wl_graph_hash
from igraph_ray.utils import hash_int64
from tests.util import graph_from_nx

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _local_wl(G, rounds):
    nodes = sorted(G.nodes())
    color = {v: np.int64(1) for v in nodes}
    for _ in range(rounds):
        new = {}
        for v in nodes:
            msum = np.uint64(0)
            with np.errstate(over="ignore"):
                for u in G.neighbors(v):
                    if u == v:
                        continue
                    msum += hash_int64(
                        np.asarray([color[u]], np.int64)
                    )[0]
                own = np.asarray([color[v]], np.int64).view(np.uint64)[0]
                mixed = (
                    hash_int64(
                        np.asarray([own], np.uint64).view(np.int64)
                    )[0]
                    + msum
                    + _MIX
                )
            new[v] = hash_int64(
                np.asarray([mixed], np.uint64).view(np.int64)
            ).view(np.int64)[0]
        color = new
    return color


def _colors(run):
    out = {}
    for b in run.state.iter_batches(batch_format="pyarrow", batch_size=None):
        out.update(
            zip(b.column("vid").to_pylist(), b.column("color").to_pylist())
        )
    return out


def _partition(colors):
    groups = {}
    for v, c in colors.items():
        groups.setdefault(c, set()).add(v)
    return {frozenset(g) for g in groups.values()}


def test_wl_bitwise_vs_local_replay(tmp_graph_dir):
    G = nx.gnm_random_graph(50, 110, seed=9)
    graph = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    run = wl_colors(graph, rounds=3)
    got = _colors(run)
    want = _local_wl(G, 3)
    assert got == {v: int(c) for v, c in want.items()}


def test_wl_partition_matches_nx_subtree_classes(tmp_graph_dir):
    # after k rounds, two vertices share our color iff nx's WL subtree
    # hash (same depth) is equal
    G = nx.random_regular_graph(3, 14, seed=4)
    G.add_edge(0, 1)  # break regularity so classes are nontrivial
    graph = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    run = wl_colors(graph, rounds=3)
    ours = _partition(_colors(run))
    nx_h = nx.weisfeiler_lehman_subgraph_hashes(G, iterations=3)
    nx_colors = {v: h[-1] for v, h in nx_h.items()}
    assert ours == _partition(nx_colors)


def test_wl_graph_hash_isomorphism_invariance(tmp_graph_dir):
    G1 = nx.petersen_graph()
    # relabeled copy: isomorphic, different vids
    perm = {i: (i * 7 + 3) % 10 + 100 for i in range(10)}
    G2 = nx.relabel_nodes(G1, perm)
    G2 = nx.convert_node_labels_to_integers(
        G2, ordering="sorted"
    )
    g1 = graph_from_nx(G1, f"{tmp_graph_dir}/a", num_parts=2)
    g2 = graph_from_nx(G2, f"{tmp_graph_dir}/b", num_parts=3)
    h1 = wl_graph_hash(wl_colors(g1, rounds=3))
    h2 = wl_graph_hash(wl_colors(g2, rounds=3))
    assert h1 == h2
    # a non-isomorphic graph with the same size hashes differently
    G3 = nx.circulant_graph(10, [1, 2])  # also 10 nodes, 3-regular? no:
    # circulant(10,[1,2]) is 4-regular with 20 edges — different
    # degree sequence, certainly non-isomorphic
    g3 = graph_from_nx(G3, f"{tmp_graph_dir}/c", num_parts=2)
    h3 = wl_graph_hash(wl_colors(g3, rounds=3))
    assert h3 != h1
