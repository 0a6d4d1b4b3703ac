"""Erdős–Gallai graphicality certificate vs nx.is_graphical."""

import random

import networkx as nx

from igraph_ray.kernels.degree import erdos_gallai_slack


def _verdict(seq):
    t = erdos_gallai_slack(seq)
    return (sum(seq) % 2 == 0) and all(
        s >= 0 for s in t.column("slack").to_pylist()
    )


def test_eg_matches_nx_on_random_sequences():
    rng = random.Random(0)
    for _ in range(300):
        n = rng.randint(1, 12)
        seq = [rng.randint(0, n - 1) for _ in range(n)]
        assert _verdict(seq) == nx.is_graphical(seq), seq


def test_eg_real_graph_sequences_are_graphical():
    for seed in [1, 2, 3]:
        G = nx.gnm_random_graph(30, 90, seed=seed)
        seq = [d for _, d in G.degree()]
        t = erdos_gallai_slack(seq)
        assert _verdict(seq)
        assert t.num_rows == 30
        # lhs at k=n equals the total degree = 2m
        assert t.column("lhs").to_pylist()[-1] == 2 * G.number_of_edges()


def test_eg_classic_non_graphical():
    # odd total
    assert not _verdict([3, 2, 1, 1])
    # even total but EG-violating (two degree-3 vertices cannot both
    # be saturated by the remaining degree-1 stubs)
    assert not _verdict([3, 3, 1, 1])
    assert _verdict([2, 2, 2])  # triangle
    assert _verdict([])


def test_havel_hakimi_realization():
    import numpy as np

    from igraph_ray.kernels.degree import havel_hakimi_realize

    rng = random.Random(1)
    for _ in range(200):
        n = rng.randint(1, 15)
        seq = [rng.randint(0, n - 1) for _ in range(n)]
        graphical = nx.is_graphical(seq)
        try:
            t = havel_hakimi_realize(seq)
        except ValueError:
            assert not graphical, seq
            continue
        assert graphical, seq
        src = t.column("src").to_pylist()
        dst = t.column("dst").to_pylist()
        deg = np.zeros(n, dtype=int)
        for a, b in zip(src, dst):
            assert a != b  # no self-loops
            deg[a] += 1
            deg[b] += 1
        # simple graph: no parallel edges
        assert len({(min(a, b), max(a, b)) for a, b in zip(src, dst)}) == len(
            src
        )
        assert list(deg) == seq
