"""Minimum cycle basis vs networkx / brute-force matroid oracle."""

import random

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from igraph_ray.kernels.cyclebasis import minimum_cycle_basis


def _run(G, weighted=False):
    src, dst, w = [], [], []
    for u, v, d in G.edges(data=True):
        src.append(u)
        dst.append(v)
        w.append(d.get("weight", 1))
    t = pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "weight": pa.array(w, pa.int64()),
        }
    )
    return minimum_cycle_basis(
        ray.data.from_arrow(t),
        G.number_of_nodes(),
        weight_col="weight" if weighted else None,
    )


def _check_valid_basis(G, res):
    """Every emitted cycle has all-even degrees over distinct edges,
    and the set is GF(2)-independent with rank m - n + c."""
    tbl = res["cycle_edges"]
    cyc = tbl.column("cycle").to_pylist()
    src = tbl.column("src").to_pylist()
    dst = tbl.column("dst").to_pylist()
    eidx = {tuple(sorted(e)): i for i, e in enumerate(G.edges())}
    m = len(eidx)
    vecs = {}
    for c, u, v in zip(cyc, src, dst):
        key = (min(u, v), max(u, v))
        assert key in eidx
        vecs.setdefault(c, set())
        assert eidx[key] not in vecs[c]  # distinct edges per cycle
        vecs[c].add(eidx[key])
    for c, edges_set in vecs.items():
        deg = {}
        for c2, u, v in zip(cyc, src, dst):
            if c2 == c:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
        assert all(d % 2 == 0 for d in deg.values())
    # GF(2) independence
    rows = []
    for c in sorted(vecs):
        vec = np.zeros(m, dtype=np.int64)
        vec[list(vecs[c])] = 1
        rows.append(vec)
    if rows:
        mat = np.array(rows) % 2
        # Gaussian elimination rank over GF(2)
        r = 0
        for col in range(m):
            piv = None
            for i in range(r, len(mat)):
                if mat[i][col]:
                    piv = i
                    break
            if piv is None:
                continue
            mat[[r, piv]] = mat[[piv, r]]
            for i in range(len(mat)):
                if i != r and mat[i][col]:
                    mat[i] = (mat[i] + mat[r]) % 2
            r += 1
        assert r == len(rows)
    c_comp = nx.number_connected_components(G)
    assert res["rank"] == G.number_of_edges() - G.number_of_nodes() + c_comp


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_mcb_unit_weights_vs_nx(ray_session, seed):
    G = nx.gnm_random_graph(20, 40, seed=seed)
    res = _run(G)
    ref = nx.minimum_cycle_basis(G)
    assert res["rank"] == len(ref)
    assert res["total_weight"] == sum(len(c) for c in ref)
    _check_valid_basis(G, res)


def test_mcb_classic_fixtures(ray_session):
    assert _run(nx.cycle_graph(7))["total_weight"] == 7
    assert _run(nx.path_graph(6))["rank"] == 0
    two = _run(nx.disjoint_union(nx.cycle_graph(4), nx.cycle_graph(5)))
    assert two["rank"] == 2 and two["total_weight"] == 9
    k7 = _run(nx.complete_graph(7))
    assert k7["rank"] == 15 and k7["total_weight"] == 45  # all triangles
    pet = _run(nx.petersen_graph())
    assert pet["rank"] == 6 and pet["total_weight"] == 30  # six 5-cycles


def _brute_mcb_weight(G):
    """Exact matroid-greedy over ALL simple cycles (tiny graphs only)."""
    eidx = {tuple(sorted(e)): i for i, e in enumerate(G.edges())}
    m = len(eidx)
    cand = []
    for nodes in nx.simple_cycles(G):
        k = len(nodes)
        edges = [
            tuple(sorted((nodes[i], nodes[(i + 1) % k]))) for i in range(k)
        ]
        w = sum(G[u][v].get("weight", 1) for u, v in edges)
        vec = np.zeros(m, dtype=np.int8)
        for e in edges:
            vec[eidx[e]] = 1
        cand.append((w, vec))
    cand.sort(key=lambda t: (t[0], t[1].tobytes()))
    basis = []
    total = 0
    for w, vec in cand:
        v = vec.copy()
        for piv, row in basis:
            if v[piv]:
                v = (v + row) % 2
        nz = np.nonzero(v)[0]
        if nz.size:
            basis.append((int(nz[0]), v))
            total += w
    return len(basis), total


@pytest.mark.parametrize("seed", [5, 6, 7])
def test_mcb_weighted_vs_bruteforce(ray_session, seed):
    G = nx.gnm_random_graph(9, 16, seed=seed)
    rng = random.Random(seed)
    for u, v in G.edges():
        G[u][v]["weight"] = rng.randint(1, 20)
    res = _run(G, weighted=True)
    rank_ref, total_ref = _brute_mcb_weight(G)
    assert res["rank"] == rank_ref
    assert res["total_weight"] == total_ref
    _check_valid_basis(G, res)
