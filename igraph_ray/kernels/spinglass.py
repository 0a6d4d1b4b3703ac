"""Spinglass community detection — igraph ``community_spinglass``
(Reichardt & Bornholdt 2006, "Statistical mechanics of community
detection"): minimize the Potts Hamiltonian

    H(σ) = -Σ_{ij} (A_ij − γ·k_i k_j / 2m) δ(σ_i, σ_j)

(the configuration-model null, igraph's default) over at most
``spins`` spin states by simulated annealing with a geometric
cooling schedule — at γ=1 minimizing H is exactly maximizing
modularity, which anchors the quality oracle.

Distributed shape — DOCUMENTED BOUNDED-GATHER operator, the same
policy as walktrap/CNM: annealing is an inherently sequential chain
of single-vertex Metropolis updates (igraph's implementation is the
same single-memory loop), so the collapsed one-arc table ships to
ONE Ray task; the parallel-arc collapse shuffle runs on the
cluster.  At 100-TB scale run it on a community quotient.

Determinism: seeded PCG64 drives the entire proposal/acceptance
stream — same seed ⇒ bitwise-identical labels, any partitioning
(the gathered one-arc table is canonically sorted first).

Oracle: ``tests/test_spinglass.py`` — planted-partition recovery
(ring of cliques, SBM), modularity within 95% of Louvain's on random
graphs, determinism, and the γ-sensitivity sanity (higher γ ⇒ at
least as many communities).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.stages.symmetrize import symmetrize_dedup

GATHER_MAX_ARCS_SG = 20_000_000


def _spinglass_py(
    vids: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    spins: int,
    gamma: float,
    seed: int,
    t_start: float,
    t_stop: float,
    cool: float,
) -> np.ndarray:
    """Annealing loop on the canonical one-arc view; returns the
    community label per vid (min member vid of the spin class)."""
    n = len(vids)
    a = np.searchsorted(vids, src)
    b = np.searchsorted(vids, dst)
    k = np.zeros(n, np.float64)
    np.add.at(k, a, w)
    np.add.at(k, b, w)
    m = float(w.sum())
    if m <= 0:
        raise ValueError("spinglass requires positive total weight")
    two_m = 2.0 * m

    # adjacency lists (index + weight) for O(deg) ΔH updates
    order = np.argsort(a, kind="stable")
    heads = np.concatenate([a[order], b[order]])
    tails = np.concatenate([b[order], a[order]])
    ws = np.concatenate([w[order], w[order]])
    o2 = np.argsort(heads, kind="stable")
    heads, tails, ws = heads[o2], tails[o2], ws[o2]
    indptr = np.searchsorted(heads, np.arange(n + 1))

    rng = np.random.Generator(np.random.PCG64(seed))
    q = int(min(spins, n))
    sigma = rng.integers(0, q, n)
    K = np.zeros(q, np.float64)  # degree mass per spin
    np.add.at(K, sigma, k)

    t = t_start
    while t > t_stop:
        vs = rng.integers(0, n, n)
        props = rng.integers(0, q, n)
        us = rng.random(n)
        for v, new, u in zip(vs, props, us):
            old = sigma[v]
            if new == old:
                continue
            lo, hi = indptr[v], indptr[v + 1]
            nb = tails[lo:hi]
            nw = ws[lo:hi]
            sn = sigma[nb]
            l_old = float(nw[sn == old].sum())
            l_new = float(nw[sn == new].sum())
            kv = k[v]
            null_old = gamma * kv * (K[old] - kv) / two_m
            null_new = gamma * kv * K[new] / two_m
            dH = -(l_new - l_old) + (null_new - null_old)
            if dH <= 0 or u < np.exp(-dH / t):
                sigma[v] = new
                K[old] -= kv
                K[new] += kv
        t *= cool

    # greedy zero-temperature sweep to a local optimum (deterministic
    # vertex order) — removes stray thermal spins
    for _ in range(3):
        changed = False
        for v in range(n):
            lo, hi = indptr[v], indptr[v + 1]
            nb = tails[lo:hi]
            nw = ws[lo:hi]
            sn = sigma[nb]
            links = np.zeros(q, np.float64)
            np.add.at(links, sn, nw)
            old = sigma[v]
            kv = k[v]
            Kadj = K.copy()
            Kadj[old] -= kv
            gain = links - gamma * kv * Kadj / two_m
            best = int(np.argmax(gain))
            if gain[best] > gain[old] + 1e-12:
                sigma[v] = best
                K[old] -= kv
                K[best] += kv
                changed = True
        if not changed:
            break

    # canonical labels: min member vid per spin class
    label = np.full(q, np.iinfo(np.int64).max, np.int64)
    np.minimum.at(label, sigma, vids)
    return label[sigma]


@ray.remote
def _sg_task(blocks, spins, gamma, seed, t_start, t_stop, cool):
    tables = [t for t in ray.get(list(blocks)) if t.num_rows]
    tbl = pa.concat_tables(tables)
    src = tbl.column("src").to_numpy(zero_copy_only=False)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False)
    w = tbl.column("weight").to_numpy(zero_copy_only=False)
    keep = src < dst
    src, dst, w = src[keep], dst[keep], w[keep]
    o = np.lexsort((dst, src))  # canonical order: partition-invariant
    src, dst, w = src[o], dst[o], w[o]
    vids = np.unique(np.concatenate([src, dst]))
    lab = _spinglass_py(
        vids, src, dst, w, spins, gamma, seed, t_start, t_stop, cool
    )
    return pa.table({"vid": pa.array(vids), "community": pa.array(lab)})


def spinglass(
    edges: ray.data.Dataset,
    spins: int = 25,
    gamma: float = 1.0,
    seed: int = 42,
    t_start: float = 0.5,
    t_stop: float = 0.005,
    cool: float = 0.995,
    gather_max_arcs: int = GATHER_MAX_ARCS_SG,
    auto_coarsen: bool = True,
) -> ray.data.Dataset:
    """Spinglass communities over the undirected weighted view of
    ``edges``; rows ``(vid, community)`` with community = min member
    vid.  Self-loops are dropped (they contribute a constant to H).

    Past ``gather_max_arcs`` with ``auto_coarsen=True`` (default) the
    graph is first contracted to its distributed-Louvain quotient and
    the annealer runs on the quotient (the same recipe as
    fastgreedy/GN/walktrap, ``kernels/coarsen.py``); the returned
    dataset then carries ``approximated=True`` as an attribute.
    ``auto_coarsen=False`` restores the loud raise."""
    from igraph_ray.kernels.coarsen import (
        gather_labels,
        louvain_quotient,
        project_assignment,
    )

    arcs = symmetrize_dedup(edges, keep_self_loops=False).materialize()
    n_arcs = arcs.count()
    if n_arcs > gather_max_arcs:
        if not auto_coarsen:
            raise NotImplementedError(
                f"spinglass bounded-gather limit: {n_arcs} arcs > "
                f"{gather_max_arcs}; run on a quotient/component "
                "subgraph or raise gather_max_arcs"
            )
        coarse_edges, assignment = louvain_quotient(arcs)
        qassign = spinglass(
            coarse_edges,
            spins=spins,
            gamma=gamma,
            seed=seed,
            t_start=t_start,
            t_stop=t_stop,
            cool=cool,
            gather_max_arcs=gather_max_arcs,
            auto_coarsen=False,
        )
        out = project_assignment(assignment, gather_labels(qassign))
        out.approximated = True
        return out
    refs = arcs.to_arrow_refs()
    out = ray.get(
        _sg_task.remote(refs, spins, gamma, seed, t_start, t_stop, cool)
    )
    ds = ray.data.from_arrow(out)
    ds.approximated = False
    return ds
