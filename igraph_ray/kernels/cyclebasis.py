"""Minimum weight cycle basis (igraph ``igraph_minimum_cycle_basis``;
``nx.minimum_cycle_basis`` parity — exact, Horton 1987).

Horton's theorem: some minimum cycle basis is a subset of the candidate
set { C(v, e) : v a vertex, e = (x, y) an edge } where C(v, e) is the
shortest v->x path XOR the shortest v->y path XOR {e}.  The engine

1. fans the pivots out in parallel Ray tasks over a once-shared arc
   table (object store) — each task runs Dijkstra per pivot and emits
   candidate cycles as packed GF(2) edge bitsets with their EXACT
   post-cancellation weight,
2. greedily selects independent candidates in ascending weight order
   via Gaussian elimination over uint64 words until the cycle-space
   rank m - n + c is reached.

Distributed shape — DOCUMENTED BOUNDED-GATHER, like the max-flow
family: the greedy elimination is a sequential matroid step, so the
candidate set (n_pivots x m bits) flows to one task.  ``max_candidates``
(default n*m <= 4M) is the declared boundary; at 100-TB scale the
basis is asked of a bounded subgraph (k-core / component), exactly as
igraph's own O(nm) Horton routine would be.

The basis TOTAL WEIGHT and the rank are canonical invariants (the
minimum cycle basis weight is unique even when the basis is not) —
they are what the pytest oracle compares against networkx.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

MAX_CANDIDATES = 4_000_000


def _dijkstra_parents(off, adj_dst, adj_w, adj_eid, n, src):
    """Single-source Dijkstra over a CSR view; returns (parent_edge,
    dist) with deterministic lexicographic (dist, vid) pops."""
    import heapq

    INF = np.iinfo(np.int64).max
    dist = np.full(n, INF, dtype=np.int64)
    pedge = np.full(n, -1, dtype=np.int64)
    dist[src] = 0
    heap = [(0, src)]
    done = np.zeros(n, dtype=bool)
    while heap:
        d, v = heapq.heappop(heap)
        if done[v]:
            continue
        done[v] = True
        for i in range(off[v], off[v + 1]):
            w = adj_dst[i]
            nd = d + adj_w[i]
            if nd < dist[w]:
                dist[w] = nd
                pedge[w] = adj_eid[i]
                heapq.heappush(heap, (int(nd), int(w)))
    return pedge, dist


@ray.remote
def _cb_pivot_task(arcs: pa.Table, n: int, m: int, pivots: list[int]):
    """Candidates for a chunk of Horton pivots: per pivot one Dijkstra,
    then per edge the packed GF(2) bitset of path(x) ^ path(y) ^ {e}
    and its exact weight.  Returns (weights, bitset rows) arrays."""
    src = arcs.column("src").to_numpy(zero_copy_only=False)
    dst = arcs.column("dst").to_numpy(zero_copy_only=False)
    wgt = arcs.column("weight").to_numpy(zero_copy_only=False)

    # Horton's theorem needs (near-)unique shortest paths; run Dijkstra
    # on deterministically perturbed weights w*2^24 + eid-hash so SP
    # trees are tie-broken consistently, while candidate weights stay
    # EXACT in the original scale.  A perturbed-optimal basis is also
    # original-optimal when total perturbation < one original unit.
    pert = (
        wgt.astype(np.int64) * np.int64(1 << 24)
        + (np.arange(m, dtype=np.int64) * np.int64(2654435761) % np.int64(65536))
        + 1
    )
    # undirected CSR with edge ids
    u = np.concatenate([src, dst])
    v = np.concatenate([dst, src])
    w2 = np.concatenate([pert, pert])
    eid = np.concatenate([np.arange(m), np.arange(m)]).astype(np.int64)
    order = np.lexsort((v, u))
    u, v, w2, eid = u[order], v[order], w2[order], eid[order]
    off = np.zeros(n + 1, dtype=np.int64)
    np.add.at(off, u + 1, 1)
    np.cumsum(off, out=off)

    words = (m + 63) // 64
    esrc = src
    edst = dst
    out_w: list[int] = []
    out_bits: list[np.ndarray] = []
    for p in pivots:
        pedge, dist = _dijkstra_parents(off, v, w2, eid, n, p)
        # per-vertex path bitsets from the shortest-path tree, built
        # top-down in distance order (parent already done)
        path = np.zeros((n, words), dtype=np.uint64)
        reach = dist < np.iinfo(np.int64).max
        vorder = np.argsort(dist, kind="stable")
        for x in vorder:
            if not reach[x] or x == p:
                continue
            e = pedge[x]
            par = esrc[e] if edst[e] == x else edst[e]
            path[x] = path[par]
            path[x, e >> 6] ^= np.uint64(1) << np.uint64(e & 63)
        for e in range(m):
            x, y = esrc[e], edst[e]
            if x == y or not (reach[x] and reach[y]):
                continue
            bits = path[x] ^ path[y]
            bits[e >> 6] ^= np.uint64(1) << np.uint64(e & 63)
            if not bits.any():
                continue
            # exact post-cancellation weight
            idx = np.nonzero(
                (bits[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            )
            eids = idx[0] * 64 + idx[1]
            out_w.append(int(wgt[eids].sum()))
            out_bits.append(bits)
    if not out_bits:
        return np.zeros(0, dtype=np.int64), np.zeros((0, words), np.uint64)
    return np.array(out_w, dtype=np.int64), np.stack(out_bits)


def minimum_cycle_basis(
    edges: ray.data.Dataset,
    n: int,
    weight_col: str | None = None,
    pivot_chunk: int = 8,
    max_candidates: int = MAX_CANDIDATES,
) -> dict:
    """Exact minimum weight cycle basis.  Returns ``{"rank",
    "total_weight", "cycle_edges": pa.Table (cycle, src, dst, weight),
    "cycle_sizes": list[int]}``."""
    blocks = [
        b
        for b in edges.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    tbl = pa.concat_tables(blocks) if blocks else None
    if tbl is None or tbl.num_rows == 0:
        return {
            "rank": 0,
            "total_weight": 0,
            "cycle_edges": pa.table(
                {
                    "cycle": pa.array([], pa.int64()),
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "weight": pa.array([], pa.int64()),
                }
            ),
            "cycle_sizes": [],
        }
    src = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    if weight_col is not None:
        wgt = (
            tbl.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
    else:
        wgt = np.ones(len(src), dtype=np.int64)
    # canonical simple undirected edge list; parallel edges collapse
    # to their minimum weight (the engine's graph model is simple)
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    keep = lo != hi
    lo, hi, wgt = lo[keep], hi[keep], wgt[keep]
    order = np.lexsort((wgt, hi, lo))
    lo, hi, wgt = lo[order], hi[order], wgt[order]
    ids = lo * n + hi
    first = np.concatenate([[True], ids[1:] != ids[:-1]])
    lo, hi, wgt = lo[first], hi[first], wgt[first]
    m = len(lo)
    if n * m > max_candidates:
        raise NotImplementedError(
            f"minimum_cycle_basis bounded-gather limit: n*m = {n * m} > "
            f"{max_candidates}; run on a subgraph"
        )
    arcs = pa.table(
        {
            "src": pa.array(lo),
            "dst": pa.array(hi),
            "weight": pa.array(wgt),
        }
    )
    arcs_ref = ray.put(arcs)
    futs = [
        _cb_pivot_task.remote(
            arcs_ref, n, m, list(range(i, min(i + pivot_chunk, n)))
        )
        for i in range(0, n, pivot_chunk)
    ]
    parts = ray.get(futs)
    weights = np.concatenate([p[0] for p in parts])
    bits = np.concatenate([p[1] for p in parts])

    # matroid greedy: ascending (weight, bitset bytes) for determinism;
    # runs the candidates dry — the selected count IS the cycle-space
    # rank m - n + c, since the Horton set spans the cycle space.
    key = [b.tobytes() for b in bits]
    sel_order = sorted(range(len(weights)), key=lambda i: (weights[i], key[i]))
    basis: list[np.ndarray] = []
    pivots: list[int] = []
    chosen: list[int] = []
    for i in sel_order:
        vec = bits[i].copy()
        for piv, row in zip(pivots, basis):
            if (vec[piv >> 6] >> np.uint64(piv & 63)) & np.uint64(1):
                vec ^= row
        nz = np.nonzero(vec)[0]
        if nz.size == 0:
            continue
        wrd = int(nz[0])
        x = int(vec[wrd])
        pv = wrd * 64 + ((x & -x).bit_length() - 1)
        pivots.append(pv)
        basis.append(vec)
        chosen.append(i)
    # emit the ORIGINAL chosen candidate cycles (not the reduced rows)
    cyc_rows = {"cycle": [], "src": [], "dst": [], "weight": []}
    sizes = []
    total = 0
    for ci, i in enumerate(chosen):
        b = bits[i]
        idx = np.nonzero(
            (b[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        )
        eids = np.sort(idx[0] * 64 + idx[1])
        sizes.append(int(eids.size))
        total += int(wgt[eids].sum())
        cyc_rows["cycle"] += [ci] * len(eids)
        cyc_rows["src"] += lo[eids].tolist()
        cyc_rows["dst"] += hi[eids].tolist()
        cyc_rows["weight"] += wgt[eids].tolist()
    return {
        "rank": len(chosen),
        "total_weight": total,
        "cycle_edges": pa.table(
            {
                "cycle": pa.array(cyc_rows["cycle"], pa.int64()),
                "src": pa.array(cyc_rows["src"], pa.int64()),
                "dst": pa.array(cyc_rows["dst"], pa.int64()),
                "weight": pa.array(cyc_rows["weight"], pa.int64()),
            }
        ),
        "cycle_sizes": sizes,
    }
