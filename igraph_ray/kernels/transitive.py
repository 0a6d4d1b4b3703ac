"""Transitive reduction of a DAG (``nx.transitive_reduction`` parity;
igraph exposes the equivalent via ``igraph_transitive_closure`` +
minimal equivalent graph tooling).

The reduction of a DAG is UNIQUE: keep arc (u, v) iff there is no
other path u => v.  Vectorized bitset algorithm: process vertices in
reverse topological order maintaining packed GF(2) descendant sets
``desc[v] = union over successors w of ({w} | desc[w])``; an arc
(u, v) is redundant iff v lies in ``union over w in succ(u) of
desc[w]`` — everything reachable from u in >= 2 steps.

Distributed shape — DOCUMENTED BOUNDED-GATHER like the max-flow
family: the reduction needs global reachability, so the (bounded) arc
table is gathered into one task; the intended input is a CONDENSATION
DAG (one vertex per SCC — orders of magnitude smaller than the
graph), produced by the distributed SCC + condensation kernels.
``max_cells`` bounds V * V/64 bitset memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

MAX_CELLS = 2_000_000_000  # V * words(V) cells ~ 16 GB hard stop


@ray.remote
def _tr_task(blocks):
    tables = [t for t in ray.get(list(blocks)) if t.num_rows]
    if not tables:
        return pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    tbl = pa.concat_tables(tables)
    src = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    # dedup arcs, compact vertex ids
    ids = np.unique(np.concatenate([src, dst]))
    s = np.searchsorted(ids, src)
    d = np.searchsorted(ids, dst)
    arc = np.unique(s * len(ids) + d)
    s, d = arc // len(ids), arc % len(ids)
    n = len(ids)
    words = (n + 63) // 64

    # CSR over sources
    order = np.lexsort((d, s))
    s, d = s[order], d[order]
    off = np.zeros(n + 1, dtype=np.int64)
    np.add.at(off, s + 1, 1)
    np.cumsum(off, out=off)

    # Kahn topological order (raises on cycles — input must be a DAG)
    indeg = np.bincount(d, minlength=n)
    topo = []
    stack = sorted(np.flatnonzero(indeg == 0).tolist())
    indeg = indeg.copy()
    while stack:
        v = stack.pop()
        topo.append(v)
        for i in range(off[v], off[v + 1]):
            w = d[i]
            indeg[w] -= 1
            if indeg[w] == 0:
                stack.append(int(w))
    if len(topo) != n:
        raise ValueError("transitive_reduction: input has a cycle")

    desc = np.zeros((n, words), dtype=np.uint64)
    keep_s: list[np.ndarray] = []
    keep_d: list[np.ndarray] = []
    for v in reversed(topo):
        lo, hi = off[v], off[v + 1]
        if lo == hi:
            continue
        succ = d[lo:hi]
        # >= 2-step reachability from v
        acc = np.bitwise_or.reduce(desc[succ], axis=0)
        redundant = (
            (acc[succ >> 6] >> (succ & 63).astype(np.uint64))
            & np.uint64(1)
        ).astype(bool)
        kept = succ[~redundant]
        keep_s.append(np.full(len(kept), v, dtype=np.int64))
        keep_d.append(kept)
        # desc[v] = acc | bits(succ)
        mine = acc.copy()
        np.bitwise_or.at(
            mine, succ >> 6, np.uint64(1) << (succ & 63).astype(np.uint64)
        )
        desc[v] = mine
    if keep_s:
        ks = np.concatenate(keep_s)
        kd = np.concatenate(keep_d)
        o = np.lexsort((kd, ks))
        ks, kd = ks[o], kd[o]
    else:
        ks = np.zeros(0, dtype=np.int64)
        kd = np.zeros(0, dtype=np.int64)
    return pa.table(
        {"src": pa.array(ids[ks]), "dst": pa.array(ids[kd])}
    )


def transitive_reduction(
    arcs: ray.data.Dataset, max_cells: int = MAX_CELLS
) -> pa.Table:
    """Unique transitive reduction of a DAG arc table ``(src, dst)``.
    Returns the kept arcs (original vertex ids, (src, dst)-sorted)."""
    # cell bound: distinct vertices unknown pre-gather; arc count is
    # the cheap proxy (V <= 2 * arcs)
    m = arcs.count()
    v_bound = 2 * m
    if v_bound * ((v_bound + 63) // 64) > max_cells:
        raise NotImplementedError(
            f"transitive_reduction bitset bound exceeded for {m} arcs"
        )
    refs = arcs.select_columns(["src", "dst"]).to_arrow_refs()
    return ray.get(_tr_task.remote(refs))


@ray.remote(num_cpus=1)
def _tc_task(blocks):
    tables = [t for t in ray.get(list(blocks)) if t.num_rows]
    if not tables:
        return pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    tbl = pa.concat_tables(tables)
    src = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    ids = np.unique(np.concatenate([src, dst]))
    s = np.searchsorted(ids, src)
    d = np.searchsorted(ids, dst)
    arc = np.unique(s * len(ids) + d)
    s, d = arc // len(ids), arc % len(ids)
    n = len(ids)

    order = np.lexsort((d, s))
    s, d = s[order], d[order]
    off = np.zeros(n + 1, dtype=np.int64)
    np.add.at(off, s + 1, 1)
    np.cumsum(off, out=off)

    indeg = np.bincount(d, minlength=n)
    topo = []
    stack = sorted(np.flatnonzero(indeg == 0).tolist())
    indeg = indeg.copy()
    while stack:
        v = stack.pop()
        topo.append(v)
        for i in range(off[v], off[v + 1]):
            w = d[i]
            indeg[w] -= 1
            if indeg[w] == 0:
                stack.append(int(w))
    if len(topo) != n:
        raise ValueError("transitive_closure: input has a cycle")

    words = (n + 63) // 64
    desc = np.zeros((n, words), dtype=np.uint64)
    for v in reversed(topo):
        lo, hi = off[v], off[v + 1]
        if lo == hi:
            continue
        succ = d[lo:hi]
        acc = np.bitwise_or.reduce(desc[succ], axis=0)
        np.bitwise_or.at(
            acc, succ >> 6, np.uint64(1) << (succ & 63).astype(np.uint64)
        )
        desc[v] = acc
    # unpack: all (v, reachable) pairs
    out_s: list[np.ndarray] = []
    out_d: list[np.ndarray] = []
    bitpos = np.arange(64, dtype=np.uint64)
    for v in range(n):
        row = desc[v]
        nz = np.flatnonzero(row)
        if not len(nz):
            continue
        hits = []
        for wi in nz:
            bits = np.flatnonzero((row[wi] >> bitpos) & np.uint64(1))
            hits.append(np.int64(wi) * 64 + bits.astype(np.int64))
        hv = np.concatenate(hits)
        out_s.append(np.full(len(hv), v, dtype=np.int64))
        out_d.append(hv)
    if out_s:
        ks = np.concatenate(out_s)
        kd = np.concatenate(out_d)
        o = np.lexsort((kd, ks))
        ks, kd = ks[o], kd[o]
    else:
        ks = np.zeros(0, dtype=np.int64)
        kd = np.zeros(0, dtype=np.int64)
    return pa.table({"src": pa.array(ids[ks]), "dst": pa.array(ids[kd])})


def transitive_closure(
    arcs: ray.data.Dataset, max_cells: int = MAX_CELLS
) -> pa.Table:
    """Transitive closure of a DAG arc table — igraph
    ``transitive_closure_dag`` / nx ``transitive_closure_dag`` parity:
    every (u, v) with a directed path u ⇒ v (path length ≥ 1).
    Same reverse-topological packed-bitset engine (and bounded-gather
    contract) as :func:`transitive_reduction`; output size is the
    closure itself, O(reachable pairs)."""
    m = arcs.count()
    v_bound = 2 * m
    if v_bound * ((v_bound + 63) // 64) > max_cells:
        raise NotImplementedError(
            f"transitive_closure bitset bound exceeded for {m} arcs"
        )
    refs = arcs.select_columns(["src", "dst"]).to_arrow_refs()
    return ray.get(_tc_task.remote(refs))
