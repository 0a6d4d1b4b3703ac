"""Eulerian circuit construction (igraph ``igraph_eulerian_circuit``;
``nx.eulerian_circuit`` parity) — Hierholzer 1873.

Distributed shape — DOCUMENTED BOUNDED-GATHER, like the max-flow
family: an Eulerian circuit is one global walk, inherently sequential
to stitch, so the (bounded) multigraph arc table is gathered into the
construction; everything around it stays distributed — the evenness /
connectivity preconditions ride the components kernel, and the
VALIDATION of the produced circuit (every edge used exactly its
multiplicity, consecutive steps chained) is a distributed signed-count
diff + step self-join in the calling query.

Determinism: adjacency is lexicographically sorted (vertex, neighbour,
edge id) with current-arc pointers, and the start vertex is the
smallest vid with nonzero degree — the circuit is bitwise reproducible.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

GATHER_MAX_ARCS = 50_000_000


def eulerian_circuit(
    edges: ray.data.Dataset, gather_max_arcs: int = GATHER_MAX_ARCS
) -> pa.Table:
    """Hierholzer over a multigraph edge table ``(src, dst)`` (each
    row one undirected edge; repeat rows = parallel edges).  Returns
    rows ``(step, u, v)`` — the circuit traverses edge (u, v) at
    ``step`` — with ``num_rows == num_edges``.  Raises ``ValueError``
    if some degree is odd or the nonzero-degree subgraph is
    disconnected (checked during construction: leftover edges)."""
    m_total = edges.count()
    if m_total > gather_max_arcs:
        raise NotImplementedError(
            f"eulerian_circuit bounded-gather limit: {m_total} arcs > "
            f"{gather_max_arcs}"
        )
    blocks = [
        b
        for b in edges.select_columns(["src", "dst"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
        if b.num_rows
    ]
    if not blocks:
        return pa.table(
            {
                "step": pa.array([], pa.int64()),
                "u": pa.array([], pa.int64()),
                "v": pa.array([], pa.int64()),
            }
        )
    tbl = pa.concat_tables(blocks)
    a = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    b = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    m = len(a)

    # both directions with shared edge ids, lexicographically sorted
    tails = np.concatenate([a, b])
    heads = np.concatenate([b, a])
    eids = np.concatenate([np.arange(m), np.arange(m)]).astype(np.int64)
    order = np.lexsort((eids, heads, tails))
    tails, heads, eids = tails[order], heads[order], eids[order]
    nmax = int(max(tails.max(), heads.max())) + 1
    off = np.zeros(nmax + 1, dtype=np.int64)
    np.add.at(off, tails + 1, 1)
    np.cumsum(off, out=off)

    deg = off[1:] - off[:-1]
    if (deg % 2).any():
        raise ValueError("eulerian_circuit: odd-degree vertex present")

    used = np.zeros(m, dtype=bool)
    ptr = off[:-1].copy()
    start = int(np.flatnonzero(deg > 0)[0])
    stack_v = [start]
    stack_e = [-1]  # edge taken to reach stack_v[i]; -1 for the root
    out_u: list[int] = []
    out_v: list[int] = []
    while stack_v:
        v = stack_v[-1]
        advanced = False
        while ptr[v] < off[v + 1]:
            i = ptr[v]
            e = eids[i]
            if used[e]:
                ptr[v] += 1
                continue
            used[e] = True
            ptr[v] += 1
            stack_v.append(int(heads[i]))
            stack_e.append(int(e))
            advanced = True
            break
        if not advanced:
            stack_v.pop()
            e = stack_e.pop()
            if e >= 0:
                # popped vertex is the HEAD of edge e; tail = stack top
                out_u.append(stack_v[-1])
                out_v.append(v)
    out_u.reverse()
    out_v.reverse()
    if len(out_u) != m:
        raise ValueError(
            "eulerian_circuit: nonzero-degree subgraph is disconnected "
            f"({len(out_u)} of {m} edges reached)"
        )
    return pa.table(
        {
            "step": pa.array(np.arange(m, dtype=np.int64)),
            "u": pa.array(np.array(out_u, dtype=np.int64)),
            "v": pa.array(np.array(out_v, dtype=np.int64)),
        }
    )
