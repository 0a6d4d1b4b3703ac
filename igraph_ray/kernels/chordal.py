"""Chordality test + perfect elimination ordering (igraph
``igraph_is_chordal`` / ``igraph_maximum_cardinality_search``
surface; ``nx.is_chordal`` parity).

Algorithm: Maximum Cardinality Search (Tarjan & Yannakakis 1984) —
the reverse MCS order is a perfect elimination ordering iff the graph
is chordal, checked by the standard parent test (for each vertex v,
every earlier neighbor other than v's latest earlier neighbor
``p(v)`` must be adjacent to ``p(v)``).

Distributed shape — two stages, same policy as
``kernels/isomorphism.py`` (distributed pre-filter, then a
DOCUMENTED BOUNDED-GATHER certificate):

1. **Distributed induced-C4 probe** (optional, default on for large
   graphs): a chordal graph has no induced cycle ≥ 4, so one induced
   rectangle found by the edge-join expansion
   (``kernels/pattern.py``) certifies non-chordality without any
   gather.  The probe streams; only a count reaches the driver.
2. **MCS certificate**: MCS and the parent test are inherently
   sequential over a global vertex order (igraph's own
   implementation is likewise single-memory), so the (bounded) arc
   table is shipped to ONE Ray task via block refs —
   ``GATHER_MAX_ARCS_MCS`` caps the gather and the docstring is the
   contract.  The task returns the verdict plus either the perfect
   elimination ordering (chordal) or a witness triple (u, p, v) with
   u,p earlier neighbors of v and (u,p) not an edge.

Oracle: ``tests/test_chordal.py`` vs ``nx.is_chordal`` on random,
k-tree (chordal by construction), cycle, and interval-graph
fixtures; returned PEOs are validated by sequential elimination.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray
import ray.data

GATHER_MAX_ARCS_MCS = 8_000_000


def _mcs_certificate(
    src: np.ndarray, dst: np.ndarray
) -> dict:
    """Sequential MCS + parent test over local adjacency sets."""
    vids = np.unique(np.concatenate([src, dst]))
    n = len(vids)
    if n == 0:
        return {"chordal": True, "order": [], "witness": None}
    a = np.searchsorted(vids, src)
    b = np.searchsorted(vids, dst)
    adj: list[set[int]] = [set() for _ in range(n)]
    for i, j in zip(a.tolist(), b.tolist()):
        adj[i].add(j)
        adj[j].add(i)

    # MCS: repeatedly pick an unnumbered vertex with the most numbered
    # neighbors (lazy-deletion max-heap; ties -> smallest vid for
    # determinism).  order[k] = k-th numbered vertex; reverse(order)
    # is the elimination order.
    weight = [0] * n
    numbered = [False] * n
    heap: list[tuple[int, int]] = [(0, v) for v in range(n)]
    heapq.heapify(heap)
    order: list[int] = []
    pos = [0] * n
    while len(order) < n:
        w, v = heapq.heappop(heap)
        if numbered[v] or -w != weight[v]:
            continue
        numbered[v] = True
        pos[v] = len(order)
        order.append(v)
        for u in adj[v]:
            if not numbered[u]:
                weight[u] += 1
                heapq.heappush(heap, (-weight[u], u))

    # parent test: for v in MCS order, E(v) = earlier neighbors; the
    # latest-numbered p in E(v) must be adjacent to all of E(v)\{p}
    for v in order:
        # sorted scan: the FIRST failing (v, u) in (MCS-pos(v),
        # ascending u) order — a canonical witness the driver's SQL
        # twin reproduces (set-iteration order is not replayable)
        earlier = sorted(u for u in adj[v] if pos[u] < pos[v])
        if len(earlier) <= 1:
            continue
        p = max(earlier, key=lambda u: pos[u])
        for u in earlier:
            if u != p and u not in adj[p]:
                return {
                    "chordal": False,
                    "order": None,
                    "witness": (
                        int(vids[u]),
                        int(vids[p]),
                        int(vids[v]),
                    ),
                }
    peo = [int(vids[v]) for v in reversed(order)]
    return {"chordal": True, "order": peo, "witness": None}


def is_chordal(
    edges: ray.data.Dataset,
    *,
    c4_probe: bool = False,
    gather_max_arcs: int = GATHER_MAX_ARCS_MCS,
) -> dict:
    """Chordality verdict for the undirected graph of ``edges``
    (src, dst int64; loops ignored).

    Returns ``{"chordal": bool, "order": peo|None,
    "witness": (u,p,v)|None}`` — ``order`` is a perfect elimination
    ordering when chordal; ``witness`` is a failing triple otherwise
    (u, p earlier MCS-neighbors of v with (u,p) not an edge).

    ``c4_probe=True`` runs the distributed induced-rectangle probe
    first and skips the gather entirely when a hole is found (the
    scale fast path for graphs near the gather bound).
    """
    if c4_probe:
        from igraph_ray.kernels.pattern import count_subgraph_matches

        c4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
        if count_subgraph_matches(edges, c4, induced=True) > 0:
            return {"chordal": False, "order": None, "witness": None}

    n_arcs = edges.count()
    if n_arcs > gather_max_arcs:
        raise ValueError(
            f"is_chordal MCS certificate gathers the edge table to one "
            f"task: {n_arcs} arcs > bound {gather_max_arcs}; raise "
            f"gather_max_arcs explicitly to proceed"
        )

    @ray.remote
    def _run(blocks) -> dict:
        tables = [t for t in ray.get(list(blocks)) if t.num_rows]
        if tables:
            t = pa.concat_tables(tables)
            s = (
                t.column("src")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            d = (
                t.column("dst")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            keep = s != d
            s, d = s[keep], d[keep]
        else:
            s = d = np.empty(0, np.int64)
        return _mcs_certificate(s, d)

    refs = edges.select_columns(["src", "dst"]).to_arrow_refs()
    return ray.get(_run.remote(refs))
