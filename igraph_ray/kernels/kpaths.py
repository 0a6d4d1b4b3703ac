"""k shortest simple paths — igraph ``get_k_shortest_paths`` /
``nx.shortest_simple_paths`` semantics, via Yen's algorithm (Yen 1971,
"Finding the k Shortest Loopless Paths in a Network").

Distribution boundary, documented: Yen's spur recursion is inherently
sequential (each deviation depends on all previously accepted paths),
so the search runs on the driver over a gathered arc list under an
explicit bound — the same documented bounded-gather trade as the
Dinic max-flow, dominator-tree and feedback-arc-set kernels.  The arc
gather itself is a column projection of the distributed edge table.

Deterministic: candidate ordering is (cost, path) with the path
compared lexicographically, so equal-cost paths come out in a stable
canonical order.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray.data

MAX_KSP_EDGES = 50_000_000


def _dijkstra(
    adj: dict,
    s: int,
    t: int,
    banned_edges: set,
    banned_nodes: set,
) -> tuple[float, list[int]] | None:
    dist = {s: 0.0}
    prev: dict[int, int] = {}
    heap = [(0.0, s)]
    done = set()
    while heap:
        d, u = heapq.heappop(heap)
        if u in done:
            continue
        if u == t:
            path = [t]
            while path[-1] != s:
                path.append(prev[path[-1]])
            return d, path[::-1]
        done.add(u)
        for v, w in adj.get(u, ()):
            if v in banned_nodes or (u, v) in banned_edges:
                continue
            nd = d + w
            if nd < dist.get(v, np.inf):
                dist[v] = nd
                prev[v] = u
                heapq.heappush(heap, (nd, v))
    return None


def k_shortest_paths(
    arcs: ray.data.Dataset,
    source: int,
    target: int,
    k: int = 3,
    weighted: bool = False,
    max_edges: int = MAX_KSP_EDGES,
) -> pa.Table:
    """Rows ``(rank, cost, path)`` — the ``k`` cheapest simple
    source→target paths in (cost, lexicographic-path) order; fewer
    rows when fewer simple paths exist.  ``arcs``: directed edge table
    (pass both arc directions for undirected semantics) with optional
    ``weight`` column when ``weighted=True``; costs are hop counts
    otherwise."""
    n_arcs = arcs.count()
    if n_arcs > max_edges:
        raise NotImplementedError(
            f"k_shortest_paths gathers the arc list on the driver "
            f"(sequential Yen spur recursion); {n_arcs} arcs exceeds "
            f"the documented bound {max_edges}"
        )
    cols = ["src", "dst"] + (["weight"] if weighted else [])
    tbl = pa.concat_tables(
        arcs.select_columns(cols).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    src = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    w = (
        tbl.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
        if weighted
        else np.ones(len(src))
    )
    adj: dict[int, list] = {}
    for u, v, ww in zip(src.tolist(), dst.tolist(), w.tolist()):
        adj.setdefault(u, []).append((v, ww))
    # deterministic relaxation order
    for u in adj:
        adj[u].sort()

    first = _dijkstra(adj, source, target, set(), set())
    if first is None:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "cost": pa.array([], pa.float64()),
                "path": pa.array([], pa.large_list(pa.int64())),
            }
        )
    accepted: list[tuple[float, list[int]]] = [first]
    candidates: list[tuple[float, list[int]]] = []
    seen = {tuple(first[1])}
    while len(accepted) < k:
        _, last_path = accepted[-1]
        for i in range(len(last_path) - 1):
            spur = last_path[i]
            root = last_path[: i + 1]
            root_cost = 0.0
            banned_edges = set()
            for cost_p, p in accepted:
                if p[: i + 1] == root and len(p) > i + 1:
                    banned_edges.add((p[i], p[i + 1]))
            banned_nodes = set(root[:-1])
            # cost of the root prefix
            for a, b in zip(root[:-1], root[1:]):
                root_cost += next(ww for v, ww in adj[a] if v == b)
            res = _dijkstra(adj, spur, target, banned_edges, banned_nodes)
            if res is None:
                continue
            cost_s, spur_path = res
            total = root[:-1] + spur_path
            key = tuple(total)
            if key in seen:
                continue
            seen.add(key)
            heapq.heappush(candidates, (root_cost + cost_s, total))
        if not candidates:
            break
        accepted.append(heapq.heappop(candidates))
    return pa.table(
        {
            "rank": pa.array(range(len(accepted)), pa.int64()),
            "cost": pa.array([c for c, _ in accepted], pa.float64()),
            "path": pa.array(
                [p for _, p in accepted], pa.large_list(pa.int64())
            ),
        }
    )
