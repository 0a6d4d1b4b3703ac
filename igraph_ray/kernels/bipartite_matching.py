"""Maximum bipartite matching (igraph
``igraph_maximum_bipartite_matching``; ``nx.bipartite.maximum_matching``
parity) — Hopcroft–Karp 1973 with a König vertex-cover certificate.

König's theorem: in a bipartite graph, |maximum matching| = |minimum
vertex cover|.  The kernel therefore returns BOTH the matching and a
vertex cover of the same size built from the final Hopcroft–Karp
alternating-reachability sets (Z = vertices reachable from unmatched
left vertices along alternating paths; cover = (L \\ Z) ∪ (R ∩ Z)).
A caller can then verify MAXIMALITY distributedly with two exact
counts — every edge touches the cover, and |cover| == |matching| —
without re-solving anything.

Distributed shape — DOCUMENTED BOUNDED-GATHER like the max-flow
family: augmenting paths are global, so the (bounded) arc table is
gathered into one task; bipartition check (BFS 2-coloring), HK and
König all run there.  The certificate checks are the distributed
part, done by the calling query.
"""

from __future__ import annotations

from collections import deque

import numpy as np
import pyarrow as pa
import ray
import ray.data

GATHER_MAX_ARCS = 50_000_000
_INF = np.iinfo(np.int64).max


@ray.remote
def _hk_task(blocks):
    tables = [t for t in ray.get(list(blocks)) if t.num_rows]
    if not tables:
        empty = pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
        return empty, pa.table({"vid": pa.array([], pa.int64())})
    tbl = pa.concat_tables(tables)
    a = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    b = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    ids = np.unique(np.concatenate([a, b]))
    s = np.searchsorted(ids, a)
    d = np.searchsorted(ids, b)
    n = len(ids)
    # undirected adjacency
    u = np.concatenate([s, d])
    v = np.concatenate([d, s])
    keep = u != v
    u, v = u[keep], v[keep]
    pair = np.unique(u * n + v)
    u, v = pair // n, pair % n
    off = np.zeros(n + 1, dtype=np.int64)
    np.add.at(off, u + 1, 1)
    np.cumsum(off, out=off)

    # bipartition by BFS 2-coloring (per component)
    color = np.full(n, -1, dtype=np.int8)
    for root in range(n):
        if color[root] >= 0:
            continue
        color[root] = 0
        q = deque([root])
        while q:
            x = q.popleft()
            for i in range(off[x], off[x + 1]):
                w = v[i]
                if color[w] < 0:
                    color[w] = 1 - color[x]
                    q.append(int(w))
                elif color[w] == color[x]:
                    raise ValueError(
                        "maximum_bipartite_matching: input is not "
                        "bipartite (odd cycle)"
                    )
    left = np.flatnonzero(color == 0)
    # left-only CSR (arcs L -> R)
    lmask = color[u] == 0
    lu, lv = u[lmask], v[lmask]
    loff = np.zeros(n + 1, dtype=np.int64)
    np.add.at(loff, lu + 1, 1)
    np.cumsum(loff, out=loff)
    order = np.argsort(lu, kind="stable")
    ladj = lv[order]

    match = np.full(n, -1, dtype=np.int64)  # partner or -1, both sides

    def bfs() -> bool:
        dist = np.full(n, _INF, dtype=np.int64)
        q = deque()
        for x in left:
            if match[x] < 0:
                dist[x] = 0
                q.append(int(x))
        found = False
        while q:
            x = q.popleft()
            for i in range(loff[x], loff[x + 1]):
                w = ladj[i]
                m = match[w]
                if m < 0:
                    found = True
                elif dist[m] == _INF:
                    dist[m] = dist[x] + 1
                    q.append(int(m))
        return found, dist

    def dfs(x: int, dist) -> bool:
        for i in range(loff[x], loff[x + 1]):
            w = ladj[i]
            m = match[w]
            if m < 0 or (dist[m] == dist[x] + 1 and dfs(int(m), dist)):
                match[x] = w
                match[w] = x
                return True
        dist[x] = _INF
        return False

    import sys

    sys.setrecursionlimit(max(10000, 2 * n + 100))
    while True:
        found, dist = bfs()
        if not found:
            break
        for x in left:
            if match[x] < 0:
                dfs(int(x), dist)

    # König cover: Z = alternating reachability from unmatched L
    inZ = np.zeros(n, dtype=bool)
    q = deque()
    for x in left:
        if match[x] < 0:
            inZ[x] = True
            q.append(int(x))
    while q:
        x = q.popleft()
        for i in range(loff[x], loff[x + 1]):
            w = ladj[i]
            if not inZ[w]:
                inZ[w] = True
                m = match[w]
                if m >= 0 and not inZ[m]:
                    inZ[m] = True
                    q.append(int(m))
    is_left = color == 0
    cover_local = np.flatnonzero((is_left & ~inZ) | (~is_left & inZ))

    ml = np.flatnonzero(is_left & (match >= 0))
    matching = pa.table(
        {
            "src": pa.array(ids[ml]),
            "dst": pa.array(ids[match[ml]]),
        }
    )
    cover = pa.table({"vid": pa.array(ids[cover_local])})
    return matching, cover


def maximum_bipartite_matching(
    edges: ray.data.Dataset, gather_max_arcs: int = GATHER_MAX_ARCS
) -> tuple[pa.Table, pa.Table]:
    """Returns ``(matching (src, dst), cover (vid))`` with
    |matching| == |cover| (König).  Raises on non-bipartite input."""
    m = edges.count()
    if m > gather_max_arcs:
        raise NotImplementedError(
            f"maximum_bipartite_matching bounded-gather limit: {m} arcs"
        )
    refs = edges.select_columns(["src", "dst"]).to_arrow_refs()
    return ray.get(_hk_task.remote(refs))
