"""Uniform random spanning tree (igraph
``igraph_random_spanning_tree``; Wilson 1996 loop-erased random
walks — exact uniform distribution over spanning trees).

Distributed shape — DOCUMENTED BOUNDED-GATHER like the max-flow
family: Wilson's walks chase a global "next pointer" structure, so
the (bounded) arc table is gathered into one task; the VALIDATION of
the returned tree — it has exactly n-1 edges, each an edge of the
graph, and it spans one component — is done with the distributed
components kernel and signed-count diffs by the calling query.

Determinism: the walk RNG is a fixed-seed ``numpy.random.RandomState``
(MT19937 — stable across platforms), roots and start vertices are
taken in ascending vid order, so the tree is bitwise reproducible for
a given (graph, seed) while remaining an exact sample from the
uniform spanning-tree distribution over the seed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

GATHER_MAX_ARCS = 50_000_000


@ray.remote
def _wilson_task(blocks, seed: int):
    tables = [t for t in ray.get(list(blocks)) if t.num_rows]
    if not tables:
        return pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    tbl = pa.concat_tables(tables)
    a = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    b = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    # undirected simple adjacency over the vertices present
    ids = np.unique(np.concatenate([a, b]))
    s = np.searchsorted(ids, a)
    d = np.searchsorted(ids, b)
    u = np.concatenate([s, d])
    v = np.concatenate([d, s])
    keep = u != v
    u, v = u[keep], v[keep]
    n = len(ids)
    pair = np.unique(u * n + v)
    u, v = pair // n, pair % n
    off = np.zeros(n + 1, dtype=np.int64)
    np.add.at(off, u + 1, 1)
    np.cumsum(off, out=off)

    # connectivity pre-check (a Wilson walk inside an unreachable
    # component would never hit the tree): vectorized BFS from 0
    reach = np.zeros(n, dtype=bool)
    reach[0] = True
    frontier = np.array([0], dtype=np.int64)
    while frontier.size:
        starts = off[frontier]
        counts = off[frontier + 1] - starts
        tot = int(counts.sum())
        if tot == 0:
            break
        idx = np.repeat(starts, counts) + (
            np.arange(tot) - np.repeat(np.cumsum(counts) - counts, counts)
        )
        nxt_f = np.unique(v[idx][~reach[v[idx]]])
        if nxt_f.size == 0:
            break
        reach[nxt_f] = True
        frontier = nxt_f
    if not reach.all():
        bad = ids[int(np.flatnonzero(~reach)[0])]
        raise ValueError(
            f"random_spanning_tree: disconnected input (vertex {bad} "
            "unreachable from the root)"
        )

    rng = np.random.RandomState(seed)
    in_tree = np.zeros(n, dtype=bool)
    nxt = np.full(n, -1, dtype=np.int64)
    root = 0
    in_tree[root] = True
    for i in range(n):
        if in_tree[i]:
            continue
        # random walk from i until the tree is hit, recording nxt[]
        x = i
        while not in_tree[x]:
            lo, hi = off[x], off[x + 1]
            nxt[x] = v[lo + rng.randint(hi - lo)]
            x = nxt[x]
        # loop-erasure: walk the nxt pointers, admitting the path
        x = i
        while not in_tree[x]:
            in_tree[x] = True
            x = nxt[x]
    mask = nxt >= 0
    has = np.flatnonzero(mask & in_tree)
    # only vertices admitted via the loop-erased path keep their nxt
    src_out = ids[has]
    dst_out = ids[nxt[has]]
    return pa.table(
        {
            "src": pa.array(np.minimum(src_out, dst_out)),
            "dst": pa.array(np.maximum(src_out, dst_out)),
        }
    )


def random_spanning_tree(
    edges: ray.data.Dataset,
    seed: int = 0,
    gather_max_arcs: int = GATHER_MAX_ARCS,
) -> pa.Table:
    """Uniform spanning tree of the (connected) undirected graph via
    Wilson's loop-erased walks.  Returns canonical (lo, hi) tree
    edges; raises on disconnected input."""
    m = edges.count()
    if m > gather_max_arcs:
        raise NotImplementedError(
            f"random_spanning_tree bounded-gather limit: {m} arcs > "
            f"{gather_max_arcs}"
        )
    refs = edges.select_columns(["src", "dst"]).to_arrow_refs()
    return ray.get(_wilson_task.remote(refs, seed))


# ---------------------------------------------------------------------------
# Spanning-tree COUNT (Kirchhoff matrix-tree theorem, exact integers)
# ---------------------------------------------------------------------------
COUNT_MAX_VERTICES = 1_500


@ray.remote
def _kirchhoff_task(blocks, max_vertices: int):
    """Dense exact matrix-tree determinant over the gathered simple
    edge set.  Bareiss fraction-free elimination in arbitrary-
    precision Python ints (object-dtype numpy rows keep the inner
    loop vectorized), so the count is EXACT at any magnitude —
    K_n alone has n^(n-2) trees, far beyond int64/float range.
    Returns the count as a decimal string."""
    tables = [t for t in ray.get(list(blocks)) if t.num_rows]
    if not tables:
        return "0"
    tbl = pa.concat_tables(tables)
    a = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    b = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    # vertex set BEFORE dropping loops: a vertex known only through a
    # self-loop still exists (and still needs spanning)
    ids = np.unique(np.concatenate([a, b]))
    keep = a != b  # self-loops never appear in a spanning tree
    a, b = a[keep], b[keep]
    n = len(ids)
    if n == 0:
        return "0"
    if n == 1:
        return "1"
    if n > max_vertices:
        raise NotImplementedError(
            f"spanning_tree_count dense-determinant bound: {n} vertices "
            f"> {max_vertices} (the matrix-tree determinant is "
            "inherently a dense O(n^3) exact-arithmetic computation)"
        )
    u = np.searchsorted(ids, a)
    v = np.searchsorted(ids, b)
    # collapse parallel arcs: the caller hands unordered unique pairs,
    # but be defensive — multiplicity would otherwise weight the count
    pair = np.unique(
        np.minimum(u, v).astype(np.int64) * n + np.maximum(u, v)
    )
    u, v = pair // n, pair % n

    # Laplacian minor (drop last row/col) in exact integers
    m = n - 1
    M = np.zeros((m, m), dtype=object)
    deg = np.zeros(n, dtype=np.int64)
    np.add.at(deg, u, 1)
    np.add.at(deg, v, 1)
    for i in range(m):
        M[i, i] = int(deg[i])
    inside = (u < m) & (v < m)
    for x, y in zip(u[inside], v[inside]):
        M[x, y] -= 1
        M[y, x] -= 1

    # Bareiss fraction-free elimination (exact divisions by the
    # previous pivot; row pivoting preserves exactness, sign tracked)
    prev = 1
    sign = 1
    for k in range(m - 1):
        if M[k, k] == 0:
            nz = [i for i in range(k + 1, m) if M[i, k] != 0]
            if not nz:
                return "0"  # singular minor => disconnected graph
            i = nz[0]
            M[[k, i], k:] = M[[i, k], k:]
            sign = -sign
        piv = M[k, k]
        for i in range(k + 1, m):
            M[i, k + 1 :] = (M[i, k + 1 :] * piv - M[i, k] * M[k, k + 1 :])
            if prev != 1:
                M[i, k + 1 :] //= prev
            M[i, k] = 0
        prev = piv
    det = sign * M[m - 1, m - 1]
    if det < 0:  # cannot happen for a PSD minor; guard anyway
        det = -det
    return str(det)


def spanning_tree_count(
    edges: ray.data.Dataset,
    max_vertices: int = COUNT_MAX_VERTICES,
    gather_max_arcs: int = GATHER_MAX_ARCS,
) -> int:
    """Exact number of spanning trees of the undirected simple graph
    (Kirchhoff's matrix-tree theorem: any cofactor of the Laplacian).
    0 for a disconnected or empty graph, 1 for a single vertex;
    self-loops are ignored.

    Distributed shape — DOCUMENTED BOUNDED-GATHER like Wilson above
    and the max-flow family: the determinant is an inherently dense
    O(n^3) sequential computation, so the (bounded) edge set is
    gathered into one remote task that runs Bareiss fraction-free
    elimination in Python big ints — the result is exact at any
    magnitude (K_n has n^(n-2) trees).  The edge table itself stays
    in the object store until the single gather."""
    m = edges.count()
    if m > gather_max_arcs:
        raise NotImplementedError(
            f"spanning_tree_count bounded-gather limit: {m} arcs > "
            f"{gather_max_arcs}"
        )
    refs = edges.select_columns(["src", "dst"]).to_arrow_refs()
    return int(ray.get(_kirchhoff_task.remote(refs, max_vertices)))
