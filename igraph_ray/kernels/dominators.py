"""Dominator tree of a rooted digraph (igraph
``igraph_dominator_tree`` surface; ``nx.immediate_dominators``
parity).

Algorithm: Cooper-Harvey-Kennedy (2001) "A Simple, Fast Dominance
Algorithm" — iterative two-finger idom merge over a reverse-postorder
sweep.  Converges in a handful of passes on reducible flow graphs and
is O(V·E) worst case; exact on all digraphs.

Distributed shape — DOCUMENTED BOUNDED-GATHER (same policy as
``kernels/maxflow.py``): immediate dominators are a global
fixed point over a DFS ordering, inherently sequential per pass, so
the (bounded) arc table reachable from the root ships to ONE Ray task
via block refs.  igraph's own implementation is likewise a
single-memory routine.  Vertices unreachable from the root are
omitted (both igraph and nx omit them).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

GATHER_MAX_ARCS_DOM = 50_000_000


def _idom_py(
    n: int, src: np.ndarray, dst: np.ndarray, root: int
) -> tuple[np.ndarray, np.ndarray]:
    """Cooper-Harvey-Kennedy on local indices.  Returns
    ``(order, idom)`` where order lists reachable vertices and
    ``idom[v]`` is v's immediate dominator (idom[root] = root)."""
    order_arcs = np.argsort(src, kind="stable")
    off = np.zeros(n + 1, dtype=np.int64)
    np.add.at(off, src + 1, 1)
    np.cumsum(off, out=off)
    adj = dst[order_arcs]

    # iterative DFS for postorder
    post: list[int] = []
    visited = np.zeros(n, dtype=bool)
    visited[root] = True
    stack: list[tuple[int, int]] = [(root, int(off[root]))]
    while stack:
        v, ptr = stack.pop()
        advanced = False
        while ptr < off[v + 1]:
            w = int(adj[ptr])
            ptr += 1
            if not visited[w]:
                visited[w] = True
                stack.append((v, ptr))
                stack.append((w, int(off[w])))
                advanced = True
                break
        if not advanced:
            post.append(v)
    post_arr = np.array(post, dtype=np.int64)
    rpo = post_arr[::-1]
    rpo_num = np.full(n, -1, dtype=np.int64)
    rpo_num[rpo] = np.arange(len(rpo))

    # predecessor lists restricted to reachable vertices
    keep = visited[src] & visited[dst]
    psrc, pdst = src[keep], dst[keep]
    pord = np.argsort(pdst, kind="stable")
    poff = np.zeros(n + 1, dtype=np.int64)
    np.add.at(poff, pdst + 1, 1)
    np.cumsum(poff, out=poff)
    preds = psrc[pord]

    idom = np.full(n, -1, dtype=np.int64)
    idom[root] = root

    def intersect(a: int, b: int) -> int:
        while a != b:
            while rpo_num[a] > rpo_num[b]:
                a = int(idom[a])
            while rpo_num[b] > rpo_num[a]:
                b = int(idom[b])
        return a

    changed = True
    while changed:
        changed = False
        for v in rpo[1:]:
            v = int(v)
            new = -1
            for p in preds[poff[v] : poff[v + 1]]:
                p = int(p)
                if idom[p] < 0:
                    continue
                new = p if new < 0 else intersect(p, new)
            if new >= 0 and idom[v] != new:
                idom[v] = new
                changed = True
    return rpo, idom


@ray.remote
def _dom_task(blocks, root: int):
    tables = [t for t in ray.get(list(blocks)) if t.num_rows]
    tbl = pa.concat_tables(tables)
    src = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    vids = np.unique(np.concatenate([src, dst, [root]]))
    n = len(vids)
    a = np.searchsorted(vids, src)
    b = np.searchsorted(vids, dst)
    r = int(np.searchsorted(vids, root))
    rpo, idom = _idom_py(n, a, b, r)
    reach = rpo[rpo >= 0]
    mask = idom[reach] >= 0
    vs = reach[mask]
    return pa.table(
        {
            "vid": pa.array(vids[vs]),
            "idom": pa.array(vids[idom[vs]]),
        }
    )


def dominator_tree(
    edges: ray.data.Dataset,
    root: int,
    gather_max_arcs: int = GATHER_MAX_ARCS_DOM,
) -> pa.Table:
    """Immediate dominators of every vertex reachable from ``root``
    in the digraph ``(src, dst)``.  Rows ``(vid, idom)`` with
    ``idom[root] = root`` (nx.immediate_dominators convention).
    Unreachable vertices are omitted."""
    m = edges.count()
    if m > gather_max_arcs:
        raise NotImplementedError(
            f"dominator_tree bounded-gather limit: {m} arcs > "
            f"{gather_max_arcs}"
        )
    refs = edges.select_columns(["src", "dst"]).to_arrow_refs()
    return ray.get(_dom_task.remote(refs, root))
