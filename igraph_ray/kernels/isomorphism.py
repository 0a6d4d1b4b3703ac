"""Exact graph isomorphism (igraph ``igraph_isomorphic`` /
``igraph_get_isomorphisms_vf2`` / ``igraph_count_isomorphisms_vf2``
surface; ``nx.is_isomorphic`` / ``nx.vf2pp_isomorphism`` parity).

Algorithm: VF2 (Cordella, Foggia, Sansone, Vento 2004) with the
VF2++-style static candidate order (descending degree, then vid) and
the standard feasibility cut (mapped-neighbor consistency plus a
1-look-ahead on unmapped-neighbor counts).

Distributed shape — DOCUMENTED BOUNDED-GATHER, same policy as
``kernels/maxflow.py``: isomorphism search is inherently sequential
backtracking over a global partial mapping, so the (bounded) edge
tables are shipped to ONE Ray task via block refs.  The cheap
distributed pre-check runs first: the WL refinement hash
(``kernels/wl.py``) distinguishes almost all non-isomorphic pairs
without any gather; VF2 is the exact certificate on top.  igraph's
own VF2 is likewise a single-memory routine.

Exactness: returns an explicit mapping, validated edge-by-edge;
oracle ``tests/test_isomorphism.py`` vs ``nx.is_isomorphic`` on
relabeled, perturbed, and same-degree-sequence non-isomorphic pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

GATHER_MAX_ARCS_VF2 = 2_000_000


def _adj_sets(
    src: np.ndarray, dst: np.ndarray
) -> tuple[np.ndarray, list[set[int]], np.ndarray]:
    vids = np.unique(np.concatenate([src, dst]))
    n = len(vids)
    a = np.searchsorted(vids, src)
    b = np.searchsorted(vids, dst)
    adj: list[set[int]] = [set() for _ in range(n)]
    for i, j in zip(a, b):
        if i != j:
            adj[int(i)].add(int(j))
            adj[int(j)].add(int(i))
    deg = np.array([len(s) for s in adj], dtype=np.int64)
    return vids, adj, deg


def _vf2_py(
    adj1: list[set[int]],
    deg1: np.ndarray,
    adj2: list[set[int]],
    deg2: np.ndarray,
) -> list[int] | None:
    """Find one isomorphism G1 -> G2 (local indices) or None."""
    n = len(adj1)
    if n != len(adj2):
        return None
    if sorted(deg1.tolist()) != sorted(deg2.tolist()):
        return None
    # VF2++-style static order on G1: descending degree, then index
    order = sorted(range(n), key=lambda v: (-int(deg1[v]), v))
    core1 = [-1] * n  # G1 -> G2
    core2 = [-1] * n  # G2 -> G1

    def feasible(v: int, w: int) -> bool:
        if deg1[v] != deg2[w]:
            return False
        # mapped neighbors of v must map exactly onto mapped
        # neighbors of w (and vice versa)
        look1 = 0
        for u in adj1[v]:
            m = core1[u]
            if m >= 0:
                if m not in adj2[w]:
                    return False
            else:
                look1 += 1
        look2 = 0
        for x in adj2[w]:
            m = core2[x]
            if m >= 0:
                if m not in adj1[v]:
                    return False
            else:
                look2 += 1
        return look1 == look2  # 1-look-ahead cut

    def backtrack(depth: int) -> bool:
        if depth == n:
            return True
        v = order[depth]
        # candidates: prefer neighbors of already-mapped vertices
        cands: list[int] = []
        for u in adj1[v]:
            if core1[u] >= 0:
                cands = sorted(
                    w for w in adj2[core1[u]] if core2[w] < 0
                )
                break
        if not cands:
            cands = sorted(w for w in range(n) if core2[w] < 0)
        for w in cands:
            if feasible(v, w):
                core1[v] = w
                core2[w] = v
                if backtrack(depth + 1):
                    return True
                core1[v] = -1
                core2[w] = -1
        return False

    return core1 if backtrack(0) else None


@ray.remote
def _vf2_task(blocks1, blocks2):
    def load(blocks):
        tables = [t for t in ray.get(list(blocks)) if t.num_rows]
        tbl = pa.concat_tables(tables)
        src = tbl.column("src").to_numpy(zero_copy_only=False)
        dst = tbl.column("dst").to_numpy(zero_copy_only=False)
        return _adj_sets(src.astype(np.int64), dst.astype(np.int64))

    vids1, adj1, deg1 = load(blocks1)
    vids2, adj2, deg2 = load(blocks2)
    m1 = sum(len(s) for s in adj1) // 2
    m2 = sum(len(s) for s in adj2) // 2
    if len(vids1) != len(vids2) or m1 != m2:
        return False, None
    core = _vf2_py(adj1, deg1, adj2, deg2)
    if core is None:
        return False, None
    mapping = pa.table(
        {
            "vid1": pa.array(vids1),
            "vid2": pa.array(vids2[np.array(core, dtype=np.int64)]),
        }
    )
    return True, mapping


def isomorphic(
    edges1: ray.data.Dataset,
    edges2: ray.data.Dataset,
    gather_max_arcs: int = GATHER_MAX_ARCS_VF2,
) -> tuple[bool, pa.Table | None]:
    """Exact isomorphism test between two undirected simple graphs
    given as arc tables ``(src, dst)`` (self-loops ignored, parallel
    arcs collapse).  Returns ``(is_isomorphic, mapping)`` where
    ``mapping`` has rows ``(vid1, vid2)`` or is None.

    A distributed WL-hash pre-check (``kernels/wl.py::graph_hash``)
    is the recommended cheap filter before calling this on many
    candidate pairs; this function is the exact certificate.
    """
    for ds in (edges1, edges2):
        m = ds.count()
        if m > gather_max_arcs:
            raise NotImplementedError(
                f"vf2 bounded-gather limit: {m} arcs > {gather_max_arcs}"
            )
    refs1 = edges1.select_columns(["src", "dst"]).to_arrow_refs()
    refs2 = edges2.select_columns(["src", "dst"]).to_arrow_refs()
    ok, mapping = ray.get(_vf2_task.remote(refs1, refs2))
    return ok, mapping
