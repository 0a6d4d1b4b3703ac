"""s-t maximum flow / minimum cut (igraph ``igraph_maxflow`` /
``igraph_st_mincut`` / ``igraph_st_edge_connectivity`` surface;
nx.maximum_flow parity).

Algorithm: Dinic's blocking-flow method (Dinic 1970; see also
Goldberg-Tarjan push-relabel) — O(V²E) worst case, O(E√V) on unit
capacities, which covers the connectivity variants.

Distributed shape — a DOCUMENTED BOUNDED-GATHER operator: s-t max-flow
augments along global residual paths, so unlike the vertex-program
kernels it cannot be expressed as independent per-partition supersteps
without a distributed push-relabel's edge-state machinery.  The engine
therefore ships the (bounded) arc table to ONE Ray task via its block
refs (never materialized on the driver) and solves there —
``gather_max_arcs`` (default 50M, ~1.2 GB of int64 arc state) is the
declared boundary, mirroring the broadcast-close policy in
``kernels/triangles.py``.  igraph's own maxflow is likewise a
single-memory routine; flow queries on the 100-TB link graph run on a
k-core / component subgraph that fits this bound.

Exactness: integer capacities stay int64 end-to-end — the flow value,
cut capacity and cut edge set are exact (pytest oracle:
``nx.maximum_flow`` / ``nx.minimum_cut`` / ``nx.edge_connectivity`` /
``nx.node_connectivity``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

GATHER_MAX_ARCS = 50_000_000


def _dinic_py(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    cap: np.ndarray,
    s: int,
    t: int,
    undirected: bool,
    cutoff: int | None = None,
) -> tuple[int, np.ndarray, np.ndarray]:
    """Dinic with vectorized BFS phases and an iterative current-arc
    DFS for blocking flows.  Exact int64 arithmetic throughout.

    ``cutoff``: stop augmenting once the flow value reaches it (the
    caller only needs to know the value is >= cutoff — used by the
    global-connectivity min loops, where a flow at or above the
    current best cannot improve the minimum).  The returned
    flow/reach arrays are then partial and must not be used."""
    m = len(src)
    heads = np.empty(2 * m, dtype=np.int64)
    tails = np.empty(2 * m, dtype=np.int64)
    caps = np.empty(2 * m, dtype=np.int64)
    tails[0::2] = src
    heads[0::2] = dst
    caps[0::2] = cap
    tails[1::2] = dst
    heads[1::2] = src
    caps[1::2] = cap if undirected else 0

    order = np.argsort(tails, kind="stable")
    off = np.zeros(n + 1, dtype=np.int64)
    np.add.at(off, tails + 1, 1)
    np.cumsum(off, out=off)
    adj = order

    residual = caps.copy()
    total = 0
    INF = np.iinfo(np.int64).max

    while True:
        # --- vectorized BFS level assignment on the residual graph
        level = np.full(n, -1, dtype=np.int64)
        level[s] = 0
        frontier = np.array([s], dtype=np.int64)
        d = 0
        while frontier.size:
            starts = off[frontier]
            counts = off[frontier + 1] - starts
            tot = int(counts.sum())
            if tot == 0:
                break
            idx = np.repeat(starts, counts) + (
                np.arange(tot)
                - np.repeat(np.cumsum(counts) - counts, counts)
            )
            arcs = adj[idx]
            nxt = heads[arcs[residual[arcs] > 0]]
            nxt = np.unique(nxt[level[nxt] < 0])
            if nxt.size == 0:
                break
            d += 1
            level[nxt] = d
            frontier = nxt
        if level[t] < 0:
            break

        # --- blocking flow: iterative DFS with current-arc pointers
        it = off[:-1].copy()  # next arc index to try per vertex
        while True:
            # find one augmenting path s->t in the level graph
            path_arcs: list[int] = []
            v = s
            while v != t:
                advanced = False
                while it[v] < off[v + 1]:
                    a = int(adj[it[v]])
                    w = int(heads[a])
                    if residual[a] > 0 and level[w] == level[v] + 1:
                        path_arcs.append(a)
                        v = w
                        advanced = True
                        break
                    it[v] += 1
                if not advanced:
                    # retreat: dead vertex, prune from level graph
                    level[v] = -1
                    if v == s:
                        break
                    a = path_arcs.pop()
                    v = int(tails[a])
                    it[v] += 1
            if v != t:
                break  # no more augmenting paths this phase
            pa_ = np.array(path_arcs, dtype=np.int64)
            bottleneck = int(residual[pa_].min())
            residual[pa_] -= bottleneck
            residual[pa_ ^ 1] += bottleneck
            total += bottleneck
            if cutoff is not None and total >= cutoff:
                flow = caps[0::2] - residual[0::2]
                return total, flow, np.zeros(n, dtype=bool)

    # s-side of the min cut: residual reachability from s
    reach = np.zeros(n, dtype=bool)
    reach[s] = True
    frontier = np.array([s], dtype=np.int64)
    while frontier.size:
        starts = off[frontier]
        counts = off[frontier + 1] - starts
        tot = int(counts.sum())
        if tot == 0:
            break
        idx = np.repeat(starts, counts) + (
            np.arange(tot) - np.repeat(np.cumsum(counts) - counts, counts)
        )
        arcs = adj[idx]
        nxt = heads[arcs[residual[arcs] > 0]]
        nxt = np.unique(nxt[~reach[nxt]])
        if nxt.size == 0:
            break
        reach[nxt] = True
        frontier = nxt

    flow = caps[0::2] - residual[0::2]
    return total, flow, reach


@ray.remote
def _solve_task(
    blocks,
    n: int,
    s: int,
    t: int,
    cap_col: str | None,
    undirected: bool,
):
    # blocks is a list of ObjectRefs (nested refs are not auto-resolved);
    # zero-row blocks can carry a degraded empty schema — skip them
    tables = [t for t in ray.get(list(blocks)) if t.num_rows]
    tbl = pa.concat_tables(tables)
    src = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    if cap_col is not None:
        cap = (
            tbl.column(cap_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
    else:
        cap = np.ones(len(src), dtype=np.int64)
    value, flow, reach = _dinic_py(n, src, dst, cap, s, t, undirected)
    cut_mask = (
        reach[src] & ~reach[dst]
        if not undirected
        else (reach[src] & ~reach[dst]) | (reach[dst] & ~reach[src])
    )
    cut = pa.table(
        {
            "src": pa.array(src[cut_mask]),
            "dst": pa.array(dst[cut_mask]),
            "capacity": pa.array(cap[cut_mask]),
        }
    )
    flows = pa.table(
        {
            "src": pa.array(src),
            "dst": pa.array(dst),
            "flow": pa.array(flow),
        }
    )
    return int(value), cut, pa.array(reach).to_pylist(), flows


def max_flow(
    edges: ray.data.Dataset,
    n: int,
    s: int,
    t: int,
    capacity_col: str | None = None,
    directed: bool = True,
    gather_max_arcs: int = GATHER_MAX_ARCS,
) -> dict:
    """s-t max flow over an arc table ``(src, dst[, capacity])``.

    Returns ``{"value", "cut_edges" (pa.Table src/dst/capacity),
    "source_side" (np.bool_ mask over vids), "flows" (pa.Table)}``.
    ``capacity_col=None`` means unit capacities (edge connectivity).
    """
    m = edges.count()
    if m > gather_max_arcs:
        raise NotImplementedError(
            f"max_flow bounded-gather limit: {m} arcs > "
            f"{gather_max_arcs}; run on a subgraph (k-core / component)"
            " or raise gather_max_arcs"
        )
    cols = ["src", "dst"] + ([capacity_col] if capacity_col else [])
    refs = edges.select_columns(cols).to_arrow_refs()
    value, cut, reach, flows = ray.get(
        _solve_task.remote(refs, n, s, t, capacity_col, not directed)
    )
    return {
        "value": value,
        "cut_edges": cut,
        "source_side": np.array(reach, dtype=bool),
        "flows": flows,
    }


def st_edge_connectivity(
    edges: ray.data.Dataset, n: int, s: int, t: int, directed: bool = False
) -> int:
    """λ(s, t): max number of edge-disjoint s-t paths = unit-capacity
    max flow (Menger)."""
    return max_flow(edges, n, s, t, None, directed=directed)["value"]


def st_vertex_connectivity(
    edges: ray.data.Dataset, n: int, s: int, t: int
) -> int:
    """κ(s, t) for non-adjacent s, t on an undirected simple graph:
    node-splitting reduction (v -> v_in=v, v_out=v+n with an internal
    unit arc), then unit-capacity directed max flow."""

    def split(batch: pa.Table) -> pa.Table:
        bsrc = batch.column("src").to_numpy(zero_copy_only=False)
        bdst = batch.column("dst").to_numpy(zero_copy_only=False)
        # undirected edge {u,v}: u_out -> v_in and v_out -> u_in
        return pa.table(
            {
                "src": pa.array(
                    np.concatenate([bsrc + n, bdst + n]).astype(np.int64)
                ),
                "dst": pa.array(
                    np.concatenate([bdst, bsrc]).astype(np.int64)
                ),
            }
        )

    arcs = edges.map_batches(
        split, batch_format="pyarrow", zero_copy_batch=True
    )
    internal = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(np.arange(n, dtype=np.int64)),
                "dst": pa.array(np.arange(n, dtype=np.int64) + n),
            }
        )
    )
    # flow runs s_out -> t_in, so s_in->s_out / t_in->t_out arcs are
    # never on a path — drop them instead of giving them big capacity.
    # Unit edge arcs are safe: internally-vertex-disjoint paths are
    # automatically edge-disjoint for non-adjacent s, t.
    internal = internal.filter(expr=f"src != {s} and src != {t}")
    all_arcs = arcs.union(internal)
    return max_flow(all_arcs, 2 * n, s + n, t, None, directed=True)[
        "value"
    ]


@ray.remote
def _stoer_wagner_task(blocks, cap_col: str | None):
    tables = [t for t in ray.get(list(blocks)) if t.num_rows]
    tbl = pa.concat_tables(tables)
    src = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    w = (
        tbl.column(cap_col).to_numpy(zero_copy_only=False).astype(np.float64)
        if cap_col
        else np.ones(len(src), dtype=np.float64)
    )
    keep = src != dst
    src, dst, w = src[keep], dst[keep], w[keep]
    vids = np.unique(np.concatenate([src, dst]))
    n = len(vids)
    a = np.searchsorted(vids, src)
    b = np.searchsorted(vids, dst)
    W = np.zeros((n, n), dtype=np.float64)
    np.add.at(W, (a, b), w)
    np.add.at(W, (b, a), w)

    groups: list[list[int]] = [[i] for i in range(n)]
    active = np.ones(n, dtype=bool)
    best = np.inf
    best_side: list[int] = []
    for _phase in range(n - 1):
        act = np.flatnonzero(active)
        # maximum adjacency search (vectorized argmax per step)
        start = int(act[0])
        in_a = np.zeros(n, dtype=bool)
        in_a[start] = True
        conn = W[start].copy()
        conn[~active] = -np.inf
        conn[start] = -np.inf
        s_prev, t_last, t_cut = start, start, 0.0
        for _step in range(len(act) - 1):
            v = int(np.argmax(conn))
            s_prev, t_last, t_cut = t_last, v, float(conn[v])
            in_a[v] = True
            conn += W[v]
            conn[in_a] = -np.inf
            conn[~active] = -np.inf
        if t_cut < best:
            best = t_cut
            best_side = list(groups[t_last])
        # merge t_last into s_prev
        W[s_prev] += W[t_last]
        W[:, s_prev] += W[:, t_last]
        W[s_prev, s_prev] = 0.0
        active[t_last] = False
        W[t_last] = 0.0
        W[:, t_last] = 0.0
        groups[s_prev].extend(groups[t_last])
    side = pa.array(np.sort(vids[np.array(best_side, dtype=np.int64)]))
    return float(best), side


def min_cut(
    edges: ray.data.Dataset,
    capacity_col: str | None = None,
    gather_max_arcs: int = GATHER_MAX_ARCS,
) -> tuple[float, pa.Array]:
    """Global minimum cut of the undirected weighted graph
    (igraph ``igraph_mincut`` with no s/t; ``nx.stoer_wagner``
    parity): Stoer-Wagner maximum-adjacency phases, vectorized over a
    dense weight matrix.  Returns ``(cut_value, one_side_vids)``.
    Bounded-gather like :func:`max_flow`; the dense matrix bounds the
    vertex count to ~20k (3.2 GB float64) — run on a component /
    quotient subgraph past that."""
    m = edges.count()
    if m > gather_max_arcs:
        raise NotImplementedError(
            f"min_cut bounded-gather limit: {m} arcs > {gather_max_arcs}"
        )
    cols = ["src", "dst"] + ([capacity_col] if capacity_col else [])
    refs = edges.select_columns(cols).to_arrow_refs()
    value, side = ray.get(_stoer_wagner_task.remote(refs, capacity_col))
    return value, side


@ray.remote
def _gomory_hu_task(blocks, cap_col: str | None):
    tables = [t for t in ray.get(list(blocks)) if t.num_rows]
    tbl = pa.concat_tables(tables)
    src = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    cap = (
        tbl.column(cap_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if cap_col
        else np.ones(len(src), dtype=np.int64)
    )
    keep = src != dst
    src, dst, cap = src[keep], dst[keep], cap[keep]
    vids = np.unique(np.concatenate([src, dst]))
    n = len(vids)
    a = np.searchsorted(vids, src)
    b = np.searchsorted(vids, dst)

    # Gusfield 1990: n-1 max-flows against current tree parents; no
    # graph contraction needed
    parent = np.zeros(n, dtype=np.int64)
    flow_lbl = np.zeros(n, dtype=np.int64)
    for i in range(1, n):
        t = int(parent[i])
        f, _flows, reach = _dinic_py(n, a, b, cap, i, t, undirected=True)
        flow_lbl[i] = f
        for j in range(i + 1, n):
            if parent[j] == t and reach[j]:
                parent[j] = i
    tree = pa.table(
        {
            "u": pa.array(vids[np.arange(1, n)]),
            "v": pa.array(vids[parent[1:]]),
            "flow": pa.array(flow_lbl[1:]),
        }
    )
    return tree


def gomory_hu_tree(
    edges: ray.data.Dataset,
    capacity_col: str | None = None,
    gather_max_arcs: int = GATHER_MAX_ARCS,
) -> pa.Table:
    """Gomory-Hu cut tree of the undirected graph (igraph
    ``igraph_gomory_hu_tree``; ``nx.gomory_hu_tree`` parity): Gusfield's
    n-1 max-flow scheme over the gathered arc table, each flow solved
    by the exact int64 Dinic above.  Rows ``(u, v, flow)``: the min
    s-t cut for ANY pair equals the minimum ``flow`` on the unique
    tree path.  Integer capacities stay exact."""
    m = edges.count()
    if m > gather_max_arcs:
        raise NotImplementedError(
            f"gomory_hu bounded-gather limit: {m} arcs > {gather_max_arcs}"
        )
    cols = ["src", "dst"] + ([capacity_col] if capacity_col else [])
    refs = edges.select_columns(cols).to_arrow_refs()
    return ray.get(_gomory_hu_task.remote(refs, capacity_col))


def edge_connectivity(
    edges: ray.data.Dataset, n: int, directed: bool = False
) -> int:
    """Global λ(G) (undirected): min over t != 0 of λ(0, t) — the
    classic n-1 max-flow reduction igraph uses."""
    best = None
    for t in range(1, n):
        v = st_edge_connectivity(edges, n, 0, t, directed=directed)
        if best is None or v < best:
            best = v
            if best == 0:
                break
    return best if best is not None else 0


@ray.remote(num_returns=2)
def _vc_prepare_task(blocks, n: int):
    """Even/Whitney candidate pairs + the shared node-split arc table.

    Returns ``((delta, pairs), split_table)`` where ``pairs`` is the
    exact candidate list of the classic reduction (networkx
    ``node_connectivity``): pick a minimum-degree vertex v, then
    kappa(G) = min over kappa(v, w) for non-neighbors w and
    kappa(x, y) for non-adjacent pairs of neighbors of v.  The split
    table (v_in = v, v_out = v + n, unit arcs u_out -> w_in per
    directed arc plus one internal v_in -> v_out arc per vertex) is
    built ONCE here and shared by every flow task via the object
    store — never re-shipped per pair."""
    tables = [t for t in ray.get(list(blocks)) if t.num_rows]
    if not tables:  # edgeless graph: kappa = 0
        return (0, []), pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    tbl = pa.concat_tables(tables)
    src = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    # undirected simple view: both directions, no self-loops, dedup
    u = np.concatenate([src, dst])
    w = np.concatenate([dst, src])
    keep = u != w
    u, w = u[keep], w[keep]
    pair_ids = np.unique(u * n + w)  # sorted — adjacency via searchsorted
    u = pair_ids // n
    w = pair_ids % n
    deg = np.bincount(u, minlength=n)

    if n <= 1:
        return (0, []), pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    v = int(np.argmin(deg))  # ties -> smallest vid (np.argmin is first)
    delta = int(deg[v])
    if delta == 0:
        return (0, []), pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )

    nbrs = w[u == v]
    non_nbrs = np.setdiff1d(
        np.arange(n, dtype=np.int64), np.concatenate([nbrs, [v]])
    )
    pairs = [(v, int(t_)) for t_ in non_nbrs]
    if len(nbrs) > 1:
        xi, yi = np.triu_indices(len(nbrs), k=1)
        x, y = nbrs[xi], nbrs[yi]
        cand = x * n + y
        pos = np.searchsorted(pair_ids, cand)
        pos = np.minimum(pos, len(pair_ids) - 1)
        adjacent = pair_ids[pos] == cand
        pairs += [(int(a), int(b)) for a, b in zip(x[~adjacent], y[~adjacent])]

    split = pa.table(
        {
            "src": pa.array(
                np.concatenate([u + n, np.arange(n, dtype=np.int64)])
            ),
            "dst": pa.array(
                np.concatenate([w, np.arange(n, dtype=np.int64) + n])
            ),
        }
    )
    return (delta, pairs), split


@ray.remote
def _vc_flow_task(split: pa.Table, n2: int, s: int, t: int, cutoff: int):
    src = split.column("src").to_numpy(zero_copy_only=False)
    dst = split.column("dst").to_numpy(zero_copy_only=False)
    cap = np.ones(len(src), dtype=np.int64)
    value, _, _ = _dinic_py(
        n2, src, dst, cap, s + n2 // 2, t, False, cutoff=cutoff
    )
    return int(value)


def vertex_connectivity(
    edges: ray.data.Dataset,
    n: int,
    wave: int = 64,
    gather_max_arcs: int = GATHER_MAX_ARCS,
) -> int:
    """Global kappa(G) of the undirected simple graph (igraph
    ``igraph_vertex_connectivity``; ``nx.node_connectivity`` parity).

    Even/Whitney reduction: each candidate kappa(s, t) is an
    INDEPENDENT unit-capacity Dinic on the node-split graph, fanned
    out ``wave`` at a time as raw Ray tasks over the once-shared
    split arc table (the candidate flows have no cross-dependence, so
    this is the rare shape where raw tasks beat a Dataset stage).
    Later waves carry the running best as a Dinic ``cutoff`` so
    hopeless candidates stop after <= best augmentations.  Exact —
    no sampling."""
    m = edges.count()
    if m > gather_max_arcs:
        raise NotImplementedError(
            f"vertex_connectivity bounded-gather limit: {m} arcs > "
            f"{gather_max_arcs}; run on a subgraph (k-core / component)"
        )
    refs = edges.select_columns(["src", "dst"]).to_arrow_refs()
    meta_ref, split_ref = _vc_prepare_task.remote(refs, n)
    delta, pairs = ray.get(meta_ref)
    if n <= 1 or delta == 0:
        return 0
    if not pairs:  # complete graph: no non-adjacent pair exists
        return n - 1
    best = delta
    for i in range(0, len(pairs), wave):
        if best == 0:
            break
        chunk = pairs[i : i + wave]
        futs = [
            _vc_flow_task.remote(split_ref, 2 * n, s, t, best)
            for (s, t) in chunk
        ]
        for v in ray.get(futs):
            if v < best:
                best = v
    return best
