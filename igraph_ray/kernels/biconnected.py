"""Biconnected components and articulation points (Tarjan–Vishkin).

Semantics: igraph ``igraph_biconnected_components`` /
``igraph_articulation_points`` — a biconnected component is a maximal
set of edges such that any two lie on a common simple cycle (every
edge, including a bridge, belongs to exactly one); a vertex is an
articulation point (cut vertex) iff removing it increases the number
of connected components, equivalently iff its incident edges span at
least two biconnected components.  networkx twins:
``nx.biconnected_component_edges`` / ``nx.articulation_points``.

The reference algorithm is a sequential DFS (Hopcroft–Tarjan), so this
kernel uses the standard parallel reduction instead — **Tarjan–Vishkin
(1985)** as given in JáJá §5.3, which works with ANY rooted spanning
forest: compute preorder ``pre``, subtree size ``nd`` and subtree
non-tree reach ``low``/``high`` per vertex, then build an auxiliary
graph whose vertices are the tree edges (identified with their child
endpoint) and whose connected components are exactly the biconnected
components of the input:

- rule 1: a non-tree edge {u, w} with ``pre(u) < pre(w)`` and
  ``pre(w) ≥ pre(u) + nd(u)`` (endpoints unrelated in the forest)
  connects tree edges ``u`` and ``w``;
- rule 2: a tree edge (v, w) with parent v ≠ root and
  ``low(w) < pre(v)  or  high(w) ≥ pre(v) + nd(v)`` (some non-tree
  edge escapes subtree(w) past v) connects tree edges ``v`` and ``w``;
- a non-tree edge {u, w} with ``pre(u) < pre(w)`` belongs to the
  biconnected component of tree edge ``w``.

Two execution paths (the engine's standard switch, cf. bridges /
matching / triangles' broadcast close):

**Fast path** (distinct pairs ≤ ``single_task_max``): the whole
reduction — min-label hooking components, level-synchronous BFS
forest, level-vectorized ``pre``/``nd``/``low``/``high``, both rules,
and hooking components of the auxiliary graph — runs in ONE numpy
task; every step is a vectorized array pass, no per-vertex Python.

**Distributed path** (beyond the bound): spanning forest from the
Borůvka kernel; tree passes as single O(V) tasks (bounded separately
— the forest is O(V) while pairs are O(E)); forest membership via a
tagged groupby; rule-1 + non-tree reach contributions as an O(E)
broadcast-lookup actor-pool pass combined by one groupby; rule 2 as
an O(V) pass; auxiliary components via the distributed
min-label-propagation kernel; labeling as a final O(E) pass.  At V
beyond the tree-task bound the remaining extension is distributing
the two tree passes, for which the bridges kernel's leaf peel
(bottom-up aggregates) and the toposort level loop (top-down) are the
proven shapes; the O(E) stages are already distributed.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min


def _multi_arange(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenated ``arange(s, s+c)`` per (start, count) pair."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    out = np.ones(total, np.int64)
    ends = counts.cumsum()
    out[0] = starts[0]
    out[ends[:-1]] = starts[1:] - (starts[:-1] + counts[:-1] - 1)
    return out.cumsum()


def _seg_starts(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    boundary = np.empty(len(key), dtype=bool)
    boundary[0] = True
    boundary[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(boundary)
    return starts, np.append(starts[1:], len(key))


def _hook_components(n: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Min-label hooking + pointer jumping (Shiloach–Vishkin flavour,
    O(log n) vectorized rounds) — rep[i] = min index in i's component."""
    rep = np.arange(n)
    if len(x) == 0:
        return rep
    while True:
        px, py = rep[x], rep[y]
        lo = np.minimum(px, py)
        hi = np.maximum(px, py)
        before = rep.copy()
        np.minimum.at(rep, hi, lo)
        while True:
            nxt = rep[rep]
            if np.array_equal(nxt, rep):
                break
            rep = nxt
        if np.array_equal(rep, before):
            break
    return rep


def _bfs_forest(
    n: int, ai: np.ndarray, bi: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Level-synchronous BFS from the min-index vertex of every
    component → (parent_idx with -1 at roots, level)."""
    rep = _hook_components(n, ai, bi)
    roots = np.flatnonzero(rep == np.arange(n))
    u = np.concatenate([ai, bi])
    w = np.concatenate([bi, ai])
    order = np.argsort(u, kind="stable")
    u, w = u[order], w[order]
    indptr = np.searchsorted(u, np.arange(n + 1))
    level = np.full(n, -1, np.int64)
    par = np.full(n, -1, np.int64)
    level[roots] = 0
    frontier = roots
    lev = 0
    while frontier.size:
        lev += 1
        counts = indptr[frontier + 1] - indptr[frontier]
        nz = counts > 0
        idx = _multi_arange(indptr[frontier[nz]], counts[nz])
        tgt = w[idx]
        src = np.repeat(frontier[nz], counts[nz])
        new = level[tgt] == -1
        tgt, src = tgt[new], src[new]
        if tgt.size:
            order2 = np.lexsort((src, tgt))
            tgt, src = tgt[order2], src[order2]
            first = np.ones(len(tgt), dtype=bool)
            first[1:] = tgt[1:] != tgt[:-1]
            tgt, src = tgt[first], src[first]
            level[tgt] = lev
            par[tgt] = src
        frontier = tgt
    return par, level


def _pre_nd(
    par: np.ndarray, level: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Preorder + subtree sizes from (parent, level); sibling order =
    index order, trees laid out in root-index order.  Returns
    (pre, nd, by_lev, lev_pos) — the level ordering is reused by the
    low/high pass."""
    n = len(par)
    maxlev = int(level.max()) if n else 0
    by_lev = np.argsort(level, kind="stable")
    lev_pos = np.searchsorted(level[by_lev], np.arange(maxlev + 2))
    nd = np.ones(n, np.int64)
    for lv in range(maxlev, 0, -1):
        sel = by_lev[lev_pos[lv] : lev_pos[lv + 1]]
        np.add.at(nd, par[sel], nd[sel])
    pre = np.zeros(n, np.int64)
    offv = np.zeros(n, np.int64)
    ch = np.flatnonzero(par >= 0)
    if ch.size:
        order3 = np.lexsort((ch, par[ch]))
        chs = ch[order3]
        starts, ends = _seg_starts(par[chs])
        csum = np.cumsum(nd[chs])
        excl = csum - nd[chs]
        base = np.repeat(excl[starts], ends - starts)
        offv[chs] = 1 + (excl - base)
    roots = np.flatnonzero(par < 0)
    rsz = nd[roots]
    pre[roots] = np.cumsum(rsz) - rsz
    for lv in range(1, maxlev + 1):
        sel = by_lev[lev_pos[lv] : lev_pos[lv + 1]]
        pre[sel] = pre[par[sel]] + offv[sel]
    return pre, nd, by_lev, lev_pos


def _subtree_minmax(
    low: np.ndarray,
    high: np.ndarray,
    par: np.ndarray,
    by_lev: np.ndarray,
    lev_pos: np.ndarray,
) -> None:
    """In-place reverse-level subtree min/max accumulation."""
    for lv in range(len(lev_pos) - 2, 0, -1):
        sel = by_lev[lev_pos[lv] : lev_pos[lv + 1]]
        np.minimum.at(low, par[sel], low[sel])
        np.maximum.at(high, par[sel], high[sel])


def _canon_pairs(edges: ray.data.Dataset) -> ray.data.Dataset:
    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {"a": pa.array(np.minimum(s, d)), "b": pa.array(np.maximum(s, d))}
        )

    return (
        edges.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .aggregate(Max("a", alias_name="_d"))
        .select_columns(["a", "b"])
    )


def _bicomp_single_task(batch: pa.Table) -> pa.Table:
    """The whole Tarjan–Vishkin reduction over all distinct pairs in
    one vectorized task → (src, dst, bicomp)."""
    a = batch.column("a").to_numpy(zero_copy_only=False)
    b = batch.column("b").to_numpy(zero_copy_only=False)
    if len(a) == 0:
        return pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "bicomp": pa.array([], pa.int64()),
            }
        )
    allv = np.unique(np.concatenate([a, b]))
    n = len(allv)
    ai = np.searchsorted(allv, a)
    bi = np.searchsorted(allv, b)
    par, level = _bfs_forest(n, ai, bi)
    pre, nd, by_lev, lev_pos = _pre_nd(par, level)
    tree = (par[bi] == ai) | (par[ai] == bi)

    na, nb = ai[~tree], bi[~tree]
    low = pre.copy()
    high = pre.copy()
    np.minimum.at(low, na, pre[nb])
    np.minimum.at(low, nb, pre[na])
    np.maximum.at(high, na, pre[nb])
    np.maximum.at(high, nb, pre[na])
    _subtree_minmax(low, high, par, by_lev, lev_pos)

    # rule 1 over non-tree pairs
    swap = pre[nb] < pre[na]
    uu = np.where(swap, nb, na)
    ww = np.where(swap, na, nb)
    unrelated = pre[ww] >= pre[uu] + nd[uu]
    # rule 2 over tree pairs
    ta, tb = ai[tree], bi[tree]
    b_child = par[tb] == ta
    wv = np.where(b_child, tb, ta)
    vv = np.where(b_child, ta, tb)
    ok = (par[vv] >= 0) & (
        (low[wv] < pre[vv]) | (high[wv] >= pre[vv] + nd[vv])
    )
    comp = _hook_components(
        n,
        np.concatenate([uu[unrelated], vv[ok]]),
        np.concatenate([ww[unrelated], wv[ok]]),
    )
    label_idx = np.empty(len(a), np.int64)
    label_idx[tree] = wv
    label_idx[~tree] = ww
    return pa.table(
        {
            "src": pa.array(a),
            "dst": pa.array(b),
            "bicomp": pa.array(allv[comp[label_idx]]),
        }
    )


def _tree_pass1(batch: pa.Table) -> pa.Table:
    """Forest edges → (vid, parent, level, pre, nd); parent = -1 at the
    per-tree root (min vid)."""
    fa = batch.column("a").to_numpy(zero_copy_only=False)
    fb = batch.column("b").to_numpy(zero_copy_only=False)
    if len(fa) == 0:
        return pa.table(
            {
                "vid": pa.array([], pa.int64()),
                "parent": pa.array([], pa.int64()),
                "level": pa.array([], pa.int64()),
                "pre": pa.array([], pa.int64()),
                "nd": pa.array([], pa.int64()),
            }
        )
    allv = np.unique(np.concatenate([fa, fb]))
    n = len(allv)
    ai = np.searchsorted(allv, fa)
    bi = np.searchsorted(allv, fb)
    par, level = _bfs_forest(n, ai, bi)
    pre, nd, _, _ = _pre_nd(par, level)
    parent_vid = np.where(par >= 0, allv[np.maximum(par, 0)], -1)
    return pa.table(
        {
            "vid": pa.array(allv),
            "parent": pa.array(parent_vid),
            "level": pa.array(level),
            "pre": pa.array(pre),
            "nd": pa.array(nd),
        }
    )


class _AttrLookup:
    """Actor-pool stage holding broadcast per-vertex attrs (sorted-vid
    numpy arrays, fetched once per actor)."""

    def __init__(self, ref, cols: tuple[str, ...]):
        arrays = ray.get(ref)
        self.vid = arrays["vid"]
        self.cols = {c: arrays[c] for c in cols}

    def take(self, v: np.ndarray, col: str) -> np.ndarray:
        idx = np.searchsorted(self.vid, v)
        return self.cols[col][idx]


class _Rule1AndNT(_AttrLookup):
    """Non-forest pairs → rule-1 aux edges (kind 0) + per-vertex
    non-tree preorder contributions (kind 1)."""

    def __init__(self, ref):
        super().__init__(ref, ("pre", "nd"))

    def __call__(self, batch: pa.Table) -> pa.Table:
        nf = batch.filter(pc.equal(batch.column("in_forest"), 0))
        a = nf.column("a").to_numpy(zero_copy_only=False)
        b = nf.column("b").to_numpy(zero_copy_only=False)
        pre_a = self.take(a, "pre")
        pre_b = self.take(b, "pre")
        swap = pre_b < pre_a
        uu = np.where(swap, b, a)  # smaller preorder
        ww = np.where(swap, a, b)
        pre_u = np.where(swap, pre_b, pre_a)
        pre_w = np.where(swap, pre_a, pre_b)
        unrelated = pre_w >= pre_u + self.take(uu, "nd")
        k = int(unrelated.sum())
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(k, np.int8), np.ones(2 * len(a), np.int8)]
                    ),
                    pa.int8(),
                ),
                "x": pa.array(np.concatenate([uu[unrelated], a, b])),
                "y": pa.array(np.concatenate([ww[unrelated], pre_b, pre_a])),
            }
        )


def _tree_pass2(batch: pa.Table) -> pa.Table:
    """Attr rows (kind 0: vid,parent,level,pre) ∪ non-tree min/max rows
    (kind 1: vid, ntmin, ntmax) → (vid, low, high)."""
    kind = batch.column("kind").to_numpy(zero_copy_only=False)
    at = kind == 0
    vid = batch.column("vid").to_numpy(zero_copy_only=False)[at]
    if len(vid) == 0:
        return pa.table(
            {
                "vid": pa.array([], pa.int64()),
                "low": pa.array([], pa.int64()),
                "high": pa.array([], pa.int64()),
            }
        )
    order = np.argsort(vid)
    vid = vid[order]
    parent = batch.column("parent").to_numpy(zero_copy_only=False)[at][order]
    level = batch.column("level").to_numpy(zero_copy_only=False)[at][order]
    pre = batch.column("pre").to_numpy(zero_copy_only=False)[at][order]
    low = pre.copy()
    high = pre.copy()

    nt = kind == 1
    nvid = batch.column("vid").to_numpy(zero_copy_only=False)[nt]
    if len(nvid):
        ntmin = batch.column("ntmin").to_numpy(zero_copy_only=False)[nt]
        ntmax = batch.column("ntmax").to_numpy(zero_copy_only=False)[nt]
        idx = np.searchsorted(vid, nvid)
        np.minimum.at(low, idx, ntmin)
        np.maximum.at(high, idx, ntmax)

    par = np.where(
        parent >= 0, np.searchsorted(vid, np.maximum(parent, 0)), -1
    )
    maxlev = int(level.max())
    by_lev = np.argsort(level, kind="stable")
    lev_pos = np.searchsorted(level[by_lev], np.arange(maxlev + 2))
    _subtree_minmax(low, high, par, by_lev, lev_pos)
    return pa.table(
        {"vid": pa.array(vid), "low": pa.array(low), "high": pa.array(high)}
    )


class _Rule2(_AttrLookup):
    """Forest pairs → rule-2 aux edges (parent v ≠ root whose subtree
    edge to child w lies on a cycle through v's parent edge)."""

    def __init__(self, ref):
        super().__init__(ref, ("pre", "nd", "parent", "low", "high"))

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        b_child = self.take(b, "parent") == a
        wv = np.where(b_child, b, a)
        vv = np.where(b_child, a, b)
        v_nonroot = self.take(vv, "parent") >= 0
        pre_v = self.take(vv, "pre")
        keep = v_nonroot & (
            (self.take(wv, "low") < pre_v)
            | (self.take(wv, "high") >= pre_v + self.take(vv, "nd"))
        )
        return pa.table({"x": pa.array(vv[keep]), "y": pa.array(wv[keep])})


class _LabelPairs(_AttrLookup):
    """Every pair → (src, dst, bicomp): tree edge gets the child's aux
    component, non-tree edge the later-preorder endpoint's."""

    def __init__(self, ref):
        super().__init__(ref, ("pre", "parent", "comp"))

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        forest = batch.column("in_forest").to_numpy(zero_copy_only=False) == 1
        b_child = self.take(b, "parent") == a
        tree_w = np.where(b_child, b, a)
        later = np.where(self.take(b, "pre") > self.take(a, "pre"), b, a)
        wv = np.where(forest, tree_w, later)
        return pa.table(
            {
                "src": pa.array(a),
                "dst": pa.array(b),
                "bicomp": pa.array(self.take(wv, "comp")),
            }
        )


class _ChildVids(_AttrLookup):
    """Forest pairs → the child endpoint of each tree edge (= the
    auxiliary graph's vertex set, one row per non-root vertex)."""

    def __init__(self, ref):
        super().__init__(ref, ("parent",))

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch.column("src").to_numpy(zero_copy_only=False)
        b = batch.column("dst").to_numpy(zero_copy_only=False)
        b_child = self.take(b, "parent") == a
        return pa.table({"vid": pa.array(np.where(b_child, b, a))})


def biconnected_edge_labels(
    edges: ray.data.Dataset,
    graph_dir: str | None = None,
    single_task_max: int = 5_000_000,
) -> ray.data.Dataset:
    """(src, dst, bicomp) — one row per distinct undirected pair
    (src < dst, loops dropped); ``bicomp`` = min tree-child vid of the
    edge's biconnected component (deterministic)."""
    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_bc_")
    pairs = _canon_pairs(edges).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "bicomp": pa.array([], pa.int64()),
                }
            )
        )

    if n_pairs <= single_task_max:
        return pairs.repartition(1).map_batches(
            _bicomp_single_task, batch_format="pyarrow", batch_size=None
        )

    return _bicomp_distributed(pairs, graph_dir)


def _bicomp_distributed(
    pairs: ray.data.Dataset,
    graph_dir: str,
    tree_task_max: int = 5_000_000,
) -> ray.data.Dataset:
    from igraph_ray.api import build_graph
    from igraph_ray.kernels.components import connected_components
    from igraph_ray.kernels.mst import minimum_spanning_forest

    def unit_weight(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch.column("a"),
                "dst": batch.column("b"),
                "weight": pa.array(np.ones(batch.num_rows)),
            }
        )

    forest = minimum_spanning_forest(
        pairs.map_batches(
            unit_weight, batch_format="pyarrow", zero_copy_batch=True
        ),
        work_dir=os.path.join(graph_dir, "msf"),
    ).materialize()
    if forest.count() > tree_task_max:
        raise NotImplementedError(
            "tree passes beyond the single-task bound need the "
            "distributed peel path (see module docstring)"
        )

    # ---- tree pass 1 ------------------------------------------------
    attrs = (
        forest.map_batches(
            lambda t: pa.table({"a": t.column("src"), "b": t.column("dst")}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(1)
        .map_batches(_tree_pass1, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    attr_tbl = pa.concat_tables(
        attrs.iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("vid")

    def np_of(tbl: pa.Table, col: str) -> np.ndarray:
        return tbl.column(col).to_numpy(zero_copy_only=False)

    base = {
        "vid": np_of(attr_tbl, "vid"),
        "pre": np_of(attr_tbl, "pre"),
        "nd": np_of(attr_tbl, "nd"),
        "parent": np_of(attr_tbl, "parent"),
    }
    ref1 = ray.put(base)

    # ---- forest membership per pair (tagged groupby) -----------------
    def tag(flag: int):
        def _f(batch: pa.Table) -> pa.Table:
            cols = ("a", "b") if flag == 0 else ("src", "dst")
            return pa.table(
                {
                    "a": batch.column(cols[0]),
                    "b": batch.column(cols[1]),
                    "in_forest": pa.array(
                        np.full(batch.num_rows, flag, np.int64)
                    ),
                }
            )

        return _f

    marked = (
        pairs.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True)
        .union(
            forest.map_batches(
                tag(1), batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby(["a", "b"])
        .aggregate(Max("in_forest", alias_name="in_forest"))
        .materialize()
    )

    # ---- distributed rule 1 + non-tree reach contributions ----------
    r1nt = marked.map_batches(
        _Rule1AndNT,
        fn_constructor_args=(ref1,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    ).materialize()
    aux1 = r1nt.map_batches(
        lambda t: pa.table(
            {
                "x": t.filter(pc.equal(t.column("kind"), 0)).column("x"),
                "y": t.filter(pc.equal(t.column("kind"), 0)).column("y"),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    nt = (
        r1nt.map_batches(
            lambda t: pa.table(
                {
                    "vid": t.filter(pc.equal(t.column("kind"), 1)).column("x"),
                    "p": t.filter(pc.equal(t.column("kind"), 1)).column("y"),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("vid")
        .aggregate(Min("p", alias_name="ntmin"), Max("p", alias_name="ntmax"))
    )

    # ---- tree pass 2: low/high --------------------------------------
    def attr_rows(batch: pa.Table) -> pa.Table:
        z = np.zeros(batch.num_rows, np.int64)
        return pa.table(
            {
                "kind": pa.array(np.zeros(batch.num_rows, np.int8), pa.int8()),
                "vid": batch.column("vid"),
                "parent": batch.column("parent"),
                "level": batch.column("level"),
                "pre": batch.column("pre"),
                "ntmin": pa.array(z),
                "ntmax": pa.array(z),
            }
        )

    def nt_rows(batch: pa.Table) -> pa.Table:
        z = np.zeros(batch.num_rows, np.int64)
        return pa.table(
            {
                "kind": pa.array(np.ones(batch.num_rows, np.int8), pa.int8()),
                "vid": batch.column("vid"),
                "parent": pa.array(z),
                "level": pa.array(z),
                "pre": pa.array(z),
                "ntmin": batch.column("ntmin"),
                "ntmax": batch.column("ntmax"),
            }
        )

    lowhigh = (
        attrs.map_batches(
            attr_rows, batch_format="pyarrow", zero_copy_batch=True
        )
        .union(
            nt.map_batches(
                nt_rows, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .repartition(1)
        .map_batches(_tree_pass2, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    lh_tbl = pa.concat_tables(
        lowhigh.iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("vid")
    ref2 = ray.put(
        {**base, "low": np_of(lh_tbl, "low"), "high": np_of(lh_tbl, "high")}
    )

    # ---- distributed rule 2 over forest edges ------------------------
    aux2 = forest.map_batches(
        lambda t: pa.table({"a": t.column("src"), "b": t.column("dst")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).map_batches(
        _Rule2,
        fn_constructor_args=(ref2,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )

    # ---- components of the auxiliary graph ---------------------------
    def aux_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch.column("x"),
                "dst": batch.column("y"),
                "weight": pa.array(np.ones(batch.num_rows)),
            }
        )

    aux_vertices = forest.map_batches(
        _ChildVids,
        fn_constructor_args=(ref1,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    aux_graph = build_graph(
        aux1.union(aux2).map_batches(
            aux_edges, batch_format="pyarrow", zero_copy_batch=True
        ),
        os.path.join(graph_dir, "gaux"),
        vertices=aux_vertices,
        symmetrize=True,
    )
    comp = (
        connected_components(aux_graph)
        .state.select_columns(["vid", "comp"])
        .materialize()
    )
    comp_tbl = pa.concat_tables(
        comp.iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("vid")
    # comp lookup is over non-root vids only — merge into full attr order
    cvid = np_of(comp_tbl, "vid")
    cval = np_of(comp_tbl, "comp")
    full = np.full(len(base["vid"]), -1, np.int64)
    full[np.searchsorted(base["vid"], cvid)] = cval
    ref3 = ray.put({**base, "comp": full})

    return marked.map_batches(
        _LabelPairs,
        fn_constructor_args=(ref3,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


def articulation_points(
    edges: ray.data.Dataset | None = None,
    graph_dir: str | None = None,
    single_task_max: int = 5_000_000,
    labels: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """(vid,) — cut vertices: endpoints incident to ≥ 2 distinct
    biconnected components (covers the DFS root-rule uniformly).
    Pass precomputed ``labels`` to reuse a prior
    :func:`biconnected_edge_labels` result."""
    if labels is None:
        labels = biconnected_edge_labels(
            edges, graph_dir=graph_dir, single_task_max=single_task_max
        )

    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": pa.concat_arrays(
                    [
                        batch.column("src").combine_chunks(),
                        batch.column("dst").combine_chunks(),
                    ]
                ),
                "bicomp": pa.concat_arrays(
                    [
                        batch.column("bicomp").combine_chunks(),
                        batch.column("bicomp").combine_chunks(),
                    ]
                ),
            }
        )

    return (
        labels.map_batches(
            endpoints, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["vid", "bicomp"])
        .aggregate(Max("bicomp", alias_name="_d"))
        .groupby("vid")
        .aggregate(Count(alias_name="n_comps"))
        .map_batches(
            lambda t: t.filter(pc.greater(t.column("n_comps"), 1)).select(
                ["vid"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
