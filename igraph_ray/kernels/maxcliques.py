"""Maximal clique enumeration — igraph ``igraph_maximal_cliques`` /
``nx.find_cliques`` semantics: every maximal clique exactly once.

Distributed shape (Eppstein–Löffler–Strash 2010, "Listing All Maximal
Cliques in Sparse Graphs in Near-Optimal Time"): order vertices by
(degree, vid); every maximal clique C is discovered exactly once, in
the subproblem of its lowest-ordered member ``v``, as a
Bron–Kerbosch-with-pivoting run seeded ``R={v}``, ``P = later
neighbours of v``, ``X = earlier neighbours of v`` over the adjacency
INDUCED on N(v).

Data movement is triangle-bounded: the induced adjacency ships as
(center, a, b) triangle rows — one per (edge, common neighbour), i.e.
Σ_e t_e = 3·T rows total — produced by the same wedge pipeline as
triangle counting and grouped by center in ONE shuffle; neighbour
rows add 2·E more.  The per-group BK is a local in-memory search over
one vertex's neighbourhood (output-sensitive with pivoting; a
``max_neighborhood`` guard raises on hub neighbourhoods too dense to
enumerate rather than silently truncating).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.kernels.degree import undirected_degrees
from igraph_ray.kernels.triangles import canonical_edges
from igraph_ray.utils import hash_int64

MAX_NEIGHBORHOOD = 100_000


def _bk_pivot(adj: dict, R: list, P: set, X: set, out: list) -> None:
    """Bron–Kerbosch with greedy pivoting (Tomita et al. 2006)."""
    if not P and not X:
        out.append(sorted(R))
        return
    pivot = max(P | X, key=lambda u: len(adj[u] & P))
    for v in list(P - adj[pivot]):
        nv = adj[v]
        _bk_pivot(adj, R + [v], P & nv, X & nv, out)
        P.discard(v)
        X.add(v)


def maximal_cliques(
    pairs: ray.data.Dataset,
    vertices: ray.data.Dataset | None = None,
    min_size: int = 1,
    num_parts: int | None = None,
    max_neighborhood: int = MAX_NEIGHBORHOOD,
) -> ray.data.Dataset:
    """Rows ``(clique, size)`` — every maximal clique once, ``clique``
    a sorted ``list<int64>`` of vids.  ``vertices`` (column ``vid``)
    optionally supplies isolated vertices, which are maximal
    singletons (nx.find_cliques parity)."""
    simple = canonical_edges(pairs).materialize()
    degs = undirected_degrees(simple).materialize()
    deg_tbl = pa.concat_tables(
        degs.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    dv = deg_tbl.column("vid").to_numpy(zero_copy_only=False)
    dd = deg_tbl.column("degree").to_numpy(zero_copy_only=False)
    if len(dv) and int(dv.max()) >= (1 << 36):
        raise NotImplementedError(
            "maximal_cliques packs (degree, vid) order keys into int64 "
            "and requires vid < 2**36"
        )
    o_sort = np.argsort(dv, kind="stable")
    order_vids = dv[o_sort].astype(np.int64)
    order_vals = ((dd[o_sort].astype(np.int64) << 36) | order_vids)
    # broadcast the (sorted vids, packed order keys) pair ONCE — each
    # per-vertex group looks its neighbours up with searchsorted
    order_ref = ray.put((order_vids, order_vals))

    # triangle rows (center, a, b): the wedge pipeline emits, per
    # center w, every pair of its neighbours; keep only pairs that are
    # edges via a tagged groupby (same trick as metrics'
    # _merge_onto_edges but retaining the center column)
    n_edges = simple.count()
    if num_parts is None:
        num_parts = int(max(2, min(256, math.ceil(max(1, n_edges) / 250_000))))

    def arcs_with_part(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        u = np.concatenate([s, d])
        v = np.concatenate([d, s])
        part = (hash_int64(u) % np.uint64(num_parts)).astype(np.int32)
        return pa.table(
            {"hpart": pa.array(part), "u": pa.array(u), "v": pa.array(v)}
        )

    arcs = simple.map_batches(
        arcs_with_part, batch_format="pyarrow", zero_copy_batch=True
    )

    def wedges_with_center(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        u, v = u[order], v[order]
        boundary = np.empty(len(u), dtype=bool)
        if len(u):
            boundary[0] = True
            boundary[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(boundary)
        ends = np.append(starts[1:], len(u))
        out_c, out_a, out_b = [], [], []
        for s0, e0 in zip(starts, ends):
            d = e0 - s0
            if d < 2:
                continue
            nb = np.sort(v[s0:e0])
            ii, jj = np.triu_indices(d, k=1)
            out_c.append(np.full(len(ii), u[s0], np.int64))
            out_a.append(nb[ii])
            out_b.append(nb[jj])
        if out_a:
            c = np.concatenate(out_c)
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
        else:
            c = np.empty(0, np.int64)
            a = np.empty(0, np.int64)
            b = np.empty(0, np.int64)
        return pa.table(
            {
                "a": pa.array(a),
                "b": pa.array(b),
                "center": pa.array(c),
                "is_edge": pa.array(np.zeros(len(a), np.int8)),
            }
        )

    wedge_rows = arcs.groupby("hpart").map_groups(
        wedges_with_center, batch_format="pyarrow"
    )

    def edge_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        part = (
            (hash_int64(lo) ^ hash_int64(hi)) % np.uint64(num_parts)
        ).astype(np.int32)
        return pa.table(
            {
                "ppart": pa.array(part),
                "a": pa.array(lo),
                "b": pa.array(hi),
                "center": pa.array(np.full(len(s), -1, np.int64)),
                "is_edge": pa.array(np.ones(len(s), np.int8)),
            }
        )

    def wedge_part(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        part = (
            (hash_int64(a) ^ hash_int64(b)) % np.uint64(num_parts)
        ).astype(np.int32)
        return batch.append_column("ppart", pa.array(part))

    tagged = wedge_rows.map_batches(
        wedge_part, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        simple.map_batches(
            edge_rows, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def close_triangles(group: pa.Table) -> pa.Table:
        """ONE vectorized pass per (a, b)-hash partition — not one
        Python call per distinct pair: sort by (a, b), mark runs that
        contain an edge row, keep their wedge rows as triangles."""
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        c = group.column("center").to_numpy(zero_copy_only=False)
        is_e = group.column("is_edge").to_numpy(zero_copy_only=False)
        if len(a) == 0:
            return pa.table(
                {
                    "v": pa.array([], pa.int64()),
                    "x": pa.array([], pa.int64()),
                    "y": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((b, a))
        a, b, c, is_e = a[order], b[order], c[order], is_e[order]
        first = np.empty(len(a), dtype=bool)
        first[0] = True
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        run_id = np.cumsum(first) - 1
        has_edge = np.zeros(run_id[-1] + 1, dtype=bool)
        np.logical_or.at(has_edge, run_id[is_e == 1], True)
        keep = has_edge[run_id] & (is_e == 0)
        a, b, c = a[keep], b[keep], c[keep]
        return pa.table(
            {
                "v": pa.array(np.concatenate([c, a, b])),
                "x": pa.array(np.concatenate([a, c, c])),
                "y": pa.array(np.concatenate([b, b, a])),
            }
        )

    tri = tagged.groupby("ppart").map_groups(
        close_triangles, batch_format="pyarrow"
    )

    def nbr_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "v": pa.array(np.concatenate([s, d])),
                "x": pa.array(np.concatenate([d, s])),
                "y": pa.array(np.full(2 * len(s), -1, np.int64)),
            }
        )

    nbrs = simple.map_batches(
        nbr_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_vertex(group: pa.Table) -> pa.Table:
        v = int(group.column("v")[0].as_py())
        x = group.column("x").to_numpy(zero_copy_only=False)
        y = group.column("y").to_numpy(zero_copy_only=False)
        if len(x) > max_neighborhood:
            raise NotImplementedError(
                f"neighbourhood of vid {v} has {len(x)} induced rows "
                f"> max_neighborhood={max_neighborhood}"
            )
        nbr = np.unique(x[y == -1])
        adj: dict[int, set] = {int(u): set() for u in nbr}
        tri_mask = y != -1
        for a_, b_ in zip(x[tri_mask].tolist(), y[tri_mask].tolist()):
            adj[a_].add(b_)
            adj[b_].add(a_)
        ovids, ovals = ray.get(order_ref)
        ov = int(ovals[np.searchsorted(ovids, v)])
        nbr_ord = ovals[np.searchsorted(ovids, nbr)]
        P = {int(u) for u, o in zip(nbr.tolist(), nbr_ord) if o > ov}
        X = {int(u) for u, o in zip(nbr.tolist(), nbr_ord) if o < ov}
        out: list[list[int]] = []
        _bk_pivot(adj, [v], P, X, out)
        out = [c for c in out if len(c) >= min_size]
        return pa.table(
            {
                "clique": pa.array(out, pa.large_list(pa.int64())),
                "size": pa.array([len(c) for c in out], pa.int64()),
            }
        )

    cliques = tri.union(nbrs).groupby("v").map_groups(
        per_vertex, batch_format="pyarrow"
    )
    if vertices is not None and min_size <= 1:

        def isolated(batch: pa.Table) -> pa.Table:
            vids = batch.column("vid").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            ovids, _ = ray.get(order_ref)
            pos = np.searchsorted(ovids, vids)
            pos_c = np.minimum(pos, max(len(ovids) - 1, 0))
            present = (
                (len(ovids) > 0) & (ovids[pos_c] == vids)
                if len(ovids)
                else np.zeros(len(vids), bool)
            )
            iso = vids[~present] if len(ovids) else vids
            return pa.table(
                {
                    "clique": pa.array(
                        [[int(u)] for u in iso], pa.large_list(pa.int64())
                    ),
                    "size": pa.array(np.ones(len(iso), np.int64)),
                }
            )

        cliques = cliques.union(
            vertices.map_batches(
                isolated, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    return cliques
