"""K-clique percolation communities — Palla et al. 2005 ("Uncovering
the overlapping community structure of complex networks in nature and
society", Nature 435); networkx oracle
``nx.community.k_clique_communities``
(``NX/algorithms/community/kclique.py``).

nx's own formulation over MAXIMAL cliques: communities are the
connected components of the clique-overlap graph in which two maximal
cliques of size ≥ k are adjacent iff they share ≥ k−1 vertices; each
community is the union of its cliques' vertices.  Communities overlap
— a vertex appears once per community it belongs to.

Distributed shape (no pairwise clique comparison anywhere):

1. maximal cliques ≥ k (existing ELS/Bron–Kerbosch kernel);
2. deterministic dense clique ids — the canonical sorted-vid string is
   ranked by the existing distinct+sort id stage;
3. every clique emits its (k−1)-subsets (C(s, k−1) rows per clique —
   bounded by the max clique size, which the clique kernel already
   guards); two cliques share ≥ k−1 vertices iff they share a
   (k−1)-subset;
4. per subset group, STAR edges (min clique id ↔ rest) — connectivity
   needs no quadratic pair expansion, so hot subsets cost linear rows;
5. connected components over the clique graph (K2 kernel);
6. expand back to distinct ``(vid, community)`` rows, labelled by the
   component label itself (min member clique id) — unique per
   community even when overlapping communities share vertices.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from igraph_ray.kernels.maxcliques import maximal_cliques
from igraph_ray.utils import drop_empty_blocks


def k_clique_communities(
    pairs: ray.data.Dataset,
    k: int,
    graph_dir: str,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Rows ``(vid, community)`` — overlapping k-clique-percolation
    communities; ``community`` is the component label of the clique
    graph (min member clique id — deterministic, unique per
    community).  ``k >= 2``."""
    if k < 2:
        raise ValueError("k_clique_communities requires k >= 2")
    from igraph_ray.api import build_graph
    from igraph_ray.kernels.components import connected_components
    from igraph_ray.stages.vertex_ids import _add_vid, _num_rows

    cliques = maximal_cliques(
        pairs, min_size=k, num_parts=num_parts
    ).materialize()

    def clique_key(batch: pa.Table) -> pa.Table:
        cl = batch.column("clique")
        joined = pc.binary_join(
            pc.cast(cl, pa.list_(pa.string())), ","
        )
        return pa.table({"key": joined, "clique": cl})

    # deterministic dense clique ids: rank the (distinct by
    # construction) canonical keys — sort + per-block offset, the same
    # shape assign_vertex_ids uses, applied in place so the list
    # column never has to ride through a hash join (pyarrow joins
    # reject list payloads)
    sorted_keyed = (
        cliques.map_batches(
            clique_key, batch_format="pyarrow", zero_copy_batch=True
        )
        .sort("key")
        .materialize()
    )
    refs = [
        r
        for r, m in (
            (ref, meta)
            for bundle in sorted_keyed.iter_internal_ref_bundles()
            for ref, meta in zip(bundle.block_refs, bundle.metadata)
        )
        if m.num_rows is None or m.num_rows > 0
    ]
    if not refs:
        return ray.data.from_arrow(
            pa.table(
                {
                    "vid": pa.array([], pa.int64()),
                    "community": pa.array([], pa.int64()),
                }
            )
        )
    counts = ray.get([_num_rows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(
        np.int64
    )
    keyed = ray.data.from_arrow_refs(
        [_add_vid.remote(r, int(off)) for r, off in zip(refs, offsets)]
    ).materialize()
    n_cliques = int(np.sum(counts))

    # (k-1)-subset rows as k-1 INTEGER member columns (m0..m_{k-2},
    # sorted — members are sorted, so subsets are canonical) — no
    # per-row Python string keys anywhere; one vectorized triu-style
    # gather per distinct clique size
    mcols = [f"m{j}" for j in range(k - 1)]

    def subsets(batch: pa.Table) -> pa.Table:
        from itertools import combinations

        cl = batch.column("clique")
        cid = batch.column("vid").to_numpy(zero_copy_only=False)
        flat = cl.combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
        lens = pc.list_value_length(cl).to_numpy(zero_copy_only=False)
        offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        col_parts: list[list[np.ndarray]] = [[] for _ in mcols]
        cid_parts: list[np.ndarray] = []
        for s in np.unique(lens):
            rows = np.flatnonzero(lens == s)
            idx = np.array(
                list(combinations(range(int(s)), k - 1)), dtype=np.int64
            )
            gath = flat[offs[rows][:, None, None] + idx[None, :, :]]
            g2 = gath.reshape(-1, k - 1)
            for j in range(k - 1):
                col_parts[j].append(g2[:, j])
            cid_parts.append(np.repeat(cid[rows], idx.shape[0]))
        cols = {
            m: pa.array(
                np.concatenate(col_parts[j])
                if col_parts[j]
                else np.empty(0, np.int64)
            )
            for j, m in enumerate(mcols)
        }
        cols["cid"] = pa.array(
            np.concatenate(cid_parts)
            if cid_parts
            else np.empty(0, np.int64)
        )
        return pa.table(cols)

    sub = keyed.map_batches(
        subsets, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # star edges per subset group — hash-partitioned, vectorized
    n_sub = sub.count()
    sp = int(max(2, min(65536, n_sub // 250_000 + 2)))

    def add_spart(batch: pa.Table) -> pa.Table:
        from igraph_ray.utils import hash_int64

        h = np.zeros(batch.num_rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for m in mcols:
                v = batch.column(m).to_numpy(zero_copy_only=False)
                h = hash_int64(
                    (h * np.uint64(0x9E3779B97F4A7C15)).astype(np.int64)
                    ^ v.astype(np.uint64).astype(np.int64)
                )
        return batch.append_column(
            "spart",
            pa.array((h % np.uint64(sp)).astype(np.int32)),
        )

    def star_edges(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "weight": pa.array([], pa.float64()),
            }
        )
        if group.num_rows == 0:
            return empty
        ms = [
            group.column(m).to_numpy(zero_copy_only=False)
            for m in mcols
        ]
        cid = group.column("cid").to_numpy(zero_copy_only=False)
        order = np.lexsort((cid, *reversed(ms)))
        ms = [m[order] for m in ms]
        cid = cid[order]
        boundary = np.zeros(len(cid), dtype=bool)
        boundary[0] = True
        for m in ms:
            boundary[1:] |= m[1:] != m[:-1]
        starts = np.flatnonzero(boundary)
        gid = np.cumsum(boundary) - 1
        center = cid[starts]  # min cid per group (cid-sorted)
        hub = center[gid]
        keep = cid != hub  # drop the self arc
        if not keep.any():
            return empty
        return pa.table(
            {
                "src": pa.array(hub[keep]),
                "dst": pa.array(cid[keep]),
                "weight": pa.array(
                    np.ones(int(keep.sum()), np.float64)
                ),
            }
        )

    edges = (
        sub.map_batches(
            add_spart, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("spart")
        .map_groups(star_edges, batch_format="pyarrow")
    )

    clique_vertices = keyed.select_columns(["vid"])
    graph = build_graph(
        edges,
        graph_dir,
        vertices=clique_vertices,
        symmetrize=True,
    )
    comp = connected_components(graph).state.select_columns(
        ["vid", "comp"]
    )

    # expand: clique members × component, then relabel by min member vid
    def member_rows(batch: pa.Table) -> pa.Table:
        cl = batch.column("clique").combine_chunks()
        lens = (
            pc.list_value_length(cl)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "cid": pa.array(
                    np.repeat(
                        batch.column("vid").to_numpy(
                            zero_copy_only=False
                        ),
                        lens,
                    )
                ),
                "member": cl.flatten(),
            }
        )

    members = keyed.map_batches(
        member_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    mj = int(max(2, min(65536, n_cliques // 250_000 + 2)))
    comp_m = drop_empty_blocks(
        comp.rename_columns({"vid": "cid"}).materialize()
    )
    mem_comp = members.join(comp_m, "inner", mj, on=("cid",))

    pairs_vc = mem_comp.map_batches(
        lambda b: pa.table(
            {"community": b.column("comp"), "vid": b.column("member")}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # distinct (community, vid): the community label is the component
    # label itself (min member CLIQUE id) — unique per community even
    # when overlapping communities share their min member VERTEX
    def distinct_part(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["community", "vid"]).aggregate(
            [("vid", "count")]
        )
        return pa.table(
            {"community": g.column("community"), "vid": g.column("vid")}
        )

    from ray.data.aggregate import Count

    distinct = (
        pairs_vc.map_batches(
            distinct_part, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["community", "vid"])
        .aggregate(Count("vid", alias_name="_n"))
        .drop_columns(["_n"])
    )
    return distinct.select_columns(["vid", "community"])
