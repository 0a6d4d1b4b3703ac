"""Community quality: Newman modularity of a labeling.

``Q = Σ_c [ in_c / (2m) − (tot_c / (2m))² ]`` where ``in_c`` is twice
the internal edge weight of community c and ``tot_c`` the summed degree
of its members — matching ``networkx.algorithms.community.modularity``
(``NX/algorithms/community/quality.py``), the quality measure SURVEY.md
§5.2 uses to validate label-propagation output beyond the fixed-point
predicate.

Distributed shape: broadcast the (small) vid→label table via
``ray.put``; one vectorized pass over the canonical edge table
accumulates per-community internal weights and degrees as per-block
partials; the final combine is a tiny driver-side reduction over
O(#communities) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.kernels.triangles import canonical_edges


def modularity(
    edges: ray.data.Dataset,
    labels: ray.data.Dataset,
    vid_col: str = "vid",
    label_col: str = "label",
    weighted: bool = False,
) -> float:
    """Modularity of ``labels`` over the undirected simple view of
    ``edges`` (direction ignored, parallel arcs collapsed, self-loops
    dropped).

    ``weighted=False`` counts collapsed edges with weight 1 —
    ``nx.community.modularity(G, comms)`` on the unweighted simple
    graph.  ``weighted=True`` sums collapsed edge weights (parallel
    arcs add, the multigraph-collapse rule), matching
    ``nx.community.modularity(..., weight="weight")`` — use this when
    scoring weighted LPA/Louvain output.  Self-loops are dropped in
    both modes (delta vs networkx, which counts them; LPA/Louvain run
    on symmetrized self-loop-free graphs where the two agree)."""
    if weighted:
        from igraph_ray.stages.symmetrize import symmetrize_dedup

        # both-arcs output → keep each undirected pair once (src < dst)
        both = symmetrize_dedup(edges, keep_self_loops=False)

        def one_arc(batch: pa.Table) -> pa.Table:
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            keep = src < dst
            return pa.table(
                {
                    "src": pa.array(src[keep]),
                    "dst": pa.array(dst[keep]),
                    "weight": pa.array(
                        batch.column("weight").to_numpy(
                            zero_copy_only=False
                        )[keep]
                    ),
                }
            )

        simple = both.map_batches(
            one_arc, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
    else:
        simple = canonical_edges(edges).materialize()

    ltbl = pa.concat_tables(
        labels.select_columns([vid_col, label_col]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    vids = ltbl.column(vid_col).to_numpy(zero_copy_only=False)
    labs = ltbl.column(label_col).to_numpy(zero_copy_only=False)
    order = np.argsort(vids)
    ref = ray.put((vids[order], labs[order]))

    def partials(batch: pa.Table) -> pa.Table:
        v_sorted, l_sorted = ray.get(ref)
        a = batch.column("src").to_numpy(zero_copy_only=False)
        b = batch.column("dst").to_numpy(zero_copy_only=False)
        if weighted:
            w = batch.column("weight").to_numpy(zero_copy_only=False)
        else:
            w = np.ones(len(a), np.float64)
        la = l_sorted[np.searchsorted(v_sorted, a)]
        lb = l_sorted[np.searchsorted(v_sorted, b)]
        # internal edge weight per community
        same = la == lb
        ic = np.unique(la[same])
        in_cnt = np.zeros(len(ic), np.float64)
        np.add.at(in_cnt, np.searchsorted(ic, la[same]), w[same])
        # weighted-degree contribution per community (each endpoint once)
        dc = np.unique(np.concatenate([la, lb]))
        deg_cnt = np.zeros(len(dc), np.float64)
        np.add.at(deg_cnt, np.searchsorted(dc, la), w)
        np.add.at(deg_cnt, np.searchsorted(dc, lb), w)
        return pa.table(
            {
                "community": pa.array(
                    np.concatenate([ic, dc]).astype(np.int64)
                ),
                "internal": pa.array(
                    np.concatenate(
                        [in_cnt, np.zeros(len(dc))]
                    ).astype(np.float64)
                ),
                "degree": pa.array(
                    np.concatenate(
                        [np.zeros(len(ic)), deg_cnt]
                    ).astype(np.float64)
                ),
            }
        )

    part_tbl = pa.concat_tables(
        simple.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    if part_tbl.num_rows == 0:
        return 0.0
    comm = part_tbl.column("community").to_numpy(zero_copy_only=False)
    internal = part_tbl.column("internal").to_numpy(zero_copy_only=False)
    degree = part_tbl.column("degree").to_numpy(zero_copy_only=False)
    order = np.argsort(comm, kind="stable")
    comm, internal, degree = comm[order], internal[order], degree[order]
    first = np.empty(len(comm), dtype=bool)
    first[0] = True
    first[1:] = comm[1:] != comm[:-1]
    seg = np.flatnonzero(first)
    in_c = np.add.reduceat(internal, seg)
    tot_c = np.add.reduceat(degree, seg)
    m = tot_c.sum() / 2.0  # total edges
    if m == 0:
        return 0.0
    return float((in_c / m - (tot_c / (2.0 * m)) ** 2).sum())


# ---------------------------------------------------------------------------
# partition quality (coverage / performance)
# ---------------------------------------------------------------------------
class _CommLookup:
    """Broadcast key→community table fetched once per actor."""

    def __init__(self, ref):
        import pyarrow.compute as pc

        tbl = ray.get(ref)
        keys = tbl.column("key").combine_chunks()
        order = pc.sort_indices(keys)
        self._keys = pc.take(keys, order).to_numpy(zero_copy_only=False)
        self._comm = pc.take(
            tbl.column("comm").combine_chunks(), order
        ).to_numpy(zero_copy_only=False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        cs = self._comm[np.searchsorted(self._keys, s)]
        cd = self._comm[np.searchsorted(self._keys, d)]
        n = len(s)
        intra = int((cs == cd).sum())
        return pa.table(
            {
                "m": pa.array([n], pa.int64()),
                "intra": pa.array([intra], pa.int64()),
            }
        )


def partition_quality(
    pairs: ray.data.Dataset,
    membership: ray.data.Dataset,
    key_col: str = "key",
    comm_col: str = "comm",
) -> pa.Table:
    """Coverage and performance of a vertex partition —
    ``nx.community.partition_quality`` parity on a simple undirected
    loop-free edge table.

    coverage    = intra_edges / m
    performance = (intra_edges + inter_non_edges) / C(n, 2)

    One row of exact int64 sufficient statistics
    ``(n, m, intra_edges, intra_pairs)`` plus the two IEEE divisions —
    a SQL twin replays them bitwise.

    Distributed shape: the O(V) membership table is broadcast once per
    actor (engine small-side rule; swap in a hash join keyed on each
    endpoint past broadcast reach, the ``attach_vids`` fallback shape);
    edge-side work is per-batch counting, community sizes are one
    groupby over the membership table with per-batch Σ C(size, 2)
    partials — no O(V) or O(E) driver state.
    """
    from ray.data.aggregate import Count, Sum

    mem = membership.select_columns([key_col, comm_col]).rename_columns(
        {key_col: "key", comm_col: "comm"}
    )
    mtbl = pa.concat_tables(
        mem.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    n = mtbl.num_rows
    ref = ray.put(mtbl)

    edge_stats = pairs.map_batches(
        _CommLookup,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    res = edge_stats.aggregate(
        Sum("m", alias_name="m"), Sum("intra", alias_name="intra")
    )
    m = int(res.get("m") or 0)
    intra = int(res.get("intra") or 0)

    sizes = mem.groupby("comm").aggregate(Count("comm", alias_name="c"))

    def pair_partial(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"p": pa.array([int((c * (c - 1) // 2).sum())], pa.int64())}
        )

    ip = sizes.map_batches(
        pair_partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(Sum("p", alias_name="p"))
    intra_pairs = int(ip.get("p") or 0)

    total_pairs = n * (n - 1) // 2
    inter_non_edges = (total_pairs - intra_pairs) - (m - intra)
    coverage = intra / m if m else 0.0
    performance = (
        (intra + inter_non_edges) / total_pairs if total_pairs else 0.0
    )
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "m": pa.array([m], pa.int64()),
            "intra_edges": pa.array([intra], pa.int64()),
            "intra_pairs": pa.array([intra_pairs], pa.int64()),
            "coverage": pa.array([coverage], pa.float64()),
            "performance": pa.array([performance], pa.float64()),
        }
    )
