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
