"""Induced 4-vertex graphlet census — igraph ``motifs_randesu``
(size=4, connected classes) semantics: counts of K4, diamond
(chordal cycle), C4, tailed triangle, path P4, and claw K1,3 as
INDUCED subgraphs.

Distributed shape (Ahmed-Neville-Rossi-Duffield 2015, "Efficient
Graphlet Counting for Large Networks" — the PGD transform): every
induced count is a linear combination of NON-induced counts that the
engine already computes with one wedge pipeline + the K4/rectangle
kernels — no 4-subset enumeration anywhere:

- per-edge codegrees ``t_e`` (wedge pipeline) give triangles
  ``T = Σt_e/3``, non-induced diamonds ``Σ C(t_e,2)``, non-induced
  3-paths ``Σ(d_u−1)(d_v−1) − 3T`` and per-vertex triangle sums;
- per-vertex degrees give non-induced claws ``Σ C(d_v,3)``;
- the K4 kernel and the rectangle (codegree-identity) kernel supply
  the two counts the lower-order statistics cannot see.

Non-induced → induced (containment matrix, verified by the
brute-force 4-subset oracle in tests/test_graphlets.py):

    K4        = K4
    diamond   = Σ_e C(t_e,2) − 6·K4
    C4        = rect − diamond − 3·K4
    tailed    = Σ_v t_v(d_v−2) − 4·diamond − 12·K4
    P4        = [Σ_e (d_u−1)(d_v−1) − 3T] − 2·tailed − 4·C4
                − 6·diamond − 12·K4
    claw      = Σ_v C(d_v,3) − tailed − 2·diamond − 4·K4

All sums are exact int64 per-block partials; the only shuffles are
the wedge groupby, one per-vertex groupby, and the two reused
kernels' own pipelines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from igraph_ray.kernels.cliques import four_clique_counts, four_cycle_count
from igraph_ray.kernels.metrics import (
    _degree_map,
    _merge_onto_edges,
    _wedge_pair_weights,
    attach_degrees,
)


def _sum_column(ds: ray.data.Dataset, col: str) -> int:
    out = ds.aggregate(Sum(col, alias_name="s"))
    return int(out["s"] or 0)


def graphlet_census4(
    pairs: ray.data.Dataset,
    num_parts: int | None = None,
) -> pa.Table:
    """One row ``(n_edges, triangles, k4, diamond, c4, tailed_triangle,
    path4, claw)`` — induced connected 4-graphlet counts of the simple
    undirected graph given as unordered unique pairs ``(src, dst)``."""
    pairs = pairs.select_columns(["src", "dst"]).materialize()
    m = pairs.count()

    # per-edge codegree (common-neighbour count) + endpoint degrees
    wedge = _wedge_pair_weights(pairs, num_parts, None, center_weight="one")
    only_edges = _merge_onto_edges(pairs, wedge)
    degs = _degree_map(pairs)
    with_deg = attach_degrees(
        only_edges.select_columns(["src", "dst", "common"]), degs
    )

    def edge_partials(batch: pa.Table) -> pa.Table:
        c = (
            batch.column("common")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        du = batch.column("deg_src").to_numpy(zero_copy_only=False)
        dv = batch.column("deg_dst").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "sum_c": pa.array([int(c.sum())], pa.int64()),
                "sum_c2": pa.array(
                    [int((c * (c - 1) // 2).sum())], pa.int64()
                ),
                "sum_wpath": pa.array(
                    [int(((du - 1) * (dv - 1)).sum())], pa.int64()
                ),
            }
        )

    ep = with_deg.map_batches(
        edge_partials, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    sum_c = _sum_column(ep, "sum_c")
    sum_c2 = _sum_column(ep, "sum_c2")
    sum_wpath = _sum_column(ep, "sum_wpath")
    triangles = sum_c // 3

    # per-vertex triangle participation: t_v = (Σ_{e∋v} t_e) / 2
    def endpoint_tri(batch: pa.Table) -> pa.Table:
        c = (
            batch.column("common")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        s = batch.column("src").combine_chunks()
        d = batch.column("dst").combine_chunks()
        return pa.table(
            {
                "vid": pa.concat_arrays([s, d]),
                "ce": pa.array(np.concatenate([c, c])),
            }
        )

    tv = (
        only_edges.select_columns(["src", "dst", "common"])
        .map_batches(
            endpoint_tri, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("vid")
        .aggregate(Sum("ce", alias_name="tv2"))
    )
    tv_deg = attach_degrees(
        tv.map_batches(
            lambda b: pa.table(
                {
                    "src": b.column("vid"),
                    "dst": b.column("vid"),
                    "tv2": b.column("tv2"),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        degs,
    )

    def tailed_partial(batch: pa.Table) -> pa.Table:
        t2 = (
            batch.column("tv2")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        d = batch.column("deg_src").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "s": pa.array(
                    [int(((t2 // 2) * (d - 2)).sum())], pa.int64()
                )
            }
        )

    sum_tailed = _sum_column(
        tv_deg.map_batches(
            tailed_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "s",
    )

    def claw_partial(batch: pa.Table) -> pa.Table:
        d = (
            batch.column("degree")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "s": pa.array(
                    [int((d * (d - 1) * (d - 2) // 6).sum())], pa.int64()
                )
            }
        )

    sum_claw = _sum_column(
        degs.map_batches(
            claw_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "s",
    )

    k4_tbl = pa.concat_tables(
        four_clique_counts(pairs).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    k4 = int(
        np.asarray(k4_tbl.column("c4").to_numpy(zero_copy_only=False)).sum()
        // 4
    )

    def both_arcs(batch: pa.Table) -> pa.Table:
        s = batch.column("src").combine_chunks()
        d = batch.column("dst").combine_chunks()
        return pa.table(
            {
                "src": pa.concat_arrays([s, d]),
                "dst": pa.concat_arrays([d, s]),
            }
        )

    rect = four_cycle_count(
        pairs.map_batches(
            both_arcs, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    diamond = sum_c2 - 6 * k4
    c4 = rect - diamond - 3 * k4
    tailed = sum_tailed - 4 * diamond - 12 * k4
    p4_nonind = sum_wpath - 3 * triangles
    p4 = p4_nonind - 2 * tailed - 4 * c4 - 6 * diamond - 12 * k4
    claw = sum_claw - tailed - 2 * diamond - 4 * k4
    return pa.table(
        {
            "n_edges": pa.array([m], pa.int64()),
            "triangles": pa.array([triangles], pa.int64()),
            "k4": pa.array([k4], pa.int64()),
            "diamond": pa.array([diamond], pa.int64()),
            "c4": pa.array([c4], pa.int64()),
            "tailed_triangle": pa.array([tailed], pa.int64()),
            "path4": pa.array([p4], pa.int64()),
            "claw": pa.array([claw], pa.int64()),
        }
    )
