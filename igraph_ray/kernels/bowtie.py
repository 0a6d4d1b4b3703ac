"""Bow-tie decomposition of a directed graph (Broder et al., "Graph
structure in the Web", WWW 2000): every vertex is classified into one
of five regions relative to the largest strongly connected component

* ``core``          — member of the largest SCC (ties: smallest label)
* ``in``            — reaches the core but is not in it
* ``out``           — reachable from the core but not in it
* ``tendril``       — weakly connected to the core, neither in nor out
  (includes the paper's tendrils and tubes)
* ``disconnected``  — not even weakly connected to the core

Built entirely from kernels this engine already ships — SCC
(fwd/bwd min-label peeling), two single-source BFS lanes, and weak
components — so every stage streams through the same partitioned-CSR
chassis.  Because the core is strongly connected, reachability to/from
the WHOLE core equals reachability to/from any single member, so both
BFS lanes are single-source from the core's canonical (min-vid) label:
no O(|core|) source broadcast is ever needed.

Scale notes: three graph builds (fwd, bwd, sym) over the arc table are
the only all-to-all exchanges; the classification join is a single
hash-partitioned union of four O(V) state tables, vectorized per
partition (no per-vertex Python).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count

REGIONS = ("core", "in", "out", "tendril", "disconnected")


def _tag(ds: ray.data.Dataset, kind: int, col: str) -> ray.data.Dataset:
    """Project a kernel state table to ``(vid, kind, val)``."""

    def _f(batch: pa.Table) -> pa.Table:
        val = batch.column(col).to_numpy(zero_copy_only=False)
        if val.dtype.kind == "f":  # BFS dist: finite ⇒ reachable
            val = np.isfinite(val).astype(np.int64)
        else:
            val = val.astype(np.int64)
        return pa.table(
            {
                "vid": batch.column("vid"),
                "kind": pa.array(
                    np.full(batch.num_rows, kind, np.int8), pa.int8()
                ),
                "val": pa.array(val, pa.int64()),
            }
        )

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def bowtie(
    edges: ray.data.Dataset,
    graph_dir: str,
    num_parts: int | None = None,
    vertices: ray.data.Dataset | None = None,
    max_rounds: int = 64,
) -> ray.data.Dataset:
    """Classify every vertex of the directed arc table ``edges``
    (``src``/``dst`` vids + ``weight``) into its bow-tie region.

    Returns a dataset ``(vid, region)`` with ``region`` one of
    :data:`REGIONS`.  ``vertices`` (a ``(vid)`` dataset) adds isolated
    vertices, exactly as in :func:`igraph_ray.api.build_graph`.
    """
    from igraph_ray.api import build_graph
    from igraph_ray.kernels.components import connected_components
    from igraph_ray.kernels.scc import strongly_connected_components
    from igraph_ray.kernels.sssp import shortest_paths

    edges = edges.materialize()
    fwd = build_graph(
        edges, os.path.join(graph_dir, "fwd"), num_parts=num_parts,
        vertices=vertices,
    )

    def reverse(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch.column("dst"),
                "dst": batch.column("src"),
                "weight": batch.column("weight"),
            }
        )

    rev = edges.map_batches(
        reverse, batch_format="pyarrow", zero_copy_batch=True
    )
    # bwd and sym reuse the fwd build's vid→part assignment so all four
    # state tables align partition-for-partition
    bwd = build_graph(
        rev,
        os.path.join(graph_dir, "bwd"),
        num_parts=fwd.num_parts,
        vertices=vertices,
        part_overrides=fwd.overrides,
    )
    sym = build_graph(
        edges.union(rev),
        os.path.join(graph_dir, "sym"),
        num_parts=fwd.num_parts,
        vertices=vertices,
        part_overrides=fwd.overrides,
    )

    scc_state = strongly_connected_components(fwd, bwd, max_rounds=max_rounds)
    scc_state = scc_state.materialize()

    # largest SCC, ties broken toward the smallest canonical label; the
    # grouped count is O(#SCCs) and the driver takes exactly one row
    top = (
        scc_state.groupby("scc")
        .aggregate(Count("scc", alias_name="n"))
        .sort(["n", "scc"], descending=[True, False])
        .limit(1)
        .take_all()
    )
    core_label = int(top[0]["scc"])

    fwd_run = shortest_paths(fwd, [core_label], weighted=False)
    bwd_run = shortest_paths(bwd, [core_label], weighted=False)
    comp_run = connected_components(sym)

    tagged = (
        _tag(scc_state.select_columns(["vid", "scc"]), 0, "scc")
        .union(_tag(fwd_run.state.select_columns(["vid", "dist"]), 1, "dist"))
        .union(_tag(bwd_run.state.select_columns(["vid", "dist"]), 2, "dist"))
        .union(_tag(comp_run.state.select_columns(["vid", "comp"]), 3, "comp"))
    )

    # the weak component containing the core = the component label OF
    # the core's canonical vid (a member of the core)
    core_comp_rows = (
        comp_run.state.select_columns(["vid", "comp"])
        .map_batches(
            lambda b: b.filter(pc.equal(b.column("vid"), core_label)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .take_all()
    )
    core_comp = int(core_comp_rows[0]["comp"])

    num_parts_cls = max(1, fwd.num_vertices // 250_000) if fwd.num_vertices else 1

    def add_hpart(batch: pa.Table) -> pa.Table:
        vid = batch.column("vid").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "hpart", pa.array((vid % num_parts_cls).astype(np.int64))
        )

    def classify(group: pa.Table) -> pa.Table:
        vid = group.column("vid").to_numpy(zero_copy_only=False)
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        val = group.column("val").to_numpy(zero_copy_only=False)
        order = np.lexsort((kind, vid))
        vid, kind, val = vid[order], kind[order], val[order]
        n = len(vid) // 4
        if n * 4 != len(vid):  # pragma: no cover - state tables align
            raise AssertionError("bowtie: state tables do not align")
        vids = vid.reshape(n, 4)[:, 0]
        vals = val.reshape(n, 4)
        scc_v, fwd_fin, bwd_fin, comp_v = (
            vals[:, 0], vals[:, 1], vals[:, 2], vals[:, 3],
        )
        is_core = scc_v == core_label
        region_idx = np.full(n, 4, np.int8)  # disconnected
        region_idx[comp_v == core_comp] = 3  # tendril/tube
        region_idx[(fwd_fin == 1) & ~is_core] = 2  # out
        region_idx[(bwd_fin == 1) & ~is_core] = 1  # in
        region_idx[is_core] = 0  # core
        regions = np.asarray(REGIONS, dtype=object)[region_idx]
        return pa.table(
            {
                "vid": pa.array(vids, pa.int64()),
                "region": pa.array(regions, pa.string()),
            }
        )

    return (
        tagged.map_batches(
            add_hpart, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("hpart")
        .map_groups(classify, batch_format="pyarrow")
    )
