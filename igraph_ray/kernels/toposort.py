"""Topological layering of a DAG: ``layer(v)`` = length of the longest
directed path ending at ``v`` (0 for sources).

Covers igraph's ``igraph_topological_sorting`` surface in the form that
distributes: sorting a DAG into *layers* (every arc goes from a lower
to a strictly higher layer, so concatenating layers in order is a valid
topological order; within a layer vertices are independent).  Like
igraph, a graph with a directed cycle is an error — detected here as
non-convergence within the longest-possible-path bound.

Same max-plus chassis shape as the BFS kernels (min-plus): per
superstep each *changed* source pushes ``layer+1`` along its out-arcs,
messages pre-combine per (src-partition, dst) with
``np.maximum.reduceat``, and the receiving side folds them into the
current layer with one more reduceat.  On a DAG with longest path L
this converges in ≤ L+1 supersteps; layers only ever increase, so the
frontier (changed set) shrinks to the vertices still on a growing
longest path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.base import KernelRun, run_kernel
from igraph_ray.stages.partition import GraphMeta


@dataclass
class LongestPathKernel:
    """Max-plus propagation: layer(v) = max over in-neighbors u of
    layer(u) + 1, fixed point from layer ≡ 0."""

    num_parts: int

    def __post_init__(self) -> None:
        self.state_value_cols = {"layer": np.float64, "changed": np.int64}
        self.metric_cols = ("changed",)
        self.message_schema = pa.schema(
            [
                ("dst_part", pa.int32()),
                ("dst", pa.int64()),
                ("is_self", pa.int8()),
                ("layer", pa.float64()),
            ]
        )

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        n = len(csr.get("vids", np.empty(0, np.int64)))
        return {
            "layer": np.zeros(n, np.float64),
            # every vertex starts "changed" so round 1 fires all arcs;
            # true sources never receive and settle immediately
            "changed": np.ones(n, np.int64),
        }

    def scatter(self, csr, sb) -> pa.Table:
        changed = sb.aligned["changed"].astype(bool) & sb.present
        src_pos = csr.get("src_pos", np.empty(0, np.int64))
        m_part = np.empty(0, np.int32)
        m_dst = np.empty(0, np.int64)
        m_val = np.empty(0, np.float64)
        if len(src_pos):
            kept = np.flatnonzero(changed[src_pos])
            if len(kept):
                vals = sb.aligned["layer"][src_pos[kept]] + 1.0
                seg_id = (
                    np.searchsorted(csr["seg_start"], kept, side="right") - 1
                )
                boundary = np.empty(len(kept), dtype=bool)
                boundary[0] = True
                boundary[1:] = seg_id[1:] != seg_id[:-1]
                starts = np.flatnonzero(boundary)
                m_val = np.maximum.reduceat(vals, starts)
                segs = seg_id[starts]
                m_dst = csr["seg_dst"][segs]
                m_part = csr["seg_dst_part"][segs].astype(np.int32)

        n_self = len(sb.vids)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate(
                        [m_part, np.full(n_self, sb.part, np.int32)]
                    )
                ),
                "dst": pa.array(np.concatenate([m_dst, sb.vids])),
                "is_self": pa.array(
                    np.concatenate(
                        [
                            np.zeros(len(m_dst), np.int8),
                            np.ones(n_self, np.int8),
                        ]
                    )
                ),
                "layer": pa.array(
                    np.concatenate([m_val, sb.values["layer"]])
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        is_self = group.column("is_self").to_numpy(zero_copy_only=False)
        vals = group.column("layer").to_numpy(zero_copy_only=False)
        order = np.argsort(dst, kind="stable")
        dst, is_self, vals = dst[order], is_self[order], vals[order]

        boundary = np.empty(len(dst), dtype=bool)
        if len(dst):
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(boundary)
        vids = dst[seg]
        # self rows carry the pre-iteration layer, so the max already
        # folds old into new
        new = np.maximum.reduceat(vals, seg)
        self_rows = np.flatnonzero(is_self == 1)
        old = np.zeros(len(vids), np.float64)
        old[np.searchsorted(vids, dst[self_rows])] = vals[self_rows]
        changed = (new > old).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "layer": pa.array(new),
                "changed": pa.array(changed),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        return metrics["changed"] == 0.0


def topological_layers(
    graph: GraphMeta, max_iter: int | None = None
) -> ray.data.Dataset:
    """Rows ``(vid, layer)``; raises on a directed cycle (layers would
    grow past ``n_vertices``, the longest simple path bound — the same
    contract as ``igraph_topological_sorting`` / ``nx.topological_sort``
    on cyclic input)."""
    kernel = LongestPathKernel(num_parts=graph.num_parts)
    run: KernelRun = run_kernel(
        kernel, graph, max_iter=max_iter or graph.num_vertices + 2
    )
    if not run.converged:
        raise ValueError(
            "topological_layers: graph has a directed cycle "
            "(no fixed point within the longest-path bound)"
        )

    def finish(batch: pa.Table) -> pa.Table:
        layer = batch.column("layer").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": batch.column("vid"),
                "layer": pa.array(layer.astype(np.int64)),
            }
        )

    return run.state.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def condensation_arcs(
    arcs: ray.data.Dataset, scc_state: ray.data.Dataset
) -> ray.data.Dataset:
    """Arcs of the SCC condensation: map each (src, dst) vid arc to its
    (scc(src), scc(dst)) component arc, drop intra-component arcs and
    duplicates.  The result is a DAG by construction
    (``nx.condensation`` semantics), ready for ``topological_layers``.

    Shape: two co-partitioned hash joins (arc⋈scc on src, then on dst)
    plus one distinct groupby — all-to-all only on the arc table, no
    driver-side state."""
    import ray

    mem = scc_state.select_columns(["vid", "scc"])
    # CPU-capacity-capped join partitioning (the attach_vids fallback
    # rule — each join partition is one aggregator actor)
    join_parts = int(
        max(2, min(64, ray.cluster_resources().get("CPU", 4) // 2))
    )
    j1 = arcs.select_columns(["src", "dst"]).join(
        mem.rename_columns({"vid": "src", "scc": "cs"}),
        "inner",
        join_parts,
        on=("src",),
    )
    j2 = j1.join(
        mem.rename_columns({"vid": "dst", "scc": "cd"}),
        "inner",
        join_parts,
        on=("dst",),
    )

    def project(batch: pa.Table) -> pa.Table:
        cs = batch.column("cs").to_numpy(zero_copy_only=False)
        cd = batch.column("cd").to_numpy(zero_copy_only=False)
        keep = cs != cd
        return pa.table(
            {"src": pa.array(cs[keep]), "dst": pa.array(cd[keep])}
        )

    from ray.data.aggregate import Count

    return (
        j2.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"])
        .aggregate(Count("src", alias_name="_n"))
        .map_batches(
            lambda b: pa.table(
                {
                    "src": b.column("src"),
                    "dst": b.column("dst"),
                    "weight": pa.array(np.ones(b.num_rows, np.float64)),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
