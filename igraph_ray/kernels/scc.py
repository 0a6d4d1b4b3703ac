"""Strongly connected components — igraph's
``igraph_connected_components(IGRAPH_STRONG)`` mode (SURVEY.md §0
upstream note; networkx oracle: ``strongly_connected_components``,
``NX/algorithms/components/strongly_connected.py``).

Distributed forward–backward min-label peeling:

Per round, over the *unassigned* subgraph:
1. ``fwd[v]`` = min vid that reaches v — min-label propagation along
   out-edges (K2 chassis, masked to unassigned vertices);
2. ``bwd[v]`` = min vid reachable from v — same propagation along the
   REVERSED edges (a second partitioned graph, built once);
3. every v with ``fwd[v] == bwd[v] == m`` satisfies m→v and v→m, so it
   belongs to SCC(m): assign ``scc[v] = m``;
4. repeat until no vertex is unassigned.

Each round assigns at least one whole SCC per weakly connected region,
so rounds ≤ the longest chain of SCCs in the condensation DAG (worst
case O(n) on a directed path — documented trade-off of label
propagation vs Tarjan, which is inherently sequential).

Labels are canonical min-vid, matching the K2 convention.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.base import run_kernel
from igraph_ray.stages.partition import GraphMeta

_INT64_MAX = np.iinfo(np.int64).max

MSG_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("val", pa.int64()),
        ("old", pa.int64()),
        ("scc", pa.int64()),
    ]
)


@dataclass
class MaskedMinKernel:
    """Min-label propagation over the unassigned (scc == -1) subgraph.

    Like the K2 kernel, but assigned vertices neither send nor update —
    they are logically removed — and the ``scc`` column rides along in
    the state so the driver never joins it back."""

    num_parts: int
    state_value_cols: dict = field(
        default_factory=lambda: {
            "comp": np.int64,
            "changed": np.int64,
            "scc": np.int64,
        }
    )
    metric_cols: tuple = ("changed",)
    message_schema: pa.Schema = MSG_SCHEMA

    def init_state(self, csr, part: int):
        vids = csr.get("vids", np.empty(0, np.int64))
        return {
            "comp": vids.copy(),
            "changed": np.ones(len(vids), dtype=np.int64),
            "scc": np.full(len(vids), -1, dtype=np.int64),
        }

    def scatter(self, csr, sb) -> pa.Table:
        comp = sb.aligned["comp"]
        scc = np.where(sb.present, sb.aligned["scc"], 0)
        active = (
            sb.aligned["changed"].astype(bool) & sb.present & (scc == -1)
        )

        if len(csr.get("src_pos", ())):
            vals = np.where(
                active[csr["src_pos"]], comp[csr["src_pos"]], _INT64_MAX
            )
            seg_min = np.minimum.reduceat(vals, csr["seg_start"])
            live = seg_min < _INT64_MAX
            m_part = csr["seg_dst_part"][live]
            m_dst = csr["seg_dst"][live]
            m_val = seg_min[live]
        else:
            m_part = np.empty(0, np.int32)
            m_dst = np.empty(0, np.int64)
            m_val = np.empty(0, np.int64)

        n_self = len(sb.vids)
        n_msg = len(m_dst)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate([m_part, np.full(n_self, sb.part, np.int32)])
                ),
                "dst": pa.array(np.concatenate([m_dst, sb.vids])),
                "val": pa.array(
                    np.concatenate([m_val, sb.values["comp"]])
                ),
                "old": pa.array(
                    np.concatenate(
                        [np.full(n_msg, _INT64_MAX, np.int64), sb.values["comp"]]
                    )
                ),
                "scc": pa.array(
                    np.concatenate(
                        [np.full(n_msg, -2, np.int64), sb.values["scc"]]
                    )
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        val = group.column("val").to_numpy(zero_copy_only=False)
        old = group.column("old").to_numpy(zero_copy_only=False)
        scc = group.column("scc").to_numpy(zero_copy_only=False)

        order = np.argsort(dst, kind="stable")
        dst, val, old, scc = dst[order], val[order], old[order], scc[order]
        if len(dst) == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "vid": pa.array([], pa.int64()),
                    "comp": pa.array([], pa.int64()),
                    "changed": pa.array([], pa.int64()),
                    "scc": pa.array([], pa.int64()),
                }
            )
        boundary = np.empty(len(dst), dtype=bool)
        boundary[0] = True
        boundary[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(boundary)
        vids = dst[seg]
        new = np.minimum.reduceat(val, seg)
        old_min = np.minimum.reduceat(old, seg)
        scc_out = np.maximum.reduceat(scc, seg)  # self row's scc (>= -1)

        # assigned vertices never update
        frozen = scc_out != -1
        new = np.where(frozen, old_min, new)
        changed = ((new < old_min) & ~frozen).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "comp": pa.array(new),
                "changed": pa.array(changed),
                "scc": pa.array(scc_out),
            }
        )

    def converged(self, metrics, iteration) -> bool:
        return metrics["changed"] == 0.0


def _reset_round(state: ray.data.Dataset, comp_from: str) -> ray.data.Dataset:
    """Re-init comp=vid / changed=1 for unassigned vertices, carrying
    scc; optionally keep a previous phase's result as column
    ``comp_from``."""

    def _f(batch: pa.Table) -> pa.Table:
        vid = batch.column("vid").to_numpy(zero_copy_only=False)
        scc = batch.column("scc").to_numpy(zero_copy_only=False)
        out = {
            "part": batch.column("part"),
            "vid": batch.column("vid"),
            "comp": pa.array(vid.copy()),
            "changed": pa.array(np.ones(len(vid), np.int64)),
            "scc": batch.column("scc"),
        }
        if comp_from in batch.schema.names:
            out[comp_from] = batch.column(comp_from)
        return pa.table(out)

    return state.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def strongly_connected_components(
    graph_fwd: GraphMeta,
    graph_bwd: GraphMeta,
    max_rounds: int = 64,
    max_iter_per_phase: int = 10_000,
) -> ray.data.Dataset:
    """SCC over a directed graph given forward and reversed partitioned
    builds; returns state rows ``(part, vid, scc)`` with scc = min vid
    of the strongly connected component."""
    kernel = MaskedMinKernel(num_parts=graph_fwd.num_parts)

    scc_state: ray.data.Dataset | None = None
    for _ in range(max_rounds):
        # phase 1: forward min-label over unassigned subgraph
        fwd = run_kernel(
            kernel,
            graph_fwd,
            max_iter=max_iter_per_phase,
            initial_state=(
                _reset_round(scc_state, "") if scc_state is not None else None
            ),
        ).state

        # rename comp -> fwd, re-init comp for the backward phase
        def keep_fwd(batch: pa.Table) -> pa.Table:
            vid = batch.column("vid").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "part": batch.column("part"),
                    "vid": batch.column("vid"),
                    "comp": pa.array(vid.copy()),
                    "changed": pa.array(np.ones(len(vid), np.int64)),
                    "scc": batch.column("scc"),
                    "fwd": batch.column("comp"),
                }
            )

        bwd_init = fwd.map_batches(
            keep_fwd, batch_format="pyarrow", zero_copy_batch=True
        )

        # phase 2: backward min-label (reversed graph).  The fwd column
        # is not part of the kernel's state schema, so park it and
        # re-attach by vid afterwards via a part-wise merge.
        fwd_cols = bwd_init.select_columns(["part", "vid", "fwd"]).materialize()
        bwd = run_kernel(
            kernel,
            graph_bwd,
            max_iter=max_iter_per_phase,
            initial_state=bwd_init.select_columns(
                ["part", "vid", "comp", "changed", "scc"]
            ),
        ).state

        # merge fwd + bwd per partition and assign scc where equal
        def tag(ds, tagval):
            def _t(batch: pa.Table) -> pa.Table:
                cols = {c: batch.column(c) for c in batch.schema.names}
                cols["tag"] = pa.array(
                    np.full(batch.num_rows, tagval, np.int8)
                )
                return pa.table(cols)

            return ds.map_batches(_t, batch_format="pyarrow", zero_copy_batch=True)

        def assign(group: pa.Table) -> pa.Table:
            tagv = group.column("tag").to_numpy(zero_copy_only=False)
            vid = group.column("vid").to_numpy(zero_copy_only=False)
            is_b = tagv == 1
            b_vid = vid[is_b]
            b_ord = np.argsort(b_vid)
            bwd_comp = group.column("comp").to_numpy(zero_copy_only=False)[
                is_b
            ][b_ord]
            scc = group.column("scc").to_numpy(zero_copy_only=False)[is_b][b_ord]
            f_vid = vid[~is_b]
            f_ord = np.argsort(f_vid)
            fwd_val = group.column("fwd").to_numpy(zero_copy_only=False)[
                ~is_b
            ][f_ord]
            assert np.array_equal(b_vid[b_ord], f_vid[f_ord])
            newly = (scc == -1) & (fwd_val == bwd_comp)
            scc_new = np.where(newly, fwd_val, scc)
            part = int(group.column("part")[0].as_py())
            return pa.table(
                {
                    "part": pa.array(
                        np.full(len(scc_new), part, np.int32)
                    ),
                    "vid": pa.array(b_vid[b_ord]),
                    "scc": pa.array(scc_new),
                    "unassigned": pa.array(
                        (scc_new == -1).astype(np.int64)
                    ),
                }
            )

        bwd_tagged = tag(
            bwd.select_columns(["part", "vid", "comp", "scc"]), 1
        )

        def pad_fwd(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "part": batch.column("part"),
                    "vid": batch.column("vid"),
                    "comp": pa.array(
                        np.zeros(batch.num_rows, np.int64)
                    ),
                    "scc": pa.array(
                        np.full(batch.num_rows, -1, np.int64)
                    ),
                    "fwd": batch.column("fwd"),
                    "tag": pa.array(np.zeros(batch.num_rows, np.int8)),
                }
            )

        def pad_bwd(batch: pa.Table) -> pa.Table:
            cols = {c: batch.column(c) for c in batch.schema.names}
            cols["fwd"] = pa.array(np.zeros(batch.num_rows, np.int64))
            return pa.table(
                {
                    k: cols[k]
                    for k in ["part", "vid", "comp", "scc", "fwd", "tag"]
                }
            )

        merged = (
            fwd_cols.map_batches(
                pad_fwd, batch_format="pyarrow", zero_copy_batch=True
            )
            .union(
                bwd_tagged.map_batches(
                    pad_bwd, batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .groupby("part")
            .map_groups(assign, batch_format="pyarrow")
            .materialize()
        )
        remaining = merged.sum("unassigned") or 0
        scc_state = merged.select_columns(["part", "vid", "scc"])
        if remaining == 0:
            break
    else:
        # rounds scale with the condensation-DAG chain length (O(n)
        # worst case on a directed path) — returning partially-assigned
        # labels (scc = -1) would be silently wrong
        raise RuntimeError(
            f"SCC did not assign all vertices within {max_rounds} "
            f"rounds ({int(remaining)} unassigned); raise max_rounds "
            "for long condensation chains"
        )
    return scc_state


def scc(
    edges: ray.data.Dataset,
    graph_dir: str,
    num_parts: int | None = None,
    vertices: ray.data.Dataset | None = None,
    max_rounds: int = 64,
) -> ray.data.Dataset:
    """Convenience wrapper: build forward + reversed partitioned graphs
    under ``graph_dir`` and run SCC; returns ``(part, vid, scc)``."""
    from igraph_ray.api import build_graph

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

    rev = edges.map_batches(reverse, batch_format="pyarrow", zero_copy_batch=True)
    # identical vid→part assignment as the forward build (the per-part
    # fwd/bwd merge requires vid-aligned state blocks)
    bwd = build_graph(
        rev,
        os.path.join(graph_dir, "bwd"),
        num_parts=fwd.num_parts,
        vertices=vertices,
        part_overrides=fwd.overrides,
    )
    return strongly_connected_components(fwd, bwd, max_rounds=max_rounds)