"""Weisfeiler–Lehman color refinement — the 1-WL isomorphism-test /
graph-fingerprint surface (igraph twin: the canonical-form machinery
behind ``igraph_isomorphic``; networkx twin:
``weisfeiler_lehman_graph_hash`` / ``weisfeiler_lehman_subgraph_hashes``).

Each round: ``color(v) ← mix(color(v), Σ_{u∈N(v)} h(color(u)))`` where
``h`` is splitmix64 and the neighbor multiset is combined by 64-bit
wrapping SUM — a commutative/associative multiset hash, so messages
pre-combine per (src-partition, dst) with one ``np.add.reduceat``
exactly like PageRank's contributions (weighted graphs fold the edge
weight in via ``h(color) * w`` with integer weights).  The refinement
stabilizes when the number of distinct colors stops growing; the
color PARTITION (who-equals-whom) then matches the sequential WL
partition exactly — the pytest oracle replays the identical algorithm
locally and also checks partition equivalence against networkx's WL
subtree classes.

The final graph fingerprint is the sorted-color-histogram hash — equal
for isomorphic graphs, (1-WL-)distinguishable otherwise.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from igraph_ray.kernels.base import KernelRun, run_kernel
from igraph_ray.stages.partition import GraphMeta
from igraph_ray.utils import hash_int64

MSG_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("nbr", pa.int64()),
        ("own", pa.int64()),
        ("marker", pa.int64()),
    ]
)

_MIX = np.uint64(0x9E3779B97F4A7C15)


@dataclass
class WLKernel:
    num_parts: int
    rounds: int
    #: initial colors: None → uniform color 1 (degree emerges in
    #: round 1); or a dict vid → label for attributed refinement
    init_colors: dict[int, int] | None = None

    state_value_cols: dict = field(
        default_factory=lambda: {"color": np.int64}
    )
    metric_cols: tuple = ()
    message_schema: pa.Schema = MSG_SCHEMA

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        vids = csr.get("vids", np.empty(0, np.int64))
        if self.init_colors is None:
            color = np.ones(len(vids), np.int64)
        else:
            color = np.array(
                [self.init_colors.get(int(v), 1) for v in vids], np.int64
            )
        return {"color": color}

    def scatter(self, csr, sb) -> pa.Table:
        color = sb.aligned["color"].astype(np.int64)
        if len(csr.get("src_pos", ())):
            # integer edge multiplicities fold into the multiset hash
            # as repeat counts (wrapping uint64 arithmetic throughout)
            w = np.asarray(csr["w"], np.float64).astype(np.uint64)
            h = hash_int64(color[csr["src_pos"]])
            with np.errstate(over="ignore"):
                vals = h * w
                # partial-batch contract (base.py scatter doc): arcs
                # whose source row is NOT in this batch must contribute
                # the additive neutral — hash_int64(0) is nonzero, so
                # zero-filled absent slots must be masked explicitly
                vals[~sb.present[csr["src_pos"]]] = np.uint64(0)
                comb = np.add.reduceat(vals, csr["seg_start"]).view(
                    np.int64
                )
            seg_dst = csr["seg_dst"]
            seg_dst_part = csr["seg_dst_part"]
        else:
            comb = np.empty(0, np.int64)
            seg_dst = np.empty(0, np.int64)
            seg_dst_part = np.empty(0, np.int32)
        n_msg = len(seg_dst)
        n_self = len(sb.vids)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate(
                        [seg_dst_part, np.full(n_self, sb.part, np.int32)]
                    ).astype(np.int32)
                ),
                "dst": pa.array(np.concatenate([seg_dst, sb.vids])),
                "nbr": pa.array(
                    np.concatenate([comb, np.zeros(n_self, np.int64)])
                ),
                "own": pa.array(
                    np.concatenate(
                        [np.zeros(n_msg, np.int64), sb.values["color"]]
                    )
                ),
                "marker": pa.array(
                    np.concatenate(
                        [np.zeros(n_msg, np.int64), np.ones(n_self, np.int64)]
                    )
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        nbr = group.column("nbr").to_numpy(zero_copy_only=False)
        own = group.column("own").to_numpy(zero_copy_only=False)
        order = np.argsort(dst, kind="stable")
        dst, nbr, own = dst[order], nbr[order], own[order]
        boundary = np.empty(len(dst), dtype=bool)
        if len(dst):
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(boundary)
        vids = dst[seg]
        with np.errstate(over="ignore"):
            msum = np.add.reduceat(
                nbr.view(np.uint64), seg
            )  # wrapping 64-bit multiset sum
            own_c = np.add.reduceat(own.view(np.uint64), seg)
            new = hash_int64(
                (hash_int64(own_c.view(np.int64)) + msum + _MIX).view(
                    np.int64
                )
            ).view(np.int64)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "color": pa.array(new),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        return iteration + 1 >= self.rounds


def wl_colors(
    graph: GraphMeta,
    rounds: int = 3,
    init_colors: dict[int, int] | None = None,
) -> KernelRun:
    """Run ``rounds`` WL refinements; state rows ``(vid, color)``.
    Two vertices share a color iff they share the full depth-``rounds``
    WL subtree signature (64-bit hashes — collisions astronomically
    unlikely at graph scale)."""
    if rounds <= 0:
        raise ValueError("rounds must be positive")
    kernel = WLKernel(
        num_parts=graph.num_parts, rounds=rounds, init_colors=init_colors
    )
    return run_kernel(kernel, graph, max_iter=rounds)


def wl_graph_hash(run: KernelRun) -> int:
    """Order-invariant 64-bit fingerprint of the final coloring: the
    wrapping sum of ``h(color)`` over vertices (a multiset hash, so it
    is identical for isomorphic graphs under any vid relabeling)."""
    total = np.uint64(0)
    for b in run.state.iter_batches(batch_format="pyarrow", batch_size=None):
        c = b.column("color").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            total += hash_int64(c).sum(dtype=np.uint64)
    return int(total)
