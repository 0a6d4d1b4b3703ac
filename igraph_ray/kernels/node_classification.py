"""Semi-supervised node classification — harmonic function label
propagation (Zhu, Ghahramani & Lafferty 2003, "Semi-supervised
learning using Gaussian fields and harmonic functions", ICML; the
``networkx.algorithms.node_classification.harmonic_function``
surface, replayed without scipy):

- per-class score matrix ``F`` starts at 0;
- each iteration ``F ← D⁻¹ A F`` (row-normalized adjacency, weighted),
  then labeled seeds are clamped back to their one-hot rows;
- after exactly ``max_iter`` iterations (nx default 30; no convergence
  test in the reference), each vertex takes ``argmax_c F[v, c]`` with
  nx's first-max tie-break = the smallest class index under the sorted
  class order used here.

Distribution: one chassis superstep per iteration.  ``scatter`` emits
per-arc ``w·f_c[u]`` contributions pre-combined per destination (k
fixed-width float lanes, like the multi-pivot BFS kernel) plus one
self row per present vertex carrying its weighted degree (the
destination-side normalizer, known only at the vertex's own
partition).  ``apply`` reduces in deterministic lexsort order,
divides by the degree (0 → 1, as in the reference) and clamps seeds.
Partial-batch safe: zero-fill of absent source rows is neutral for
the contribution sums, and self rows are emitted only for present
vids.  Seeds are a driver-side broadcast (labeled sets are a small
fraction of V by the problem's nature); the class count ``k`` is
bounded (≤ 64) because state is k float64 lanes per vertex.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.base import run_kernel
from igraph_ray.stages.partition import GraphMeta

MAX_CLASSES = 64


@dataclass
class HarmonicFunctionKernel:
    num_parts: int
    seed_vids: np.ndarray  # sorted int64
    seed_cls: np.ndarray  # class index per seed vid
    k: int
    max_iter: int = 30

    state_value_cols: dict = field(default_factory=dict)
    metric_cols: tuple = ()
    message_schema: pa.Schema | None = None

    def __post_init__(self) -> None:
        self.state_value_cols = {f"f{c}": np.float64 for c in range(self.k)}
        self.message_schema = pa.schema(
            [("dst_part", pa.int32()), ("dst", pa.int64()),
             ("deg", pa.float64())]
            + [(f"f{c}", pa.float64()) for c in range(self.k)]
        )

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        n = len(csr.get("vids", np.empty(0, np.int64)))
        return {f"f{c}": np.zeros(n) for c in range(self.k)}

    def scatter(self, csr, sb) -> pa.Table:
        vids = csr["vids"]
        has_arcs = len(csr.get("src_pos", ()))
        if has_arcs:
            w = np.asarray(csr["w"], np.float64)
            src_pos = csr["src_pos"]
            seg_start = csr["seg_start"]
            seg_dst = csr["seg_dst"]
            seg_dst_part = csr["seg_dst_part"]
            contribs = [
                np.add.reduceat(
                    sb.aligned[f"f{c}"][src_pos] * w, seg_start
                )
                for c in range(self.k)
            ]
            deg_all = np.bincount(src_pos, weights=w, minlength=len(vids))
        else:
            seg_dst = np.empty(0, np.int64)
            seg_dst_part = np.empty(0, np.int32)
            contribs = [np.empty(0, np.float64) for _ in range(self.k)]
            deg_all = np.zeros(len(vids))

        # self rows (present vids only): carry the destination-side
        # degree normalizer; contribution lanes are zero (sum-neutral)
        pos = np.searchsorted(vids, sb.vids)
        n_self = len(sb.vids)
        n_arc = len(seg_dst)
        cols = {
            "dst_part": pa.array(
                np.concatenate(
                    [seg_dst_part, np.full(n_self, sb.part, np.int32)]
                ).astype(np.int32)
            ),
            "dst": pa.array(np.concatenate([seg_dst, sb.vids])),
            "deg": pa.array(
                np.concatenate([np.zeros(n_arc), deg_all[pos]])
            ),
        }
        for c in range(self.k):
            cols[f"f{c}"] = pa.array(
                np.concatenate([contribs[c], np.zeros(n_self)])
            )
        return pa.table(cols)

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        deg = group.column("deg").to_numpy(zero_copy_only=False)
        lanes = [
            group.column(f"f{c}").to_numpy(zero_copy_only=False)
            for c in range(self.k)
        ]
        # deterministic float reduction order (bitwise resume parity)
        order = np.lexsort(tuple(reversed(lanes)) + (deg, dst))
        dst, deg = dst[order], deg[order]
        lanes = [x[order] for x in lanes]
        boundary = np.empty(len(dst), dtype=bool)
        if len(dst):
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(boundary)
        vids = dst[seg]
        deg_v = np.add.reduceat(deg, seg) if len(seg) else np.empty(0)
        deg_v = np.where(deg_v == 0.0, 1.0, deg_v)  # nx: 0-degree → 1
        new = [
            (np.add.reduceat(x, seg) if len(seg) else np.empty(0)) / deg_v
            for x in lanes
        ]

        # clamp seeds to their one-hot rows
        idx = np.searchsorted(self.seed_vids, vids)
        idx_c = np.minimum(idx, max(len(self.seed_vids) - 1, 0))
        is_seed = (
            (self.seed_vids[idx_c] == vids)
            if len(self.seed_vids)
            else np.zeros(len(vids), bool)
        )
        cls = self.seed_cls[idx_c]
        for c in range(self.k):
            new[c][is_seed] = (cls[is_seed] == c).astype(np.float64)

        cols = {
            "part": pa.array(np.full(len(vids), part, np.int32)),
            "vid": pa.array(vids),
        }
        for c in range(self.k):
            cols[f"f{c}"] = pa.array(new[c])
        return pa.table(cols)

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        return False  # fixed iteration count, as in the reference


def harmonic_function_labels(
    graph: GraphMeta,
    seed_vids,
    seed_labels,
    max_iter: int = 30,
) -> ray.data.Dataset:
    """Rows ``(vid, label)`` — harmonic-function semi-supervised
    classification over the (symmetrized, optionally weighted) graph.
    ``seed_labels`` may be any dtype; classes are its sorted uniques
    and ties argmax to the smallest class in that order (= nx
    first-max).  Unreachable vertices score all-zero and take the
    smallest class, matching the dense reference replay."""
    seed_vids = np.asarray(seed_vids, np.int64)
    seed_labels = np.asarray(seed_labels)
    if len(seed_vids) == 0:
        raise ValueError("harmonic_function_labels: no labeled seeds")
    classes, cls_idx = np.unique(seed_labels, return_inverse=True)
    if len(classes) > MAX_CLASSES:
        raise ValueError(
            f"{len(classes)} classes exceed the {MAX_CLASSES}-lane bound"
        )
    order = np.argsort(seed_vids, kind="stable")
    seed_vids, cls_idx = seed_vids[order], cls_idx[order]
    if len(np.unique(seed_vids)) != len(seed_vids):
        raise ValueError("duplicate seed vids")

    kernel = HarmonicFunctionKernel(
        num_parts=graph.num_parts,
        seed_vids=seed_vids,
        seed_cls=cls_idx.astype(np.int64),
        k=len(classes),
        max_iter=max_iter,
    )
    run = run_kernel(kernel, graph, max_iter=max_iter)
    classes_pa = pa.array(classes)

    def project(batch: pa.Table) -> pa.Table:
        lanes = np.stack(
            [
                batch.column(f"f{c}").to_numpy(zero_copy_only=False)
                for c in range(len(classes))
            ],
            axis=1,
        )
        lab = np.argmax(lanes, axis=1)
        return pa.table(
            {
                "vid": batch.column("vid"),
                "label": classes_pa.take(pa.array(lab, pa.int64())),
            }
        )

    return run.state.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
