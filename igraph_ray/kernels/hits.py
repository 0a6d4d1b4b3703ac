"""HITS hubs & authorities — alternating power iteration on a
doubled-vertex graph.

Covers igraph's ``igraph_hub_score`` / ``igraph_authority_score``
(networkx twin ``nx.hits``): authorities = dominant eigenvector of
``AᵀA``, hubs = of ``AAᵀ``, via the alternating iteration
``a ← Aᵀh; h ← Aa`` with per-step normalization; both returned
sum-normalized (``nx.hits(normalized=True)``).

Distributed encoding: the chassis pushes messages along stored arcs
only, but the h-update needs a *pull* of authority values along
out-edges.  Instead of a second reversed CSR, each original vertex v
gets two slots in ONE graph — an authority copy ``v`` and a hub copy
``v + offset`` — and each original arc u→v becomes two stored arcs::

    hub(u)  → auth(v)   (active on even supersteps:  a ← Aᵀh)
    auth(v) → hub(u)    (active on odd supersteps:   h ← A a)

Scatter masks arcs by the destination's half and the superstep parity,
so one chassis superstep performs exactly one half of a HITS iteration
(2 supersteps = 1 HITS iteration — the minimum number of shuffles the
data dependency allows).  Both halves share the partitioner, the CSR
cache and the message shuffle.

Normalization uses the same driver-feedback pattern as
``kernels/eigenvector.py``: state is unnormalized, the driver turns
the ``sumsq`` metric into a per-half L2 norm and re-pickles it into
the kernel, and scatter divides lazily.  Convergence is checked on the
hub half (``Σ|h_t − h_{t-1}| < n·tol`` over normalized iterates, one
round delayed), mirroring nx.hits' hub-residual check.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.base import run_kernel
from igraph_ray.kernels.pagerank import PowerIterationFailedConvergence
from igraph_ray.stages.partition import GraphMeta

MSG_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("contrib", pa.float64()),
        ("old", pa.float64()),
        ("prev", pa.float64()),
    ]
)


@dataclass
class HITSKernel:
    num_vertices: int  # original n (offset of the hub copies)
    num_parts: int
    tol: float = 1.0e-8
    iteration: int = 0  # set by the chassis every superstep
    norm_auth: float = 1.0
    norm_hub: float = 1.0
    #: integer-exact mode (hits_fixed_integer): h0 = 1, norms pinned
    #: at 1 so every intermediate is an integer-valued float64
    integer_mode: bool = False

    state_value_cols: dict = field(
        default_factory=lambda: {
            "x": np.float64,
            "xn_prev": np.float64,
            "sumsq": np.float64,
            "resid": np.float64,
        }
    )
    metric_cols: tuple = ("sumsq", "resid")
    message_schema: pa.Schema = MSG_SCHEMA

    def _norm_for(self, vids: np.ndarray) -> np.ndarray:
        return np.where(
            vids < self.num_vertices, self.norm_auth, self.norm_hub
        )

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        vids = csr.get("vids", np.empty(0, np.int64))
        # h0 uniform on hub copies; a0 = 0 (first superstep fills it)
        h0 = 1.0 if self.integer_mode else 1.0 / max(1, self.num_vertices)
        x0 = np.where(vids >= self.num_vertices, h0, 0.0)
        return {
            "x": x0,
            "xn_prev": np.zeros(len(vids)),
            "sumsq": np.zeros(len(vids)),
            "resid": np.zeros(len(vids)),
        }

    def scatter(self, csr, sb) -> pa.Table:
        vids_all = csr["vids"]
        xn = sb.aligned["x"] / self._norm_for(vids_all)

        even = self.iteration % 2 == 0
        src_pos = csr.get("src_pos", np.empty(0, np.int64))
        contrib = np.empty(0, np.float64)
        seg_dst = np.empty(0, np.int64)
        seg_dst_part = np.empty(0, np.int32)
        if len(src_pos):
            vals = xn[src_pos] * np.asarray(csr["w"], np.float64)
            all_contrib = np.add.reduceat(vals, csr["seg_start"])
            # a segment's arcs share one destination; activate only the
            # half being updated this superstep
            dst_is_auth = csr["seg_dst"] < self.num_vertices
            active = dst_is_auth if even else ~dst_is_auth
            contrib = all_contrib[active]
            seg_dst = csr["seg_dst"][active]
            seg_dst_part = csr["seg_dst_part"][active].astype(np.int32)

        n_self = len(sb.vids)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate(
                        [seg_dst_part, np.full(n_self, sb.part, np.int32)]
                    ).astype(np.int32)
                ),
                "dst": pa.array(np.concatenate([seg_dst, sb.vids])),
                "contrib": pa.array(
                    np.concatenate([contrib, np.zeros(n_self)])
                ),
                "old": pa.array(
                    np.concatenate(
                        [
                            np.zeros(len(contrib)),
                            sb.values["x"] / self._norm_for(sb.vids),
                        ]
                    )
                ),
                "prev": pa.array(
                    np.concatenate(
                        [np.zeros(len(contrib)), sb.values["xn_prev"]]
                    )
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        contrib = group.column("contrib").to_numpy(zero_copy_only=False)
        old = group.column("old").to_numpy(zero_copy_only=False)
        prev = group.column("prev").to_numpy(zero_copy_only=False)

        order = np.lexsort((prev, old, contrib, dst))
        dst, contrib, old, prev = (
            dst[order],
            contrib[order],
            old[order],
            prev[order],
        )
        boundary = np.empty(len(dst), dtype=bool)
        if len(dst):
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(boundary)
        vids = dst[seg]
        in_sum = np.add.reduceat(contrib, seg)
        old_x = np.add.reduceat(old, seg)  # normalized current value
        prev_x = np.add.reduceat(prev, seg)

        even = self.iteration % 2 == 0
        is_auth = vids < self.num_vertices
        active = is_auth if even else ~is_auth
        # active half: replaced by the (unnormalized) message sum;
        # inactive half: carries its normalized value forward — the
        # driver resets that half's norm to 1 (see converged)
        new = np.where(active, in_sum, old_x)
        resid = np.where(active & ~is_auth, np.abs(old_x - prev_x), 0.0)
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "x": pa.array(new),
                "xn_prev": pa.array(np.where(active, old_x, prev_x)),
                "sumsq": pa.array(np.where(active, new * new, 0.0)),
                "resid": pa.array(resid),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        if self.integer_mode:
            return False  # fixed supersteps, norms pinned at 1
        # the inactive half was rewritten as x/norm in apply → its norm
        # is now 1; the active half's fresh norm comes from sumsq
        norm_new = float(np.sqrt(metrics["sumsq"])) or 1.0
        if iteration % 2 == 0:
            self.norm_auth, self.norm_hub = norm_new, 1.0
        else:
            self.norm_hub, self.norm_auth = norm_new, 1.0
        if iteration % 2 == 0 or iteration < 3:
            return False
        return metrics["resid"] < self.num_vertices * self.tol


def doubled_hits_edges(arcs: ray.data.Dataset, offset: int) -> ray.data.Dataset:
    """hub(u)→auth(v) and auth(v)→hub(u) arcs for every arc u→v."""

    def double(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        if "weight" in batch.column_names:
            w = batch.column("weight").to_numpy(zero_copy_only=False)
        else:
            w = np.ones(len(src), np.float64)
        return pa.table(
            {
                "src": pa.array(
                    np.concatenate([src + offset, dst]).astype(np.int64)
                ),
                "dst": pa.array(
                    np.concatenate([dst, src + offset]).astype(np.int64)
                ),
                "weight": pa.array(
                    np.concatenate([w, w]).astype(np.float64)
                ),
            }
        )

    return arcs.map_batches(
        double, batch_format="pyarrow", zero_copy_batch=True
    )


def hits(
    arcs: ray.data.Dataset,
    graph_dir: str,
    num_vertices: int,
    tol: float = 1.0e-8,
    max_iter: int = 100,
    num_parts: int | None = None,
) -> ray.data.Dataset:
    """Rows ``(vid, authority, hub)`` over a directed arc table with
    dense vids in [0, num_vertices); both columns sum-normalized
    (``nx.hits(normalized=True)`` convention).

    ``max_iter`` counts HITS iterations (2 chassis supersteps each).
    """
    from igraph_ray.api import build_graph

    doubled = doubled_hits_edges(arcs, num_vertices)
    vertices = ray.data.range(2 * num_vertices).map_batches(
        lambda b: pa.table({"vid": b.column("id")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    graph = build_graph(
        doubled, graph_dir, num_parts=num_parts, vertices=vertices
    )
    kernel = HITSKernel(
        num_vertices=num_vertices, num_parts=graph.num_parts, tol=tol
    )
    run = run_kernel(kernel, graph, max_iter=2 * max_iter)
    if not run.converged:
        raise PowerIterationFailedConvergence(
            f"hits failed to converge in {max_iter} iterations"
        )

    # fold the two halves back: per-half sum normalization
    state = run.state

    def tag(batch: pa.Table) -> pa.Table:
        vid = batch.column("vid").to_numpy(zero_copy_only=False)
        x = batch.column("x").to_numpy(zero_copy_only=False)
        is_hub = vid >= num_vertices
        return pa.table(
            {
                "vid": pa.array(np.where(is_hub, vid - num_vertices, vid)),
                "authority": pa.array(np.where(is_hub, 0.0, x)),
                "hub": pa.array(np.where(is_hub, x, 0.0)),
            }
        )

    from ray.data.aggregate import Sum

    tagged = state.map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = tagged.groupby("vid").aggregate(
        Sum("authority", alias_name="authority"),
        Sum("hub", alias_name="hub"),
    ).materialize()
    totals = merged.aggregate(
        Sum("authority", alias_name="a"), Sum("hub", alias_name="h")
    )
    sa = float(totals["a"] or 0.0) or 1.0
    sh = float(totals["h"] or 0.0) or 1.0

    def normalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "authority": pa.array(
                    batch.column("authority").to_numpy(zero_copy_only=False)
                    / sa
                ),
                "hub": pa.array(
                    batch.column("hub").to_numpy(zero_copy_only=False) / sh
                ),
            }
        )

    return merged.map_batches(
        normalize, batch_format="pyarrow", zero_copy_batch=True
    )


def hits_fixed_integer(
    arcs: ray.data.Dataset,
    graph_dir: str,
    num_vertices: int,
    cap_bits: int = 49,
    max_pow_iters: int = 40,
    num_parts: int | None = None,
) -> pa.Table:
    """(vid, authority, hub) — INTEGER-EXACT fixed alternating power
    iteration (the SQL-twin surface, same recipe as
    ``eigenvector_fixed_integer``): h0 = 1, norms pinned at 1 for S
    supersteps, then ONE exact per-half sum normalization on the
    driver.  With integer arc multiplicities every message sum is an
    exact integer-valued float64 (< 2^53), so the run is
    order-independent and bitwise SQL-replayable.

    ``S = max(2, largest even s ≤ max_pow_iters with W^s ≤ 2^cap_bits)``
    where ``W = max(max weighted in-degree, max weighted out-degree)``
    (exact integers both sides compute); even S ends on a hub update
    so both halves are fresh.  Bounded final gather — replay-scale
    surface; use ``hits()`` at scale."""
    from ray.data.aggregate import Count

    from igraph_ray.api import build_graph

    # W from the raw arc rows (weight-1 multiplicities: COUNT per
    # endpoint == summed collapsed weights)
    win = max(
        (r["count()"] for r in arcs.groupby("dst").count().take_all()),
        default=0,
    )
    wout = max(
        (r["count()"] for r in arcs.groupby("src").count().take_all()),
        default=0,
    )
    W = max(int(win), int(wout))
    cap = 1 << cap_bits
    S = 2
    while S + 2 <= max_pow_iters and W >= 1 and W ** (S + 2) <= cap:
        S += 2

    doubled = doubled_hits_edges(arcs, num_vertices)
    vertices = ray.data.range(2 * num_vertices).map_batches(
        lambda b: pa.table({"vid": b.column("id")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    graph = build_graph(
        doubled, graph_dir, num_parts=num_parts, vertices=vertices
    )
    kernel = HITSKernel(
        num_vertices=num_vertices,
        num_parts=graph.num_parts,
        tol=0.0,
        integer_mode=True,
    )
    run = run_kernel(kernel, graph, max_iter=S)

    tbl = pa.concat_tables(
        run.state.select_columns(["vid", "x"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    vid = tbl.column("vid").to_numpy(zero_copy_only=False)
    x = tbl.column("x").to_numpy(zero_copy_only=False)
    is_hub = vid >= num_vertices
    a = x[~is_hub]
    a_vid = vid[~is_hub]
    h = x[is_hub]
    h_vid = vid[is_hub] - num_vertices
    # exact integer sums, one deterministic int→double rounding each
    sa = float(sum(int(v) for v in a)) or 1.0
    sh = float(sum(int(v) for v in h)) or 1.0
    auth = dict(zip(a_vid.tolist(), (a / sa).tolist()))
    hub = dict(zip(h_vid.tolist(), (h / sh).tolist()))
    vids = sorted(set(auth) | set(hub))
    return pa.table(
        {
            "vid": pa.array(vids, pa.int64()),
            "authority": pa.array([auth.get(v, 0.0) for v in vids]),
            "hub": pa.array([hub.get(v, 0.0) for v in vids]),
        }
    )
