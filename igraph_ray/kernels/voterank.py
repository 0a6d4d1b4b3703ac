"""VoteRank — influential-spreader selection by iterative voting.

Semantics match ``networkx.voterank`` (networkx 3.6.1,
``algorithms/centrality/voterank_alg.py``; undirected form): every
vertex starts with voting ability 1; each selection round every vertex
scores the sum of its neighbors' abilities, the highest-scoring
unselected vertex is chosen (ties broken by smallest vid — nx breaks
ties by node iteration order, so exact-parity tests use tie-free
fixtures), its ability drops to 0 and each of its neighbors' abilities
drops by 1/⟨degree⟩ (floored at 0).  Selection stops early when the
best remaining score is 0.

Distribution: one selection = two chassis passes driven by the same
kernel object with a driver-toggled ``phase``:

* ``weaken`` — only the partition owning the last-selected vertex
  emits messages (delta to each neighbor); apply folds the ability
  decrement (and zeroes the selected vertex's own ability).
* ``vote`` — the usual scatter of abilities along arcs; apply sums
  incoming votes and zeroes already-selected vertices' scores.

The driver then finds the global argmax from per-block partial maxima
(P tiny rows, no full collect).  State chains between passes via
``run_kernel(..., max_iter=1, initial_state=...)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.kernels.base import run_kernel
from igraph_ray.stages.partition import GraphMeta

MSG_SCHEMA = pa.schema(
    [
        ("dst_part", pa.int32()),
        ("dst", pa.int64()),
        ("vote", pa.float64()),
        ("weaken", pa.float64()),
        ("own", pa.float64()),
    ]
)


@dataclass
class VoteRankKernel:
    num_parts: int
    delta: float  # ability decrement per weaken (see voterank())
    init_ability: float = 1.0  # starting ability (arcs in exact mode)
    phase: str = "vote"  # driver-toggled: "vote" | "weaken"
    last_selected: int = -1
    excluded: tuple = ()  # vids selected so far

    state_value_cols: dict = field(
        default_factory=lambda: {
            "ability": np.float64,
            "score": np.float64,
        }
    )
    metric_cols: tuple = ()
    message_schema: pa.Schema = MSG_SCHEMA

    def init_state(self, csr, part: int) -> dict[str, np.ndarray]:
        vids = csr.get("vids", np.empty(0, np.int64))
        return {
            "ability": np.full(len(vids), self.init_ability, np.float64),
            "score": np.zeros(len(vids)),
        }

    def scatter(self, csr, sb) -> pa.Table:
        n_self = len(sb.vids)
        self_part = np.full(n_self, sb.part, np.int32)
        zeros_self = np.zeros(n_self)
        if self.phase == "vote":
            ability = sb.aligned["ability"]
            if len(csr.get("src_pos", ())):
                vals = ability[csr["src_pos"]]
                vote = np.add.reduceat(vals, csr["seg_start"])
                seg_dst = csr["seg_dst"]
                seg_dst_part = csr["seg_dst_part"]
            else:
                vote = np.empty(0, np.float64)
                seg_dst = np.empty(0, np.int64)
                seg_dst_part = np.empty(0, np.int32)
            n_msg = len(vote)
            return pa.table(
                {
                    "dst_part": pa.array(
                        np.concatenate([seg_dst_part, self_part]).astype(
                            np.int32
                        )
                    ),
                    "dst": pa.array(np.concatenate([seg_dst, sb.vids])),
                    "vote": pa.array(np.concatenate([vote, zeros_self])),
                    "weaken": pa.array(np.zeros(n_msg + n_self)),
                    "own": pa.array(
                        np.concatenate([np.zeros(n_msg), sb.values["ability"]])
                    ),
                }
            )
        # weaken phase: only the selected vertex's arcs carry messages
        src_pos = csr.get("src_pos", np.empty(0, np.int64))
        sel_local = np.searchsorted(csr["vids"], self.last_selected)
        has_sel = (
            len(csr["vids"]) > 0
            and sel_local < len(csr["vids"])
            and csr["vids"][sel_local] == self.last_selected
            # partial-batch contract: if this partition's state rows
            # split across blocks, exactly ONE slice (the one holding
            # the selected vid's row) may emit the weaken arcs — else
            # neighbor abilities would be decremented once per slice
            and bool(sb.present[sel_local])
        )
        if has_sel and len(src_pos):
            # per-arc filter (pre-combine segments group arcs by dst
            # across MANY sources, so segment-level filtering would be
            # wrong); parallel arcs were collapsed at build, so each
            # (selected, dst) appears once
            m = src_pos == sel_local
            seg_dst = csr["dst"][m]
            seg_dst_part = csr["dst_part"][m]
        else:
            seg_dst = np.empty(0, np.int64)
            seg_dst_part = np.empty(0, np.int32)
        n_msg = len(seg_dst)
        return pa.table(
            {
                "dst_part": pa.array(
                    np.concatenate([seg_dst_part, self_part]).astype(np.int32)
                ),
                "dst": pa.array(np.concatenate([seg_dst, sb.vids])),
                "vote": pa.array(np.zeros(n_msg + n_self)),
                "weaken": pa.array(
                    np.concatenate([np.full(n_msg, self.delta), zeros_self])
                ),
                "own": pa.array(
                    np.concatenate([np.zeros(n_msg), sb.values["ability"]])
                ),
            }
        )

    def apply(self, group: pa.Table, part: int) -> pa.Table:
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        vote = group.column("vote").to_numpy(zero_copy_only=False)
        weaken = group.column("weaken").to_numpy(zero_copy_only=False)
        own = group.column("own").to_numpy(zero_copy_only=False)
        order = np.lexsort((own, weaken, vote, dst))
        dst, vote, weaken, own = (
            dst[order],
            vote[order],
            weaken[order],
            own[order],
        )
        boundary = np.empty(len(dst), dtype=bool)
        if len(dst):
            boundary[0] = True
            boundary[1:] = dst[1:] != dst[:-1]
        seg = np.flatnonzero(boundary)
        vids = dst[seg]
        votes = np.add.reduceat(vote, seg)
        weakens = np.add.reduceat(weaken, seg)
        ability = np.add.reduceat(own, seg)  # one self row per vid

        excluded = np.isin(vids, np.asarray(self.excluded, np.int64))
        if self.phase == "vote":
            score = np.where(excluded, 0.0, votes)
            new_ability = ability
        else:
            new_ability = np.maximum(ability - weakens, 0.0)
            new_ability[vids == self.last_selected] = 0.0
            score = np.zeros(len(vids))
        return pa.table(
            {
                "part": pa.array(np.full(len(vids), part, np.int32)),
                "vid": pa.array(vids),
                "ability": pa.array(new_ability),
                "score": pa.array(score),
            }
        )

    def converged(self, metrics: dict[str, float], iteration: int) -> bool:
        return False  # the driver selection loop owns termination


def _global_argmax(state: ray.data.Dataset) -> tuple[int, float]:
    """(vid, score) of the max score, ties to the smallest vid, via
    per-block partial maxima (P tiny rows on the driver)."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("vid").to_numpy(zero_copy_only=False)
        s = batch.column("score").to_numpy(zero_copy_only=False)
        if len(v) == 0:
            return pa.table(
                {"vid": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        best = np.lexsort((v, -s))[0]
        return pa.table(
            {
                "vid": pa.array([int(v[best])]),
                "score": pa.array([float(s[best])]),
            }
        )

    rows = state.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    if not rows:
        return -1, 0.0
    best = min(rows, key=lambda r: (-r["score"], r["vid"]))
    return int(best["vid"]), float(best["score"])


def voterank(
    graph: GraphMeta,
    num_vertices: int,
    number_of_nodes: int | None = None,
    avg_degree: float | None = None,
) -> list[int]:
    """The selected spreaders in selection order (nx.voterank twin).

    Default mode runs EXACT integer-numerator arithmetic: abilities
    and scores are scaled by the symmetrized arc count (ability starts
    at ``arcs``, one weaken subtracts ``num_vertices`` — i.e. the
    rational 1/⟨degree⟩ = V/arcs with the common denominator cleared),
    so every vote sum is an exact integer in float64 (< 2^53 up to
    ~10^9-arc graphs) and the argmax is ORDER-INDEPENDENT — no IEEE
    summation-order wobble, which both removes a layout sensitivity
    nx itself has and makes the selection SQL-replayable bitwise
    (the driver's voterank oracle).  The ordering is identical to the
    float formulation computed exactly.  Passing ``avg_degree``
    explicitly restores the legacy float decrement path."""
    if number_of_nodes is None:
        number_of_nodes = num_vertices
    if avg_degree is None:
        # exact mode: numerators over the common denominator `arcs`
        # (arcs = symmetrized arc count = sum of undirected degrees)
        delta = float(num_vertices)
        init_ability = float(max(1, graph.num_edges))
    else:
        delta = 1.0 / avg_degree if avg_degree > 0 else 0.0
        init_ability = 1.0

    kernel = VoteRankKernel(
        num_parts=graph.num_parts, delta=delta, init_ability=init_ability
    )
    state = None
    influential: list[int] = []
    for _ in range(min(number_of_nodes, num_vertices)):
        if influential:
            kernel.phase = "weaken"
            kernel.last_selected = influential[-1]
            state = run_kernel(
                kernel, graph, max_iter=1, initial_state=state
            ).state
        kernel.phase = "vote"
        kernel.excluded = tuple(influential)
        state = run_kernel(
            kernel, graph, max_iter=1, initial_state=state
        ).state
        vid, score = _global_argmax(state)
        if score <= 0:
            break
        influential.append(vid)
    return influential
