"""Feedback arc set — igraph ``igraph_feedback_arc_set`` (method
"eades") semantics: a small set of arcs whose removal makes the
digraph acyclic, via the Eades–Lin–Smyth greedy-removal vertex
ordering (Eades, Lin, Smyth 1993, "A fast and effective heuristic for
the feedback arc set problem"; guarantee |FAS| <= m/2 - n/6 on simple
digraphs without 2-cycles).

Distribution boundary, documented: the ELS sequence is inherently
sequential (each step depends on the degrees left by all previous
removals), so the ORDERING runs on the driver over a gathered
``(src, dst)`` arc list under an explicit bound — the same documented
bounded-gather trade as the Dinic max-flow and dominator-tree kernels.
Everything around it stays distributed: the arc gather is a column
projection, and the back-arc extraction broadcasts the final position
array once (``ray.put``) and filters arcs inside ``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

MAX_FAS_EDGES = 50_000_000


def _eades_order(
    src: np.ndarray, dst: np.ndarray, vids: np.ndarray
) -> np.ndarray:
    """ELS greedy removal sequence; returns vids in left-to-right
    order.  Self-loops are ignored (they are unavoidable feedback arcs
    and do not constrain the ordering).

    BATCH-SYNCHRONOUS variant of Eades-Lin-Smyth: each round removes
    ALL current sinks (to the right, ascending index), else ALL
    current sources (to the left, ascending index), else the single
    max-(outdeg-indeg) vertex (smallest index on ties, to the left).
    Equally valid ELS semantics (greedy sink/source exhaustion +
    max-delta fallback) with a round structure the driver's DuckDB
    twin replays exactly — the prior stack-LIFO discipline was not
    SQL-replayable."""
    n = len(vids)
    pos_of = {int(v): i for i, v in enumerate(vids)}
    s = np.fromiter((pos_of[int(v)] for v in src), np.int64, len(src))
    t = np.fromiter((pos_of[int(v)] for v in dst), np.int64, len(dst))
    keep = s != t
    s, t = s[keep], t[keep]

    alive = np.ones(n, dtype=bool)
    left: list[int] = []
    right: list[int] = []
    removed = 0
    while removed < n:
        live_s = alive[s] & alive[t]
        outdeg = np.bincount(s[live_s], minlength=n)
        indeg = np.bincount(t[live_s], minlength=n)
        sinks = np.flatnonzero(alive & (outdeg == 0))
        if len(sinks):
            right.extend(int(v) for v in sinks)  # ascending index
            alive[sinks] = False
            removed += len(sinks)
            continue
        sources = np.flatnonzero(alive & (indeg == 0) & (outdeg > 0))
        if len(sources):
            left.extend(int(v) for v in sources)
            alive[sources] = False
            removed += len(sources)
            continue
        delta = np.where(alive, outdeg - indeg, np.int64(-(2**62)))
        v = int(np.argmax(delta))  # np.argmax ties -> smallest index
        left.append(v)
        alive[v] = False
        removed += 1
    seq = left + right[::-1]
    return vids[np.asarray(seq, np.int64)]


def feedback_arc_set(
    arcs: ray.data.Dataset,
    max_edges: int = MAX_FAS_EDGES,
) -> tuple[pa.Table, ray.data.Dataset]:
    """(order, fas) — ``order`` is the ELS vertex sequence as rows
    ``(vid, pos)``; ``fas`` is the Dataset of arcs ``(src, dst)`` that
    point backwards in it (removing them leaves a DAG by
    construction).  ``arcs``: directed edge table with src/dst
    columns; self-loops always belong to the FAS."""
    n_arcs = arcs.count()
    if n_arcs > max_edges:
        raise NotImplementedError(
            f"feedback_arc_set gathers the arc list on the driver "
            f"(inherently sequential ELS ordering); {n_arcs} arcs "
            f"exceeds the documented bound {max_edges}"
        )
    tbl = pa.concat_tables(
        arcs.select_columns(["src", "dst"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    src = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    vids = np.unique(np.concatenate([src, dst]))
    seq = _eades_order(src, dst, vids)
    pos = np.empty(len(vids), np.int64)
    pos[np.searchsorted(vids, seq)] = np.arange(len(seq))
    order = pa.table({"vid": pa.array(vids), "pos": pa.array(pos)})

    vref = ray.put(vids)
    pref = ray.put(pos)

    def back_arcs(batch: pa.Table) -> pa.Table:
        v = ray.get(vref)
        p = ray.get(pref)
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        ps = p[np.searchsorted(v, s)]
        pd = p[np.searchsorted(v, d)]
        keep = ps >= pd  # back arcs + self-loops
        return batch.filter(pa.array(keep))

    fas = arcs.select_columns(["src", "dst"]).map_batches(
        back_arcs, batch_format="pyarrow", zero_copy_batch=True
    )
    return order, fas
