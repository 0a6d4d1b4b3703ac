"""Independent-cascade influence spread (deterministic live-edge form).

Kempe–Kleinberg–Tardos, *Maximizing the Spread of Influence through a
Social Network* (KDD 2003), §4.1: an independent-cascade process with
per-arc activation probability p is distributionally equivalent to
reachability from the seed set in the "live-edge" subgraph where each
arc is kept by one independent coin — each arc is tried at most once,
so flipping all coins up front changes nothing.  We make the coin
stateless and deterministic: arc (u, v) stays live iff

    splitmix64(u * 2^20 + v) % 1000 < p_milli

so the spread is a pure function of (arcs, seeds, p_milli) —
reproducible across any cluster shape / partitioning, resumable, and
replayable bit-for-bit in SQL (the driver twin re-derives the same
splitmix64 stream in HUGEINT).

The spread itself is a multi-source BFS over the live arcs on the
existing SSSP chassis (`shortest_paths`); the BFS level IS the
activation round (seeds activate at round 0, a vertex activates in the
first round a live in-arc reaches it).  One filter map + one CSR build
+ O(diameter) chassis supersteps — no per-simulation RNG state, no
driver-side graph.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.utils import hash_int64

#: vid fuse shift for the per-arc coin (supports vids < 2^20 on the
#: replayed-SQL path; the pure-library path works at any scale because
#: the fuse only needs to be injective per (src, dst) pair — callers
#: with larger graphs pass a wider ``fuse_bits``).
FUSE_BITS = 20


def live_arcs(
    edges: ray.data.Dataset,
    p_milli: int,
    fuse_bits: int = FUSE_BITS,
    src: str = "src",
    dst: str = "dst",
) -> ray.data.Dataset:
    """Filter an int64-vid arc table down to the live-edge subgraph:
    keep (u, v) iff splitmix64((u << fuse_bits) | v) % 1000 < p_milli."""

    def keep(batch: pa.Table) -> pa.Table:
        s = batch.column(src).to_numpy(zero_copy_only=False)
        d = batch.column(dst).to_numpy(zero_copy_only=False)
        # the fuse is only injective per (src, dst) while dst fits in
        # fuse_bits and src in the remaining 63 bits — guard loudly
        # (mirrors node2vec's membership-fuse bound; ADVICE r3)
        if len(d) and (
            int(d.max()) >= (1 << fuse_bits)
            or int(s.max()) >= (1 << (63 - fuse_bits))
        ):
            raise ValueError(
                f"live_arcs: vid exceeds fuse range (dst < 2^{fuse_bits}, "
                f"src < 2^{63 - fuse_bits}); pass a wider fuse_bits"
            )
        fused = (s << fuse_bits) | d
        z = hash_int64(fused) % np.uint64(1000)
        return batch.filter(pa.array(z < np.uint64(p_milli)))

    return edges.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def independent_cascade(
    edges: ray.data.Dataset,
    graph_dir: str,
    seeds,
    p_milli: int,
    vertices: ray.data.Dataset | None = None,
    fuse_bits: int = FUSE_BITS,
):
    """Deterministic IC spread over a DIRECTED vid arc table.

    Returns a pyarrow-backed Dataset-producing run state reduced to
    ``(vid, round)`` for activated vertices only (seeds at round 0).
    """
    from igraph_ray.api import build_graph
    from igraph_ray.kernels.sssp import shortest_paths

    kept = live_arcs(edges, p_milli, fuse_bits=fuse_bits)
    graph = build_graph(kept, graph_dir, vertices=vertices, symmetrize=False)
    run = shortest_paths(graph, np.asarray(seeds, np.int64), weighted=False)

    def finite(batch: pa.Table) -> pa.Table:
        d = batch.column("dist").to_numpy(zero_copy_only=False)
        m = np.isfinite(d)
        return pa.table(
            {
                "vid": pa.array(
                    batch.column("vid").to_numpy(zero_copy_only=False)[m]
                ),
                "round": pa.array(d[m].astype(np.int64)),
            }
        )

    return run.state.select_columns(["vid", "dist"]).map_batches(
        finite, batch_format="pyarrow", zero_copy_batch=True
    )
