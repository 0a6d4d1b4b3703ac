"""G1 — graph partitioner: per-partition CSR Arrow/numpy blocks.

BASELINE.json north_star: "Edges are groupby-partitioned into
per-partition CSR Arrow blocks, iterated via map_batches over zero-copy
Arrow with actor pools holding mutable per-vertex state".

Partitioning
------------
``part(v) = splitmix64(v) % P``.  Partition ``p`` *owns*

- the state of every vertex with ``part(vid) == p``;
- every out-edge whose ``src`` it owns (so out-degree normalization is
  a purely local computation — all out-edges of a vertex land in one
  partition).

Each partition's block is prepared for O(E_p) vectorized scatter:

- ``vids``        sorted int64 array of owned vertex ids
- ``out_weight``  per owned vid, total outgoing edge weight (dangling
                  detection: ``out_weight == 0``)
- ``src_pos``     per edge, index of src into ``vids``
- ``dst``/``dst_part``/``w``/``w_norm`` per edge, sorted by
  ``(dst_part, dst)``
- ``seg_start``/``seg_dst``/``seg_dst_part`` — segment boundaries of
  equal ``(dst_part, dst)`` runs, so per-iteration pre-combine is one
  ``np.add.reduceat`` (two-level combine: this caps a hub *receiver*'s
  message count at P rows per iteration — the receive half of skew
  handling; the send half is the splitmix hash spreading hot sources
  across partitions).

Blocks are written to ``graph_dir/csr/part_{p}/<array>.npy`` (atomic
tmp-dir + rename, idempotent under task retry) and loaded with
``np.load(mmap_mode='r')``: every worker process on a node maps the
same page-cache pages, so there is exactly ONE in-memory copy of the
CSR per node regardless of worker count, and a "cache miss" costs a
mmap call, not a 30MB deserialization.  On a multi-node cluster this
directory lives on shared storage; blocks never travel through a
per-iteration shuffle.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.utils import part_of


@dataclass
class GraphMeta:
    """Driver-side handle to a partitioned graph."""

    graph_dir: str
    num_parts: int
    num_vertices: int
    num_edges: int
    parts: list[int]  # partition ids that exist
    #: hub-vertex partition overrides (skew rebalancing): parallel
    #: lists [vids...], [parts...]; empty when no hot vertices found
    hot_vids: list[int] = None  # type: ignore[assignment]
    hot_parts: list[int] = None  # type: ignore[assignment]
    #: per-build identity token (fresh every ``partition_graph`` run,
    #: persisted in meta.json): worker-side CSR/adjacency caches key on
    #: it so rebuilding a graph into the SAME directory within a live
    #: Ray session cannot serve stale blocks from long-lived workers
    #: (ADVICE r3: walks._ADJ_CACHE staleness).  "" for pre-round-4
    #: graph dirs — those were never rebuilt in place.
    build_id: str = ""

    def __post_init__(self):
        self.hot_vids = self.hot_vids or []
        self.hot_parts = self.hot_parts or []

    @property
    def overrides(self) -> dict[int, int]:
        return dict(zip(self.hot_vids, self.hot_parts))

    @property
    def csr_dir(self) -> str:
        return os.path.join(self.graph_dir, "csr")

    def csr_path(self, part: int) -> str:
        return os.path.join(self.csr_dir, f"part_{part}")

    def save(self) -> None:
        with open(os.path.join(self.graph_dir, "meta.json"), "w") as f:
            json.dump(
                {
                    "num_parts": self.num_parts,
                    "num_vertices": self.num_vertices,
                    "num_edges": self.num_edges,
                    "parts": self.parts,
                    "hot_vids": self.hot_vids,
                    "hot_parts": self.hot_parts,
                    "build_id": self.build_id,
                },
                f,
            )

    @classmethod
    def load(cls, graph_dir: str) -> "GraphMeta":
        with open(os.path.join(graph_dir, "meta.json")) as f:
            d = json.load(f)
        return cls(graph_dir=graph_dir, **d)


def _part_with_overrides(
    vids: np.ndarray,
    num_parts: int,
    hot_vids: np.ndarray,
    hot_parts: np.ndarray,
) -> np.ndarray:
    """splitmix hash partition with explicit overrides for hub vids
    (``hot_vids`` must be sorted)."""
    p = part_of(vids, num_parts)
    if len(hot_vids):
        pos = np.searchsorted(hot_vids, vids)
        pos_c = np.clip(pos, 0, len(hot_vids) - 1)
        hit = hot_vids[pos_c] == vids
        p[hit] = hot_parts[pos_c[hit]]
    return p


def find_hot_sources(
    edges: ray.data.Dataset,
    num_parts: int,
    top_k_per_block: int = 64,
    hot_factor: float = 0.25,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Sample heavy-hitter sources (SURVEY.md §4 hub salting):
    per-block top sources by out-edge count → driver-side combine →
    vertices holding more than ``hot_factor × E/P`` edges are assigned
    to partitions greedily by load so hub clumping cannot overload one
    partition.  Returns (sorted hot vids, their parts, total edges)."""

    def block_tops(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        uv, counts = np.unique(src, return_counts=True)
        k = min(top_k_per_block, len(uv))
        if k == 0:
            return pa.table(
                {
                    "vid": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "total": pa.array([], pa.int64()),
                }
            )
        top = np.argpartition(-counts, k - 1)[:k]
        # sentinel row (vid=-1) carries the block's total edge count
        return pa.table(
            {
                "vid": pa.array(
                    np.concatenate(
                        [uv[top].astype(np.int64), [-1]]
                    )
                ),
                "n": pa.array(
                    np.concatenate(
                        [counts[top].astype(np.int64), [0]]
                    )
                ),
                "total": pa.array(
                    np.concatenate(
                        [np.zeros(k, np.int64), [len(src)]]
                    )
                ),
            }
        )

    tops = edges.map_batches(
        block_tops, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    if not tops:
        return np.empty(0, np.int64), np.empty(0, np.int32), 0
    counts: dict[int, int] = {}
    total_edges = 0
    for r in tops:
        if r["vid"] == -1:
            total_edges += int(r["total"])
        else:
            counts[r["vid"]] = counts.get(r["vid"], 0) + int(r["n"])
    threshold = max(1000, int(hot_factor * total_edges / max(1, num_parts)))
    hot = sorted(
        ((v, c) for v, c in counts.items() if c > threshold),
        key=lambda x: -x[1],
    )
    if not hot:
        return np.empty(0, np.int64), np.empty(0, np.int32), total_edges
    # greedy balance: heaviest hub to the lightest partition
    load = np.zeros(num_parts, dtype=np.int64)
    vids, parts = [], []
    for v, c in hot:
        p = int(np.argmin(load))
        load[p] += c
        vids.append(v)
        parts.append(p)
    order = np.argsort(vids)
    return (
        np.asarray(vids, np.int64)[order],
        np.asarray(parts, np.int32)[order],
        total_edges,
    )


def _atomic_save_arrays(path: str, **arrays: np.ndarray) -> None:
    """Write one .npy per array into a directory, atomically (tmp dir +
    rename) so task retries are idempotent."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = tempfile.mkdtemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        for name, arr in arrays.items():
            np.save(os.path.join(tmp, f"{name}.npy"), arr)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)


def load_csr(graph_meta: GraphMeta, part: int) -> dict[str, np.ndarray]:
    """Memory-map one partition's CSR block (empty dict if absent).

    ``mmap_mode='r'`` means all worker processes on a node share the
    same page-cache copy — loading is O(1), not O(bytes)."""
    path = graph_meta.csr_path(part)
    if not os.path.isdir(path):
        return {}
    out: dict[str, np.ndarray] = {}
    for fname in os.listdir(path):
        if fname.endswith(".npy"):
            out[fname[:-4]] = np.load(
                os.path.join(path, fname), mmap_mode="r"
            )
    return out


def _build_part_block(
    batch: pa.Table,
    num_parts: int,
    csr_dir: str,
    hot_vids: np.ndarray,
    hot_parts: np.ndarray,
) -> pa.Table:
    """map_groups fn: one group = one partition's vertex+edge rows.

    Input rows (union table): ``part, vid, src, dst, weight, is_edge``.
    Vertex rows carry (part, vid); edge rows carry (part, src, dst,
    weight).  Writes the npz block; returns a one-row meta table.
    """
    part = int(batch.column("part")[0].as_py())
    is_edge = batch.column("is_edge").to_numpy(zero_copy_only=False)
    vid_col = batch.column("vid").to_numpy(zero_copy_only=False)
    src_col = batch.column("src").to_numpy(zero_copy_only=False)
    dst_col = batch.column("dst").to_numpy(zero_copy_only=False)
    w_col = batch.column("weight").to_numpy(zero_copy_only=False)

    vids = np.unique(vid_col[~is_edge]).astype(np.int64)
    src = src_col[is_edge].astype(np.int64)
    dst = dst_col[is_edge].astype(np.int64)
    w = w_col[is_edge].astype(np.float64)

    # Map srcs to positions in the sorted owned-vid array.
    src_pos = np.searchsorted(vids, src)
    if len(src) and not np.array_equal(vids[src_pos], src):
        raise AssertionError(
            f"partition {part}: edge src not owned by partition"
        )

    # Collapse parallel (src, dst) arcs locally: weight = sum (the
    # reference's multigraph-collapse rule, pagerank_alg.py:228-229).
    # This lets callers symmetrize with a cheap map (emit both arcs)
    # instead of a global groupby — the partition shuffle does the
    # dedup for free.
    if len(src):
        order = np.lexsort((dst, src_pos))
        src_pos, dst, w = src_pos[order], dst[order], w[order]
        first = np.empty(len(dst), dtype=bool)
        first[0] = True
        first[1:] = (dst[1:] != dst[:-1]) | (src_pos[1:] != src_pos[:-1])
        starts = np.flatnonzero(first)
        src_pos = src_pos[starts]
        dst = dst[starts]
        w = np.add.reduceat(w, starts)

    # Local out-weight / out-degree (all out-edges of a src are local).
    out_weight = np.zeros(len(vids), dtype=np.float64)
    np.add.at(out_weight, src_pos, w)
    out_degree = np.zeros(len(vids), dtype=np.int64)
    np.add.at(out_degree, src_pos, 1)

    # Normalized weight for PageRank scatter (0 never divides: srcs by
    # definition have out_weight > 0).
    w_norm = np.zeros_like(w)
    if len(src):
        w_norm = w / out_weight[src_pos]

    # Sort edges by (dst_part, dst) and precompute combine segments.
    dst_part = _part_with_overrides(dst, num_parts, hot_vids, hot_parts)
    order = np.lexsort((dst, dst_part))
    src_pos, dst, w, w_norm, dst_part = (
        src_pos[order],
        dst[order],
        w[order],
        w_norm[order],
        dst_part[order],
    )
    if len(dst):
        new_seg = np.empty(len(dst), dtype=bool)
        new_seg[0] = True
        new_seg[1:] = (dst[1:] != dst[:-1]) | (dst_part[1:] != dst_part[:-1])
        seg_start = np.flatnonzero(new_seg)
        seg_dst = dst[seg_start]
        seg_dst_part = dst_part[seg_start]
    else:
        seg_start = np.empty(0, dtype=np.int64)
        seg_dst = np.empty(0, dtype=np.int64)
        seg_dst_part = np.empty(0, dtype=np.int32)

    _atomic_save_arrays(
        os.path.join(csr_dir, f"part_{part}"),
        vids=vids,
        out_weight=out_weight,
        out_degree=out_degree,
        src_pos=src_pos.astype(np.int64),
        dst=dst,
        w=w,
        w_norm=w_norm,
        dst_part=dst_part,
        seg_start=seg_start.astype(np.int64),
        seg_dst=seg_dst,
        seg_dst_part=seg_dst_part,
    )
    return pa.table(
        {
            "part": pa.array([part], pa.int32()),
            "n_vids": pa.array([len(vids)], pa.int64()),
            "n_edges": pa.array([len(dst)], pa.int64()),
        }
    )


def build_graph_partitions(
    edges: ray.data.Dataset,
    graph_dir: str,
    num_parts: int,
    vertices: ray.data.Dataset | None = None,
    balance_hot: bool = True,
    part_overrides: dict[int, int] | None = None,
) -> GraphMeta:
    """Partition an edge table into per-partition CSR blocks.

    ``edges`` must have columns ``src:int64, dst:int64, weight:float64``.
    ``vertices`` (optional, column ``vid``) supplies isolated / dangling
    vertices; endpoints of edges are always included.  One
    ``groupby(part)`` shuffle builds everything.

    ``balance_hot`` runs a cheap heavy-hitter sampling pass and pins
    hub sources to load-balanced partitions (SURVEY.md §4 skew
    handling); ``part_overrides`` forces a specific hub assignment
    (used to keep two builds — e.g. forward/reversed SCC graphs —
    vid-aligned).
    """
    os.makedirs(os.path.join(graph_dir, "csr"), exist_ok=True)

    if part_overrides is not None:
        items = sorted(part_overrides.items())
        hot_vids = np.array([v for v, _ in items], np.int64)
        hot_parts = np.array([p for _, p in items], np.int32)
    elif balance_hot:
        hot_vids, hot_parts, _ = find_hot_sources(edges, num_parts)
    else:
        hot_vids = np.empty(0, np.int64)
        hot_parts = np.empty(0, np.int32)

    def edge_and_endpoint_rows(batch: pa.Table) -> pa.Table:
        """One pass over an edge block: the edge rows plus vertex rows
        for both endpoints (deduplicated within the block)."""
        src = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(src)
        v = np.unique(np.concatenate([src, dst]))
        m = len(v)
        return pa.table(
            {
                "part": pa.array(
                    np.concatenate(
                        [
                            _part_with_overrides(src, num_parts, hot_vids, hot_parts),
                            _part_with_overrides(v, num_parts, hot_vids, hot_parts),
                        ]
                    ),
                    pa.int32(),
                ),
                "vid": pa.array(
                    np.concatenate([np.full(n, -1, dtype=np.int64), v])
                ),
                "src": pa.array(
                    np.concatenate([src, np.zeros(m, dtype=np.int64)])
                ),
                "dst": pa.array(
                    np.concatenate([dst, np.zeros(m, dtype=np.int64)])
                ),
                "weight": pa.array(
                    np.concatenate([w, np.zeros(m, dtype=np.float64)])
                ),
                "is_edge": pa.array(
                    np.concatenate(
                        [np.ones(n, dtype=bool), np.zeros(m, dtype=bool)]
                    )
                ),
            }
        )

    union = edges.map_batches(
        edge_and_endpoint_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    if vertices is not None:

        def vertex_rows(batch: pa.Table) -> pa.Table:
            v = np.unique(
                batch.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
            )
            m = len(v)
            z64 = np.zeros(m, dtype=np.int64)
            return pa.table(
                {
                    "part": pa.array(
                        _part_with_overrides(v, num_parts, hot_vids, hot_parts),
                        pa.int32(),
                    ),
                    "vid": pa.array(v),
                    "src": pa.array(z64),
                    "dst": pa.array(z64),
                    "weight": pa.array(np.zeros(m, dtype=np.float64)),
                    "is_edge": pa.array(np.zeros(m, dtype=bool)),
                }
            )

        union = union.union(
            vertices.map_batches(
                vertex_rows, batch_format="pyarrow", zero_copy_batch=True
            )
        )

    csr_dir = os.path.join(graph_dir, "csr")
    metas = union.groupby("part").map_groups(
        lambda b: _build_part_block(b, num_parts, csr_dir, hot_vids, hot_parts),
        batch_format="pyarrow",
    )
    rows = metas.take_all()
    meta = GraphMeta(
        graph_dir=graph_dir,
        num_parts=num_parts,
        num_vertices=int(sum(r["n_vids"] for r in rows)),
        num_edges=int(sum(r["n_edges"] for r in rows)),
        parts=sorted(int(r["part"]) for r in rows),
        hot_vids=[int(v) for v in hot_vids],
        hot_parts=[int(x) for x in hot_parts],
        build_id=uuid.uuid4().hex,
    )
    meta.save()
    return meta


def build_graph_disk(
    edges: ray.data.Dataset,
    graph_dir: str,
    num_parts: int,
    vertices: ray.data.Dataset | None = None,
    balance_hot: bool = True,
    part_overrides: dict[int, int] | None = None,
    resume: bool = True,
    keep_stage: bool = False,
) -> GraphMeta:
    """Disk-staged, per-partition-resumable variant of
    :func:`build_graph_partitions` for graphs whose in-flight shuffle
    copies would exceed the object store + spill budget (the
    billion-arc regime on one node; any size where the input is much
    larger than cluster memory).

    Two phases instead of one in-store ``groupby(part)`` all-to-all:

    1. ONE streaming pass maps every edge block to its union rows
       (edge rows routed by ``part(src)``, endpoint vertex rows by
       ``part(vid)``) and writes them straight to hive-partitioned
       Parquet (``stage/part=<p>/``) — peak object-store footprint is
       one block per core, never a full copy of the table.
    2. One Ray task per partition reads back ONLY its shard and runs
       the same ``_build_part_block`` CSR writer.  Completed
       partitions are detected by their on-disk block (the write is
       atomic) and skipped on ``resume=True`` — a killed build loses
       at most one partition of work.

    Output and GraphMeta are identical to the in-store build (same
    ``_build_part_block``), so every kernel runs unchanged.
    """
    import shutil

    import ray

    os.makedirs(os.path.join(graph_dir, "csr"), exist_ok=True)
    stage_dir = os.path.join(graph_dir, "stage")

    if part_overrides is not None:
        items = sorted(part_overrides.items())
        hot_vids = np.array([v for v, _ in items], np.int64)
        hot_parts = np.array([p for _, p in items], np.int32)
    elif balance_hot:
        hot_vids, hot_parts, _ = find_hot_sources(edges, num_parts)
    else:
        hot_vids = np.empty(0, np.int64)
        hot_parts = np.empty(0, np.int32)

    csr_dir = os.path.join(graph_dir, "csr")
    done_parts = set()
    if resume and os.path.isdir(csr_dir):
        for name in os.listdir(csr_dir):
            if name.startswith("part_") and not name.endswith(".tmp"):
                done_parts.add(int(name.split("_", 1)[1]))

    stage_done = os.path.join(stage_dir, "_STAGE_SUCCESS")
    if not (resume and os.path.exists(stage_done)):
        if os.path.isdir(stage_dir):
            shutil.rmtree(stage_dir)

        def union_rows(batch: pa.Table) -> pa.Table:
            src = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
            dst = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
            w = batch.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
            n = len(src)
            v = np.unique(np.concatenate([src, dst]))
            m = len(v)
            return pa.table(
                {
                    "part": pa.array(
                        np.concatenate(
                            [
                                _part_with_overrides(src, num_parts, hot_vids, hot_parts),
                                _part_with_overrides(v, num_parts, hot_vids, hot_parts),
                            ]
                        ),
                        pa.int32(),
                    ),
                    "vid": pa.array(np.concatenate([np.full(n, -1, np.int64), v])),
                    "src": pa.array(np.concatenate([src, np.zeros(m, np.int64)])),
                    "dst": pa.array(np.concatenate([dst, np.zeros(m, np.int64)])),
                    "weight": pa.array(np.concatenate([w, np.zeros(m, np.float64)])),
                    "is_edge": pa.array(
                        np.concatenate([np.ones(n, bool), np.zeros(m, bool)])
                    ),
                }
            )

        staged = edges.map_batches(
            union_rows, batch_format="pyarrow", zero_copy_batch=True
        )
        if vertices is not None:

            def vertex_rows(batch: pa.Table) -> pa.Table:
                v = np.unique(
                    batch.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
                )
                m = len(v)
                z64 = np.zeros(m, np.int64)
                return pa.table(
                    {
                        "part": pa.array(
                            _part_with_overrides(v, num_parts, hot_vids, hot_parts),
                            pa.int32(),
                        ),
                        "vid": pa.array(v),
                        "src": pa.array(z64),
                        "dst": pa.array(z64),
                        "weight": pa.array(np.zeros(m, np.float64)),
                        "is_edge": pa.array(np.zeros(m, bool)),
                    }
                )

            staged = staged.union(
                vertices.map_batches(
                    vertex_rows, batch_format="pyarrow", zero_copy_batch=True
                )
            )
        staged.write_parquet(stage_dir, partition_cols=["part"])
        with open(stage_done, "w") as f:
            f.write("ok\n")

    @ray.remote
    def build_one(part: int):
        import pyarrow.parquet as _pq

        shard = os.path.join(stage_dir, f"part={part}")
        tbl = _pq.read_table(shard)
        tbl = tbl.append_column(
            "part", pa.array(np.full(tbl.num_rows, part, np.int32))
        )
        meta_tbl = _build_part_block(tbl, num_parts, csr_dir, hot_vids, hot_parts)
        return (
            int(meta_tbl.column("part")[0].as_py()),
            int(meta_tbl.column("n_vids")[0].as_py()),
            int(meta_tbl.column("n_edges")[0].as_py()),
        )

    all_parts = sorted(
        int(name.split("=", 1)[1])
        for name in os.listdir(stage_dir)
        if name.startswith("part=")
    )
    pending = [p for p in all_parts if p not in done_parts]
    rows = ray.get([build_one.remote(p) for p in pending])

    # stats of skipped (already-built) partitions from the block files
    for p in sorted(done_parts & set(all_parts)):
        blk_dir = os.path.join(csr_dir, f"part_{p}")
        vids = np.load(os.path.join(blk_dir, "vids.npy"), mmap_mode="r")
        dst = np.load(os.path.join(blk_dir, "dst.npy"), mmap_mode="r")
        rows.append((p, int(vids.shape[0]), int(dst.shape[0])))

    meta = GraphMeta(
        graph_dir=graph_dir,
        num_parts=num_parts,
        num_vertices=int(sum(r[1] for r in rows)),
        num_edges=int(sum(r[2] for r in rows)),
        parts=sorted(r[0] for r in rows),
        hot_vids=[int(v) for v in hot_vids],
        hot_parts=[int(x) for x in hot_parts],
        build_id=uuid.uuid4().hex,
    )
    meta.save()
    if not keep_stage:
        shutil.rmtree(stage_dir, ignore_errors=True)
    return meta
