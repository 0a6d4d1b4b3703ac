"""Deterministic random walks — DeepWalk/node2vec-style corpus
generation (igraph ``igraph_random_walk`` surface, fleet-deterministic
variant).

Each walker advances one hop per superstep; the "random" neighbour
choice is ``splitmix64(walk_id ⊕ step ⊕ seed) mod degree`` over the
dst-ascending adjacency list, so the corpus is bitwise reproducible
across cluster sizes, retries and resumes (the same property the T2
hash sampler provides for row sampling — seeded per-block RNGs would
not survive re-blocking).

Distribution shape: walkers are rows ``(part, walk_id, cur, p0..pL)``
hash-partitioned by their CURRENT vertex; one superstep = one
``groupby(part).map_groups`` that advances every walker in a partition
vectorized (searchsorted into the partition's src-sorted adjacency
view, one gather for the choices).  The adjacency view is derived from
the mmap'd CSR block once per worker process and cached (same pattern
as the kernel chassis' CSR cache).  Per-superstep traffic is one row
per LIVE walker — walks that hit a dangling vertex retire in place.
Walk length L costs L shuffles of the walker table, independent of
graph size; the walk matrix is L+1 int64 columns (fixed width, no
ragged lists in flight).
"""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.partition import (
    GraphMeta,
    _part_with_overrides,
    load_csr,
)
from igraph_ray.utils import hash_int64

_ADJ_CACHE: "collections.OrderedDict[tuple[str, int], tuple]" = (
    collections.OrderedDict()
)
_ADJ_CACHE_MAX = 1024


def _adjacency(graph: GraphMeta, part: int):
    """(vids, indptr, nbr) — src-sorted, dst-ascending adjacency view
    of one CSR block; built once per worker and cached."""
    key = (graph.graph_dir, part)
    hit = _ADJ_CACHE.get(key)
    if hit is not None:
        _ADJ_CACHE.move_to_end(key)
        return hit
    csr = load_csr(graph, part)
    vids = csr.get("vids", np.empty(0, np.int64))
    src_pos = np.asarray(csr.get("src_pos", np.empty(0, np.int64)))
    dst = np.asarray(csr.get("dst", np.empty(0, np.int64)))
    order = np.lexsort((dst, src_pos))
    src_sorted = src_pos[order]
    nbr = dst[order]
    indptr = np.searchsorted(src_sorted, np.arange(len(vids) + 1))
    out = (vids, indptr, nbr)
    _ADJ_CACHE[key] = out
    while len(_ADJ_CACHE) > _ADJ_CACHE_MAX:
        _ADJ_CACHE.popitem(last=False)
    return out


def walk_choice(
    walk_id: np.ndarray, step: int, seed: int, degree: np.ndarray
) -> np.ndarray:
    """The deterministic neighbour index: splitmix64 over
    (walk_id, step, seed), reduced mod degree (degree > 0)."""
    with np.errstate(over="ignore"):
        step_mix = np.uint64(
            (step * 0xBF58476D1CE4E5B9) % (1 << 64)
        )  # decorrelate id vs step
        mixed = hash_int64(
            walk_id.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ step_mix
            ^ np.uint64(seed)
        )
    return (mixed % degree.astype(np.uint64)).astype(np.int64)


def random_walks(
    graph: GraphMeta,
    starts: np.ndarray | list[int],
    length: int,
    seed: int = 0,
) -> ray.data.Dataset:
    """Rows ``(walk_id, p0..p{length})`` — one walk per start vertex
    (walk_id = index into ``starts``); steps after a dangling vertex
    are -1 (the walk retires there, igraph stuck="return" semantics).
    """
    starts = np.asarray(starts, np.int64)
    hot_v = np.asarray(graph.hot_vids, np.int64)
    hot_p = np.asarray(graph.hot_parts, np.int64)

    def init_part(v: np.ndarray) -> np.ndarray:
        return _part_with_overrides(v, graph.num_parts, hot_v, hot_p)

    cols: dict[str, pa.Array] = {
        "part": pa.array(init_part(starts).astype(np.int32)),
        "walk_id": pa.array(np.arange(len(starts), dtype=np.int64)),
        "cur": pa.array(starts),
        "p0": pa.array(starts),
    }
    for i in range(1, length + 1):
        cols[f"p{i}"] = pa.array(np.full(len(starts), -1, np.int64))
    walkers = ray.data.from_arrow(pa.table(cols)).repartition(
        num_blocks=max(1, graph.num_parts)
    )

    for step in range(1, length + 1):

        def advance(group: pa.Table, _step=step) -> pa.Table:
            part = int(group.column("part")[0].as_py())
            vids, indptr, nbr = _adjacency(graph, part)
            cur = group.column("cur").to_numpy(zero_copy_only=False)
            wid = group.column("walk_id").to_numpy(zero_copy_only=False)
            nxt = np.full(len(cur), -1, np.int64)
            live = cur >= 0
            if live.any() and len(vids):
                pos = np.searchsorted(vids, cur[live])
                pos_c = np.clip(pos, 0, max(0, len(vids) - 1))
                owned = vids[pos_c] == cur[live]
                deg = indptr[pos_c + 1] - indptr[pos_c]
                ok = owned & (deg > 0)
                choice = np.zeros(len(pos_c), np.int64)
                if ok.any():
                    choice[ok] = walk_choice(
                        wid[live][ok], _step, seed, deg[ok]
                    )
                    picked = nbr[indptr[pos_c[ok]] + choice[ok]]
                    tmp = np.full(len(pos_c), -1, np.int64)
                    tmp[ok] = picked
                    nxt[live] = tmp
            out = {}
            for name in group.column_names:
                if name == "part":
                    moved = nxt >= 0
                    newpart = np.where(
                        moved,
                        init_part(np.where(moved, nxt, 0)),
                        group.column("part").to_numpy(
                            zero_copy_only=False
                        ),
                    ).astype(np.int32)
                    out["part"] = pa.array(newpart)
                elif name == "cur":
                    out["cur"] = pa.array(nxt)
                elif name == f"p{_step}":
                    out[name] = pa.array(nxt)
                else:
                    out[name] = group.column(name)
            return pa.table(out)

        walkers = (
            walkers.groupby("part")
            .map_groups(advance, batch_format="pyarrow")
            .materialize()
        )

    keep = ["walk_id"] + [f"p{i}" for i in range(length + 1)]
    return walkers.select_columns(keep)
