"""Force-directed graph layout — igraph ``layout_fruchterman_reingold``
semantics (Fruchterman & Reingold 1991, "Graph Drawing by
Force-directed Placement"): attraction d²/k along edges, repulsion
k²/d between all vertex pairs, displacement capped by a cooling
temperature.

Distributed shape per iteration (driver-phased loop, like VoteRank):

1. positions are a Dataset ``(part, vid, x, y)`` aligned with the
   partitioned CSR; the iteration maps over CSR partitions (worker-
   global cache — the chassis' stateful-stage realization);
2. repulsion is grid-approximated: a ``g×g`` occupancy summary
   (cell count + centroid — O(g²) rows) is aggregated and broadcast;
   each vertex sees exact pairwise repulsion from its OWN cell's
   members (shipped via the same broadcast, bounded) and
   centroid-lumped repulsion from every other cell — the classic
   Barnes-Hut-style far-field approximation;
3. attraction uses the partition's own CSR arcs against the broadcast
   position table.

The position broadcast bounds this kernel to
``BROADCAST_MAX_VERTICES`` vertices (registered raise beyond) —
layouts are a visualization surface, inherently bounded by what can
be drawn; the documented scale path for bigger graphs is laying out
the quotient graph of a community partition.

Deterministic: splitmix64 initial positions, no RNG anywhere else.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.kernels.base import _cached_csr
from igraph_ray.stages.partition import GraphMeta
from igraph_ray.stages.vertex_ids import BROADCAST_MAX_VERTICES
from igraph_ray.utils import hash_int64


def _init_positions(vids: np.ndarray) -> np.ndarray:
    h1 = hash_int64(vids).astype(np.float64) / 2.0**64
    h2 = hash_int64(vids + np.int64(0x9E3779B9)).astype(np.float64) / 2.0**64
    return np.stack([h1, h2], axis=1)


def fruchterman_reingold(
    graph: GraphMeta,
    iterations: int = 50,
    grid: int = 16,
    broadcast_max_vertices: int = BROADCAST_MAX_VERTICES,
) -> ray.data.Dataset:
    """Rows ``(vid, x, y)`` — final layout in the unit square."""
    # gather the vid universe once from the CSR blocks (bounded)
    parts_ds = ray.data.from_arrow(
        pa.table({"part": pa.array(graph.parts, pa.int32())})
    ).repartition(num_blocks=max(1, len(graph.parts)))

    def vid_rows(batch: pa.Table) -> pa.Table:
        out = []
        for part in batch.column("part").to_pylist():
            csr = _cached_csr(graph, int(part))
            vids = csr.get("vids", np.empty(0, np.int64))
            out.append(
                pa.table(
                    {
                        "part": pa.array(
                            np.full(len(vids), part, np.int32)
                        ),
                        "vid": pa.array(vids.astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(out)

    vid_tbl = pa.concat_tables(
        parts_ds.map_batches(
            vid_rows, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("vid")
    all_vids = vid_tbl.column("vid").to_numpy(zero_copy_only=False)
    n = len(all_vids)
    if n > broadcast_max_vertices:
        raise NotImplementedError(
            f"fruchterman_reingold broadcasts the position table; "
            f"{n} vertices exceeds {broadcast_max_vertices} — lay out "
            f"the community quotient graph instead"
        )
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "vid": pa.array([], pa.int64()),
                    "x": pa.array([], pa.float64()),
                    "y": pa.array([], pa.float64()),
                }
            )
        )
    pos = _init_positions(all_vids)
    k = np.sqrt(1.0 / n)  # ideal edge length in the unit square

    for it in range(iterations):
        temp = 0.1 * (1.0 - it / iterations) + 1e-4
        pref = ray.put((all_vids, pos))

        def step(batch: pa.Table, _pref=pref, _temp=temp) -> pa.Table:
            vids_sorted, p = ray.get(_pref)
            outs = []
            for part in batch.column("part").to_pylist():
                csr = _cached_csr(graph, int(part))
                vids = csr.get("vids", np.empty(0, np.int64))
                if len(vids) == 0:
                    continue
                my = np.searchsorted(vids_sorted, vids)
                mp = p[my]  # (m, 2) positions of owned vertices
                disp = np.zeros_like(mp)
                # --- repulsion: grid summary over ALL vertices ---
                cells = np.minimum(
                    (p * grid).astype(np.int64), grid - 1
                )
                cell_id = cells[:, 0] * grid + cells[:, 1]
                order = np.argsort(cell_id, kind="stable")
                cid_s = cell_id[order]
                first = np.empty(len(cid_s), dtype=bool)
                first[0] = True
                first[1:] = cid_s[1:] != cid_s[:-1]
                starts = np.flatnonzero(first)
                counts = np.diff(np.append(starts, len(cid_s)))
                cents = (
                    np.add.reduceat(p[order], starts, axis=0)
                    / counts[:, None]
                )
                ucells = cid_s[starts]
                my_cell = cell_id[my]
                # far-field: centroid-lumped repulsion from every cell
                for ci, cnt, cen in zip(ucells, counts, cents):
                    d = mp - cen[None, :]
                    same = my_cell == ci
                    dist2 = (d * d).sum(axis=1) + 1e-9
                    f = (k * k) / dist2
                    contrib = d * (f * cnt)[:, None]
                    # own cell handled exactly below
                    contrib[same] = 0.0
                    disp += contrib
                    if same.any():
                        members = p[order[
                            np.searchsorted(cid_s, ci, side="left"):
                            np.searchsorted(cid_s, ci, side="right")
                        ]]
                        mine = mp[same]
                        dd = mine[:, None, :] - members[None, :, :]
                        dist2l = (dd * dd).sum(axis=2) + 1e-9
                        fl = (k * k) / dist2l
                        disp[same] += (dd * fl[:, :, None]).sum(axis=1)
                # --- attraction along this partition's arcs ---
                src_pos = csr.get("src_pos", np.empty(0, np.int64))
                if len(src_pos):
                    seg_start = csr["seg_start"]
                    seg_id = (
                        np.searchsorted(
                            seg_start, np.arange(len(src_pos)), "right"
                        )
                        - 1
                    )
                    dst = csr["seg_dst"][seg_id]
                    dpos = p[np.searchsorted(vids_sorted, dst)]
                    spos = mp[src_pos]
                    d = spos - dpos
                    dist = np.sqrt((d * d).sum(axis=1)) + 1e-9
                    f = dist / k  # attraction magnitude d/k (×d later)
                    pull = d * (f / 1.0)[:, None]
                    np.subtract.at(disp, src_pos, pull * 1.0)
                # --- apply with temperature cap ---
                dlen = np.sqrt((disp * disp).sum(axis=1)) + 1e-12
                scale = np.minimum(dlen, _temp) / dlen
                newp = np.clip(mp + disp * scale[:, None], 0.0, 1.0)
                outs.append(
                    pa.table(
                        {
                            "vid": pa.array(vids.astype(np.int64)),
                            "x": pa.array(newp[:, 0]),
                            "y": pa.array(newp[:, 1]),
                        }
                    )
                )
            if not outs:
                return pa.table(
                    {
                        "vid": pa.array([], pa.int64()),
                        "x": pa.array([], pa.float64()),
                        "y": pa.array([], pa.float64()),
                    }
                )
            return pa.concat_tables(outs)

        upd = pa.concat_tables(
            parts_ds.map_batches(
                step, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        ).sort_by("vid")
        pos = np.stack(
            [
                upd.column("x").to_numpy(zero_copy_only=False),
                upd.column("y").to_numpy(zero_copy_only=False),
            ],
            axis=1,
        )

    return ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(all_vids),
                "x": pa.array(pos[:, 0]),
                "y": pa.array(pos[:, 1]),
            }
        )
    )
