"""Convenience API: edge tables in, kernel results out.

These helpers glue the stages together for tests, bench, and the
driver entry; large pipelines compose the stages directly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.partition import GraphMeta, build_graph_partitions
from igraph_ray.utils import num_parts_for


def edges_dataset(
    src, dst, weight=None, num_blocks: int | None = None
) -> ray.data.Dataset:
    """Build an edge Dataset from arrays (test/bench helper)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    w = (
        np.asarray(weight, dtype=np.float64)
        if weight is not None
        else np.ones(len(src), dtype=np.float64)
    )
    ds = ray.data.from_arrow(
        pa.table(
            {"src": pa.array(src), "dst": pa.array(dst), "weight": pa.array(w)}
        )
    )
    if num_blocks:
        ds = ds.repartition(num_blocks=num_blocks)
    return ds


def build_graph(
    edges: ray.data.Dataset,
    graph_dir: str,
    num_parts: int | None = None,
    vertices: ray.data.Dataset | None = None,
    symmetrize: bool = False,
    balance_hot: bool = True,
    part_overrides: dict[int, int] | None = None,
    mode: str = "memory",
) -> GraphMeta:
    """Partition an edge table into CSR blocks under ``graph_dir``.

    ``symmetrize=True`` applies E4 first (undirected semantics: both
    arcs, parallel edges collapsed with summed weight).

    ``mode="memory"`` (default) partitions with one in-store
    ``groupby(part)`` shuffle; ``mode="disk"`` stages union rows to
    hive-partitioned Parquet first and builds each CSR block from its
    own shard — per-partition resumable, peak store footprint of one
    block per core, for graphs whose shuffle copies exceed the object
    store + spill budget (see ``build_graph_disk``).
    """
    if symmetrize:
        # Cheap map-only symmetrization: emit both arcs; parallel-arc
        # collapse (weight = sum, the multigraph rule) happens inside
        # the per-partition CSR build, so no extra all-to-all shuffle.
        def both_arcs(batch: pa.Table) -> pa.Table:
            src = batch.column("src").to_numpy(zero_copy_only=False)
            dst = batch.column("dst").to_numpy(zero_copy_only=False)
            w = batch.column("weight").to_numpy(zero_copy_only=False)
            rev = src != dst
            return pa.table(
                {
                    "src": pa.array(
                        np.concatenate([src, dst[rev]]).astype(np.int64)
                    ),
                    "dst": pa.array(
                        np.concatenate([dst, src[rev]]).astype(np.int64)
                    ),
                    "weight": pa.array(
                        np.concatenate([w, w[rev]]).astype(np.float64)
                    ),
                }
            )

        edges = edges.map_batches(
            both_arcs, batch_format="pyarrow", zero_copy_batch=True
        )
    if mode not in ("memory", "disk"):
        raise ValueError(f"unknown build_graph mode {mode!r}")
    if mode == "memory":
        # Materialize so the partitioner's consumers execute the
        # upstream pipeline once, not per branch.
        edges = edges.materialize()
    if num_parts is None:
        # memory mode: metadata-only count on the materialized ds.
        # disk mode: one extra streaming pass — the point of that mode
        # is never holding a full copy in the store.
        n_edges = edges.count()
        num_parts = num_parts_for(n_edges, max(1, n_edges))
        # parallelism floor: enough partitions to keep the node busy,
        # but not so many that per-(source-part, dst) pre-combining
        # stops shrinking the message shuffle (messages grow ~P·V)
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_parts = max(
            num_parts,
            min(max(2, cpus // 4), max(1, n_edges // 50_000)),
        )
    if mode == "disk":
        from igraph_ray.stages.partition import build_graph_disk

        return build_graph_disk(
            edges,
            graph_dir,
            num_parts,
            vertices=vertices,
            balance_hot=balance_hot,
            part_overrides=part_overrides,
        )
    return build_graph_partitions(
        edges,
        graph_dir,
        num_parts,
        vertices=vertices,
        balance_hot=balance_hot,
        part_overrides=part_overrides,
    )


def state_to_table(state: ray.data.Dataset, columns: list[str]) -> pa.Table:
    """Collect a (small) final state dataset into one Arrow table,
    sorted by vid — for tests and oracles only."""
    tbl = pa.concat_tables(
        state.select_columns(columns).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return tbl.sort_by("vid")
