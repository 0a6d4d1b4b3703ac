"""C1 — per-iteration checkpoint of per-partition vertex state + lineage.

BASELINE.json north_star: "Every iteration checkpoints per-partition
vertex state plus lineage metadata (partition id, iteration, rows,
residual) to Parquet so a killed job resumes mid-algorithm."

Layout::

    <dir>/iter_00007/state/*.parquet    full vertex state (part, vid, ...)
    <dir>/iter_00007/lineage.parquet    (part, iteration, rows, residual)
    <dir>/iter_00007/_SUCCESS           commit marker, written LAST

A checkpoint is complete iff ``_SUCCESS`` exists; a job killed mid-write
leaves no marker, so resume falls back to the previous complete
iteration.  State is written as partitioned Parquet (one file per
block), so a resumed run streams it back without any driver-side
materialization.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

_ITER_RE = re.compile(r"^iter_(\d+)$")


def _iter_dir(root: str, iteration: int) -> str:
    return os.path.join(root, f"iter_{iteration:05d}")


def latest_complete_iteration(root: str) -> int | None:
    """Highest iteration number with a ``_SUCCESS`` marker, else None."""
    if not os.path.isdir(root):
        return None
    best = None
    for name in os.listdir(root):
        m = _ITER_RE.match(name)
        if m and os.path.exists(os.path.join(root, name, "_SUCCESS")):
            n = int(m.group(1))
            best = n if best is None else max(best, n)
    return best


class CheckpointManager:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def save_state(
        self, state: ray.data.Dataset, iteration: int, metrics: dict[str, float]
    ) -> None:
        d = _iter_dir(self.root, iteration)
        # a previous attempt may have died mid-write (no _SUCCESS):
        # clear the partial files so a retry cannot duplicate rows
        if os.path.isdir(d) and not os.path.exists(
            os.path.join(d, "_SUCCESS")
        ):
            import shutil

            shutil.rmtree(d)
        state_dir = os.path.join(d, "state")
        os.makedirs(state_dir, exist_ok=True)
        state.write_parquet(state_dir)

        # Lineage: per-partition (part, iteration, rows, residual).
        # Partial counts per block, final combine driver-side — the
        # result is one tiny row per graph partition.
        def _partials(batch: pa.Table) -> pa.Table:
            parts = batch.column("part")
            resid = (
                batch.column("resid")
                if "resid" in batch.schema.names
                else pa.array([0.0] * len(batch), pa.float64())
            )
            t = pa.table({"part": parts, "resid": resid})
            g = t.group_by("part").aggregate(
                [("part", "count"), ("resid", "sum")]
            )
            return g.rename_columns(["part", "rows", "residual"])

        partials = pa.concat_tables(
            b
            for b in state.map_batches(
                _partials, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        )
        final = partials.group_by("part").aggregate(
            [("rows", "sum"), ("residual", "sum")]
        )
        lineage = pa.table(
            {
                "part": pc.cast(final.column("part"), pa.int32()),
                "iteration": pa.array(
                    [iteration] * len(final), pa.int32()
                ),
                "rows": pc.cast(final.column("rows_sum"), pa.int64()),
                "residual": pc.cast(final.column("residual_sum"), pa.float64()),
            }
        )
        pq.write_table(lineage, os.path.join(d, "lineage.parquet"))
        # Commit marker last.
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            f.write(str(metrics))

    def load_state(self, iteration: int) -> ray.data.Dataset:
        """Read back a committed state and canonicalize its block
        layout: one block per graph partition, rows sorted by vid.

        ``read_parquet`` is free to fuse or split files into blocks
        however the scheduler likes; if a partition's rows land in two
        blocks, the scatter stage pre-combines each slice separately
        and the float reduction order of downstream partial sums
        differs from the un-resumed run by ULPs.  Re-grouping by
        ``part`` restores the invariant the apply stage established
        (one block per partition), making resume bitwise-equivalent
        regardless of parquet block boundaries.
        """
        ds = ray.data.read_parquet(
            os.path.join(_iter_dir(self.root, iteration), "state")
        )

        def _canon(group: pa.Table) -> pa.Table:
            return group.sort_by("vid")

        return ds.groupby("part").map_groups(_canon, batch_format="pyarrow")

    def load_lineage(self, iteration: int) -> pa.Table:
        return pq.read_table(
            os.path.join(_iter_dir(self.root, iteration), "lineage.parquet")
        )
