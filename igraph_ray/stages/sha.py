"""P1 — per-row content sha256 projection (SURVEY.md §2.2).

``content_sha`` is the cross-stage invariant column mandated by
BASELINE.json input_hint ("per-row invariant vs the reference: content
sha256 equality"): it is computed once on ingest and carried through
every stage; tests assert per-row equality input → output.

sha256 has no vectorized Arrow kernel, so this is the one stage with a
per-value Python loop — it runs once per row per pipeline (not per
iteration), directly over the Arrow column values.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data


def _sha_batch(batch: pa.Table, column: str, out: str) -> pa.Table:
    col = batch.column(column)
    digests = [
        hashlib.sha256(v.encode("utf-8", "surrogatepass")).hexdigest()
        if v is not None
        else None
        for v in col.to_pylist()
    ]
    return batch.append_column(out, pa.array(digests, type=pa.string()))


def with_content_sha(
    ds: ray.data.Dataset, column: str = "content", out: str = "content_sha"
) -> ray.data.Dataset:
    """Append ``out`` = sha256(``column``) to every row."""
    return ds.map_batches(
        lambda b: _sha_batch(b, column, out),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
