"""Semi-structured column extraction: pull typed scalars out of a JSON
string column with vectorized Arrow regex kernels (the flat-JSON fast
path — no per-row ``json.loads``).

For flat objects (``{"k": 87}``) a compiled RE2 extraction is exact and
runs at Arrow-kernel speed; rows where the key is absent or non-numeric
yield null.  Nested/escaped JSON needs a real parser — that variant
would be an actor-pool ``map_batches`` stage holding a parser, not this
fast path (declared boundary, same policy as multimodal decode).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def extract_json_int(
    ds: ray.data.Dataset,
    col: str,
    key: str,
    out_col: str | None = None,
) -> ray.data.Dataset:
    """Append int64 ``out_col`` = the integer value of ``key`` in the
    flat JSON object column ``col`` (null when absent)."""
    out = out_col or key
    pattern = rf'"{re.escape(key)}"\s*:\s*(?P<v>-?\d+)'

    def f(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(batch.column(col), pattern)
        vals = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        return batch.append_column(out, vals)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
