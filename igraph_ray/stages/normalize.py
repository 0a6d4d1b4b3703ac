"""P2 — normalizers over the files table (SURVEY.md §2.2).

Pure ``pyarrow.compute`` string kernels inside ``map_batches`` — no
Python row loops.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _normalize_batch(batch: pa.Table) -> pa.Table:
    path = pc.utf8_lower(pc.utf8_trim_whitespace(batch.column("path")))
    out = batch.set_column(batch.schema.get_field_index("path"), "path", path)
    # basename = text after the last '/' (greedy ^.*/ strips all
    # leading directories; equals regexp_extract('[^/]*$') in the
    # DuckDB twin)
    basename = pc.replace_substring_regex(path, r"^.*/", "")
    return out.append_column("basename", basename)


def normalize_files(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Lower/strip ``path`` and derive ``basename``."""
    return ds.map_batches(
        _normalize_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def filter_lang(ds: ray.data.Dataset, langs: list[str]) -> ray.data.Dataset:
    """Keep only rows whose ``lang`` is in ``langs`` — one vectorized
    ``pc.is_in`` per Arrow block, no Python predicate per row."""
    value_set = pa.array(langs, type=pa.string())

    def _f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("lang"), value_set=value_set))

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)
