"""Composite curation funnel — Gopher rules → C4 cleaning → exact dedup.

A staged training-data curation pipeline in the style of the published
corpus-construction recipes (Rae et al. 2021 "Gopher" App. A quality
rules; Raffel et al. 2020 "C4" §2.2 line cleaning; exact-hash dedup as
in Lee et al. 2022 §3): every document flows through the three stages
and the funnel reports per-stage survivor counts as exact integers
``(stage, stage_name, n_in, n_out)``.

Scale shape:

* Stages 1-2 are per-document flags computed in ONE streaming map —
  the Gopher and C4 batch kernels (``functions/text.py::_gopher_batch``
  / ``_c4_batch``) are reused directly on each Arrow batch, so there is
  no join between the stages and the full text never leaves the map.
* sha256 is computed only for documents that survive BOTH rule stages
  (the only per-value Python loop, same boundary as ``stages/sha.py``).
* Stage 3 is one groupby on the digest of the rule survivors — the
  same single-shuffle shape as ``exact_dedup``.  The flags table
  (3 ints + a 64-char digest per doc, no text) is materialized once so
  the scalar aggregate and the distinct-digest count share the pass
  over the input corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from igraph_ray.functions.text import _c4_batch, _gopher_batch


def curation_funnel(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Run the 3-stage funnel and return per-stage survivor counts.

    Output rows (exact integers, bitwise SQL-replayable):

    ``(1, 'gopher',      n_docs,            n_gopher_keep)``
    ``(2, 'c4',          n_gopher_keep,     n_both_keep)``
    ``(3, 'exact_dedup', n_both_keep,       n_distinct_sha)``
    """

    def _flags(batch: pa.Table) -> pa.Table:
        g = _gopher_batch(batch, id_col, text_col)
        c = _c4_batch(batch, id_col, text_col)
        kg = g.column("keep").to_numpy(zero_copy_only=False)
        kc = c.column("keep").to_numpy(zero_copy_only=False)
        k12 = kg * kc
        shas = [
            hashlib.sha256(t.encode("utf-8", "surrogatepass")).hexdigest()
            if keep and t is not None
            else None
            for keep, t in zip(k12, batch.column(text_col).to_pylist())
        ]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "keep_g": pa.array(kg.astype(np.int64)),
                "keep_12": pa.array(k12.astype(np.int64)),
                "content_sha": pa.array(shas, type=pa.string()),
            }
        )

    flags = ds.map_batches(
        _flags, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    agg = flags.aggregate(
        Count(alias_name="n0"),
        Sum("keep_g", alias_name="n1"),
        Sum("keep_12", alias_name="n2"),
    )
    n0 = int(agg["n0"])
    n1 = int(agg["n1"] or 0)
    n2 = int(agg["n2"] or 0)
    n3 = (
        flags.filter(expr="keep_12 == 1")
        .groupby("content_sha")
        .count()
        .count()
    )
    return pd.DataFrame(
        {
            "stage": np.array([1, 2, 3], dtype=np.int64),
            "stage_name": ["gopher", "c4", "exact_dedup"],
            "n_in": np.array([n0, n1, n2], dtype=np.int64),
            "n_out": np.array([n1, n2, int(n3)], dtype=np.int64),
        }
    )
