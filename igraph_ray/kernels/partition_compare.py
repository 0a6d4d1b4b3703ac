"""Partition comparison — igraph ``igraph_compare_communities`` surface
(methods ``rand``, ``adjusted_rand``, ``nmi``, ``vi``, ``split-join``;
Danon et al. 2005 for NMI, Meilă 2003 for VI, Hubert & Arabie 1985 for
ARI, van Dongen 2000 for split-join).

Everything reduces over the CONTINGENCY TABLE of the two labelings —
one ``groupby([a, b]).count()`` shuffle over the input, then two
groupbys and a handful of scalar reductions over the (much smaller)
contingency dataset.  The input labelings are never gathered; the only
driver-side state is O(#blocks) partial rows and the final one-row
result.

Exactness at scale: the pair-count sums ``Σ C(n_ij, 2)`` exceed int64
once a single cell holds > 4.29e9 rows and the GLOBAL sums exceed it
once n > 4.29e9 total rows, so per-block partials switch to
arbitrary-precision Python ints when a float upper bound says int64 is
no longer safe, and the driver reduce is always Python-int exact
(`_exact_block_sum`).  The float metrics are derived from those exact
integers with a fixed operation order: ``rand`` and ``adjusted_rand``
are each ONE IEEE division of two exactly-reduced integers, so a SQL
twin (HUGEINT arithmetic + one CAST/divide) replays them bitwise;
``nmi``/``vi`` need ``x·ln x`` sums and are float-accumulation-order
sensitive — they get a brute-force numpy pytest oracle instead
(`tests/test_partition_compare.py`).

Degenerate conventions (igraph's): identical trivial partitions give
``nmi = 1``; ``vi = 0`` for identical partitions; a single shared
cluster gives ``rand = adjusted_rand = 1``.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Sum

_INT64_SAFE = float(2**62)


def _comb2_exact(counts: np.ndarray) -> int:
    """Σ c·(c−1)/2 over an int64 count vector, exact at any magnitude.

    Fast path: the float upper bound proves the int64 computation
    cannot overflow (per-cell product < 2^62 and the block sum
    < 2^62), so one vectorized pass suffices.  Slow path (astronomical
    cells — necessarily FEW cells, since Σ c = n): Python ints.
    """
    if len(counts) == 0:
        return 0
    cf = counts.astype(np.float64)
    per_cell_max = float(cf.max()) * float(cf.max())
    est_sum = float(np.sum(cf * cf))
    if per_cell_max < _INT64_SAFE and est_sum < _INT64_SAFE:
        return int(np.sum(counts * (counts - 1) // 2))
    return sum(int(c) * (int(c) - 1) // 2 for c in counts.tolist())


def _exact_block_sum(counts: np.ndarray) -> int:
    """Σ counts, exact: int64 when provably safe, else Python ints."""
    if len(counts) == 0:
        return 0
    if float(np.sum(np.abs(counts).astype(np.float64))) < _INT64_SAFE:
        return int(np.sum(counts))
    return sum(int(c) for c in counts.tolist())


def _scalar_partials(ds: ray.data.Dataset, col: str) -> tuple[int, int, float]:
    """One streaming pass over a counts dataset → exact
    ``(Σ c, Σ C(c,2))`` plus float ``Σ c·ln c``.  Partial ints travel
    as decimal strings so the driver reduce is arbitrary-precision.
    """

    def part(batch: pa.Table) -> pa.Table:
        c = batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        cf = c.astype(np.float64)
        xlx = float(np.sum(cf * np.log(np.maximum(cf, 1.0))))
        return pa.table(
            {
                "s": pa.array([str(_exact_block_sum(c))]),
                "p": pa.array([str(_comb2_exact(c))]),
                "xlx": pa.array([xlx]),
            }
        )

    rows = ds.map_batches(
        part, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    return (
        sum(int(r["s"]) for r in rows),
        sum(int(r["p"]) for r in rows),
        float(sum(r["xlx"] for r in rows)),
    )


def compare_partitions(
    ds: ray.data.Dataset, col_a: str, col_b: str
) -> pd.DataFrame:
    """Compare the two labelings ``col_a`` / ``col_b`` of one dataset.

    One row: exact-integer invariants ``(n, n_labels_a, n_labels_b,
    pairs_ij, pairs_a, pairs_b, split_join)`` plus float metrics
    ``(rand_index, adjusted_rand, nmi, vi)``.  Two SQL-twinnable floats are
    single divisions of the exact integers (see module docstring).
    """
    cont = ds.groupby([col_a, col_b]).count().materialize()
    s_ij, p_ij, xlx_ij = _scalar_partials(cont, "count()")

    marg_a = cont.groupby(col_a).aggregate(
        Sum("count()", alias_name="cnt"), Max("count()", alias_name="mx")
    ).materialize()
    marg_b = cont.groupby(col_b).aggregate(
        Sum("count()", alias_name="cnt"), Max("count()", alias_name="mx")
    ).materialize()

    s_a, p_a, xlx_a = _scalar_partials(marg_a, "cnt")
    s_b, p_b, xlx_b = _scalar_partials(marg_b, "cnt")
    max_a, _, _ = _scalar_partials(marg_a, "mx")
    max_b, _, _ = _scalar_partials(marg_b, "mx")
    n_labels_a = marg_a.count()
    n_labels_b = marg_b.count()

    n = s_a
    assert s_b == n and s_ij == n, "labeling column with nulls?"
    split_join = 2 * n - max_a - max_b

    total_pairs = n * (n - 1) // 2
    if total_pairs > 0:
        rand = float(total_pairs + 2 * p_ij - p_a - p_b) / float(total_pairs)
        ari_num = 2 * (p_ij * total_pairs - p_a * p_b)
        ari_den = (p_a + p_b) * total_pairs - 2 * p_a * p_b
        ari = float(ari_num) / float(ari_den) if ari_den != 0 else 1.0
    else:
        rand, ari = 1.0, 1.0

    if n > 0:
        ln_n = math.log(n)
        h_a = ln_n - xlx_a / n
        h_b = ln_n - xlx_b / n
        mi = xlx_ij / n - xlx_a / n - xlx_b / n + ln_n
        mi = max(mi, 0.0)
        vi = max(h_a + h_b - 2.0 * mi, 0.0)
        nmi = 2.0 * mi / (h_a + h_b) if (h_a + h_b) > 0 else 1.0
    else:
        nmi, vi = 1.0, 0.0

    return pd.DataFrame(
        {
            "n": np.array([n], dtype=np.int64),
            "n_labels_a": np.array([n_labels_a], dtype=np.int64),
            "n_labels_b": np.array([n_labels_b], dtype=np.int64),
            "pairs_ij": np.array([p_ij], dtype=np.int64),
            "pairs_a": np.array([p_a], dtype=np.int64),
            "pairs_b": np.array([p_b], dtype=np.int64),
            "split_join": np.array([split_join], dtype=np.int64),
            "rand_index": np.array([rand], dtype=np.float64),
            "adjusted_rand": np.array([ari], dtype=np.float64),
            "nmi": np.array([nmi], dtype=np.float64),
            "vi": np.array([vi], dtype=np.float64),
        }
    )
