"""Rank family (stages/window.py::rank_functions): pinned bitwise
against DuckDB's RANK / DENSE_RANK / PERCENT_RANK / NTILE on the same
rows, including heavy ties, singleton keys, and n < ntiles keys."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.window import rank_functions
from tests.util import ds_to_table


def _fixture(seed=0, n=400, keys=7, vmax=12):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k": pa.array(rng.integers(0, keys, n).astype(np.int64)),
            "v": pa.array(rng.integers(0, vmax, n).astype(np.int64)),
            "tie": pa.array(np.arange(n, dtype=np.int64)),
        }
    )


def _oracle(tbl: pa.Table, ntiles: int) -> list[tuple]:
    con = duckdb.connect()
    con.register("t", tbl)
    rows = con.sql(
        f"""
        SELECT k, v, tie,
          CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS row_number,
          CAST(RANK() OVER w1 AS BIGINT) AS rnk,
          CAST(DENSE_RANK() OVER w1 AS BIGINT) AS dense_rank,
          PERCENT_RANK() OVER w1 AS percent_rank,
          CAST(NTILE({ntiles}) OVER w2 AS BIGINT) AS ntile
        FROM t
        WINDOW w1 AS (PARTITION BY k ORDER BY v),
               w2 AS (PARTITION BY k ORDER BY v, tie)
        ORDER BY k, v, tie
        """
    ).fetchall()
    return rows


def _got(tbl: pa.Table, ntiles: int, blocks=5) -> list[tuple]:
    ds = ray.data.from_arrow(tbl).repartition(num_blocks=blocks)
    out = ds_to_table(
        rank_functions(ds, "k", "v", "tie", ntiles=ntiles)
    )
    rows = list(
        zip(
            *(
                out.column(c).to_pylist()
                for c in (
                    "k", "v", "tie", "row_number", "rnk",
                    "dense_rank", "percent_rank", "ntile",
                )
            )
        )
    )
    return sorted(rows, key=lambda r: (r[0], r[1], r[2]))


def test_rank_family_matches_duckdb(ray_session):
    tbl = _fixture()
    assert _got(tbl, 4) == _oracle(tbl, 4)


def test_heavy_ties_and_small_keys(ray_session):
    tbl = pa.table(
        {
            "k": pa.array([1, 1, 1, 1, 2, 3, 3], pa.int64()),
            "v": pa.array([5, 5, 5, 5, 9, 1, 1], pa.int64()),
            "tie": pa.array([10, 11, 12, 13, 14, 15, 16], pa.int64()),
        }
    )
    # ntiles > some key sizes: NTILE degenerates to row_number there
    assert _got(tbl, 3, blocks=2) == _oracle(tbl, 3)


def test_layout_determinism(ray_session):
    tbl = _fixture(seed=9, n=150, keys=4, vmax=5)
    assert _got(tbl, 5, blocks=1) == _got(tbl, 5, blocks=8)
