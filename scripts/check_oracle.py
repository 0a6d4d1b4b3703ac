"""Mimic the driver's correctness gate: run every ``queries()`` entry
and its ``oracle_sql()`` twin on the same sf dir, compare row count,
schema (column names), and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import logging
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def to_pandas(obj) -> pd.DataFrame:
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        batches = list(obj.iter_batches(batch_format="pyarrow", batch_size=None))
        if not batches:
            return pd.DataFrame()
        return pa.concat_tables(batches).to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if sorted(a.columns) != sorted(b.columns):
        return f"schema mismatch: {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return f"row count mismatch: {len(a)} vs {len(b)}"
    ca, cb = canon(a), canon(b)
    for col in ca.columns:
        va, vb = ca[col].to_numpy(), cb[col].to_numpy()
        if va.dtype.kind == "f" or vb.dtype.kind == "f":
            import numpy as np

            if not np.allclose(
                va.astype(float), vb.astype(float), rtol=0, atol=1e-9
            ):
                return f"value mismatch in float column {col}"
        else:
            if not (va == vb).all():
                bad = (va != vb).nonzero()[0][:3]
                return (
                    f"value mismatch in column {col} at rows {bad}: "
                    f"{va[bad]} vs {vb[bad]}"
                )
    return None


def main() -> int:
    only: set[str] | None = None
    argv = list(sys.argv[1:])
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    import ray

    ray.init(
        address="local",
        num_cpus=8,
        include_dashboard=False,
        logging_level=logging.ERROR,
    )
    logging.getLogger("ray.data").setLevel(logging.CRITICAL)

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        t0 = time.time()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: ray query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok    {name}: rows-only ({len(ours)} rows, {dt:.1f}s)")
            continue
        try:
            ref = con.sql(sqls[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle SQL raised {type(e).__name__}: {e}")
            failures += 1
            continue
        err = compare(ours, ref)
        if err:
            print(f"FAIL  {name}: {err} ({dt:.1f}s)")
            failures += 1
        else:
            print(f"MATCH {name}: {len(ours)} rows ({dt:.1f}s)")
    ray.shutdown()
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
