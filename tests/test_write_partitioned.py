"""Resumable sharded parquet sink: skip-finished semantics + full
roundtrip."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from igraph_ray.sources.parquet import write_partitioned
from igraph_ray.utils import hash_int64


def _read_all(path):
    tables = []
    for shard in sorted(os.listdir(path)):
        d = os.path.join(path, shard)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                tables.append(pq.read_table(os.path.join(d, f)))
    return pa.concat_tables(tables) if tables else None


def test_roundtrip_and_shard_assignment(tmp_path):
    n = 500
    ids = np.arange(n, dtype=np.int64)
    vals = ids * 3
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "v": pa.array(vals)})
    ).repartition(4)
    out = str(tmp_path / "out")
    written = write_partitioned(ds, out, "doc_id", num_shards=8)
    assert written == list(range(8))
    back = _read_all(out)
    assert back.num_rows == n
    got = dict(
        zip(back.column("doc_id").to_pylist(), back.column("v").to_pylist())
    )
    assert got == {int(i): int(i) * 3 for i in ids}
    # every row sits in its hash shard
    for s in range(8):
        t = _read_all(os.path.join(out))  # noqa: F841 (roundtrip above)
    for shard in os.listdir(out):
        s = int(shard.split("=")[1])
        d = os.path.join(out, shard)
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            k = (
                pq.read_table(os.path.join(d, f))
                .column("doc_id")
                .to_numpy()
                .astype(np.int64)
            )
            assert (
                (hash_int64(k) % np.uint64(8)).astype(int) == s
            ).all()


def test_resume_skips_finished_shards(tmp_path):
    n = 300
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "v": pa.array(np.arange(n, dtype=np.int64)),
            }
        )
    )
    out = str(tmp_path / "out")
    # pre-mark shards 0 and 2 as done (simulating a killed run that
    # finished them); resume must not rewrite them
    for s in (0, 2):
        os.makedirs(os.path.join(out, f"shard={s}"), exist_ok=True)
        with open(os.path.join(out, f"shard={s}", "_SUCCESS"), "w") as f:
            f.write("ok\n")
    written = write_partitioned(ds, out, "doc_id", num_shards=4)
    assert written == [1, 3]
    # markered-but-empty shards were left alone
    for s in (0, 2):
        files = os.listdir(os.path.join(out, f"shard={s}"))
        assert files == ["_SUCCESS"]
    # a second resume writes nothing
    assert write_partitioned(ds, out, "doc_id", num_shards=4) == []


def test_resume_clears_partial_shard(tmp_path):
    """A shard killed mid-write (parquet files, no _SUCCESS) must be
    cleared and rewritten, not appended to — rows must not duplicate."""
    n = 1000
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "v": pa.array(np.arange(n, dtype=np.int64)),
            }
        )
    ).repartition(4)
    out = str(tmp_path / "out")
    write_partitioned(ds, out, "doc_id", num_shards=4)
    # simulate a kill mid-write of shard 1: drop its marker, keep files
    os.remove(os.path.join(out, "shard=1", "_SUCCESS"))
    written = write_partitioned(ds, out, "doc_id", num_shards=4)
    assert written == [1]
    back = _read_all(out)
    assert back.num_rows == n
    assert sorted(back.column("doc_id").to_pylist()) == list(range(n))
