"""P2 normalizers and T2 sampling tests (previously untested —
VERDICT.md round 1 'What's wrong' #5 / coverage T2)."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.normalize import filter_lang, normalize_files
from igraph_ray.stages.sample import hash_sample, random_sample
from igraph_ray.utils import hash_int64
from tests.util import ds_to_table


def test_normalize_basename_and_case(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "path": pa.array(
                    [
                        "  Src/Main/App.PY ",
                        "flat.txt",
                        "a/b/c/d.rs",
                        "trailing/slash/",
                    ]
                ),
                "lang": pa.array(["py", "txt", "rs", "x"]),
            }
        )
    )
    out = ds_to_table(normalize_files(ds))
    assert out.column("path").to_pylist() == [
        "src/main/app.py",
        "flat.txt",
        "a/b/c/d.rs",
        "trailing/slash/",
    ]
    assert out.column("basename").to_pylist() == [
        "app.py",
        "flat.txt",
        "d.rs",
        "",
    ]


def test_filter_lang(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "lang": pa.array(["en", "de", "fr", "en", "zh"]),
                "x": pa.array([1, 2, 3, 4, 5], pa.int64()),
            }
        )
    )
    out = ds_to_table(filter_lang(ds, ["en", "zh"]))
    assert sorted(out.column("x").to_pylist()) == [1, 4, 5]


def test_hash_sample_deterministic(ray_session):
    ids = np.arange(5000, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids)})).repartition(
        num_blocks=7
    )
    a = sorted(ds_to_table(hash_sample(ds, "doc_id")).column("doc_id").to_pylist())
    b = sorted(ds_to_table(hash_sample(ds, "doc_id")).column("doc_id").to_pylist())
    assert a == b  # rerun-stable
    expect = ids[(hash_int64(ids) % np.uint64(10)) < 1]
    assert a == expect.tolist()
    # ~10% within loose bounds
    assert 0.05 < len(a) / len(ids) < 0.15


def test_hash_sample_bad_rate(ray_session):
    import pytest

    ds = ray.data.range(10)
    with pytest.raises(ValueError):
        hash_sample(ds, "id", num=0)


def test_random_sample_rate(ray_session):
    ds = ray.data.range(10_000)
    n = random_sample(ds, 0.2, seed=7).count()
    assert 1000 < n < 3000
