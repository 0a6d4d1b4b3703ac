"""Bloom-filter semi-join: no false negatives, deterministic false
positives, bit-exact vs a direct numpy reference."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.stages.bloom import (
    bloom_positions,
    bloom_semi_join,
    build_bloom,
)


def _ref_bits(keys, m, k):
    bits = np.zeros(m, np.bool_)
    bits[bloom_positions(np.asarray(keys, np.int64), m, k).ravel()] = True
    return bits


def _pass_set(build_keys, probe_keys, m, k):
    build = ray.data.from_arrow(
        pa.table({"key": pa.array(build_keys, pa.int64())})
    )
    probe = ray.data.from_arrow(
        pa.table({"key": pa.array(probe_keys, pa.int64())})
    ).repartition(4)
    bits = build_bloom(build.repartition(3), "key", m_bits=m, k=k)
    assert (bits == _ref_bits(build_keys, m, k)).all()
    out = bloom_semi_join(probe, "key", bits, k=k)
    batches = list(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    if not batches:
        return set(), bits
    got = pa.concat_tables(batches)
    return set(got.column("key").to_pylist()), bits


def test_no_false_negatives(ray_session):
    rng = np.random.default_rng(7)
    build = rng.integers(0, 10**9, 400).tolist()
    probe = build + rng.integers(0, 10**9, 2000).tolist()
    passed, _ = _pass_set(build, probe, m=1 << 14, k=3)
    assert set(build) <= passed


def test_false_positives_match_reference_and_are_deterministic(
    ray_session,
):
    rng = np.random.default_rng(11)
    build = rng.integers(0, 10**6, 300).tolist()
    probe = rng.integers(0, 10**6, 3000).tolist()
    m, k = 1 << 10, 2  # deliberately dense: force false positives
    passed, bits = _pass_set(build, probe, m, k)
    # reference membership: every probe key whose k positions are set
    pos = bloom_positions(np.asarray(probe, np.int64), m, k)
    ref = {p for p, ok in zip(probe, bits[pos].all(axis=1)) if ok}
    assert passed == ref
    assert ref - set(build), "test graph should produce false positives"
    again, _ = _pass_set(build, probe, m, k)
    assert again == passed


def test_empty_build_side_passes_nothing(ray_session):
    passed, _ = _pass_set([], [1, 2, 3], m=1 << 10, k=3)
    assert passed == set()
