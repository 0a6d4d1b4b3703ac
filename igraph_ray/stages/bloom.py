"""Bloom-filter semi-join: broadcastable membership pre-filter.

The canonical 100-TB join-pruning stage: when a semi-join's build side
is small (an eval set, an allowlist, this week's order keys) and the
probe side is the corpus, shipping the probe through a hash shuffle
moves every block for nothing.  A Bloom filter compresses the build
side into a fixed ``m``-bit array, broadcast once with ``ray.put``;
each probe batch tests membership locally and drops the (vast)
non-matching majority *before* any shuffle or exact join.  False
positives pass through (to be removed by the exact join downstream, or
tolerated — e.g. dedup candidate generation); false negatives are
impossible.

Deterministic by construction: positions come from the repo's
stateless splitmix64 (``utils.hash_int64``) double-hashed
(Kirsch–Mitzenmacher: ``pos_i = h1 + i*h2 mod m``), so the pass set —
including its false positives — is bit-identical across runs, resumes
and partitionings, and is replayable in exact SQL (the driver twin
recomputes the same positions with HUGEINT arithmetic).

Scale shape: the build pass emits one packed ``m/8``-byte bitmap per
block (per-block partials, OR-reduced on the driver — the A1 scalar-
aggregate pattern); the probe is a stateless ``map_batches`` whose
actors fetch the bitmap once in ``__init__``.  ``m`` is fixed and
independent of probe size; size it from the build-side cardinality
(``m ≈ n·k/ln2`` bits for the classic optimum).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.utils import hash_int64

# second-hash salt (decimal 15111065706836454659): an arbitrary odd
# 64-bit constant XORed into the key before the second splitmix64 so
# h2 is independent of h1.  Mirrored verbatim in the SQL twin.
_H2_SALT = np.uint64(0xD1B54A32D192ED03)


def bloom_positions(
    keys: np.ndarray, m_bits: int, k: int
) -> np.ndarray:
    """(len(keys), k) int64 bit positions — Kirsch–Mitzenmacher double
    hashing, ``pos_i = (h1 + i * h2) mod 2^64 mod m`` with ``h2`` forced
    odd so the probe sequence cycles through all of ``[0, m)``."""
    u = keys.astype(np.int64).astype(np.uint64)
    h1 = hash_int64(u)
    h2 = hash_int64(u ^ _H2_SALT) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pos = h1[:, None] + i[None, :] * h2[:, None]
    return (pos % np.uint64(m_bits)).astype(np.int64)


def build_bloom(
    ds: ray.data.Dataset, col: str, m_bits: int = 1 << 20, k: int = 3
) -> np.ndarray:
    """Build the ``m_bits``-long bool bitmap over int64 column ``col``.

    One streaming pass: each block folds its keys into a packed
    ``m/8``-byte partial bitmap; partials OR-merge on the driver
    (fixed-size reduce, independent of row count)."""
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")

    def fold(batch: pa.Table) -> pa.Table:
        keys = batch.column(col).to_numpy(zero_copy_only=False)
        bits = np.zeros(m_bits, np.bool_)
        if len(keys):
            bits[bloom_positions(keys, m_bits, k).ravel()] = True
        packed = np.packbits(bits, bitorder="little")
        return pa.table({"bits": pa.array([packed.tobytes()], pa.binary())})

    merged = np.zeros(m_bits // 8, np.uint8)
    for b in ds.map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        for blob in b.column("bits").to_pylist():
            merged |= np.frombuffer(blob, np.uint8)
    return np.unpackbits(merged, bitorder="little").astype(np.bool_)


def bloom_semi_join(
    probe: ray.data.Dataset,
    col: str,
    bits: np.ndarray,
    k: int = 3,
) -> ray.data.Dataset:
    """Rows of ``probe`` whose ``col`` MIGHT be in the filtered set
    (no false negatives; deterministic false positives).

    ``bits`` is broadcast once via ``ray.put``; each probe actor
    fetches it in ``__init__`` (zero-copy from the local object store)
    and tests batches with two vectorized gathers."""
    m_bits = len(bits)
    ref = ray.put(bits)

    class _Probe:
        def __init__(self, bref):
            self._bits = ray.get(bref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column(col).to_numpy(zero_copy_only=False)
            if not len(keys):
                return batch
            pos = bloom_positions(keys, m_bits, k)
            member = self._bits[pos].all(axis=1)
            return batch.filter(pa.array(member))

    return probe.map_batches(
        _Probe,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
