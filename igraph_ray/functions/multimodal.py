"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, decoded/feature-extracted by actor-pool stages.

The image/audio libraries are not available in this container, so the
codec boundary is STUBBED: :class:`FakeImageDecoder` produces a
deterministic pseudo-pixel array from the payload bytes (so shapes,
batch sizes, actor signatures, and output layout are real and tested),
and :func:`decode_image` raises ``NotImplementedError`` pointing at the
stub.  Swapping in Pillow/ffmpeg later only changes ``_decode_bytes``.

Scale notes baked into the stage defaults: large binary payloads need
small ``batch_size`` (a batch × concurrency must fit the worker heap),
and decoders are stateful actor pools (codec setup once per actor in
``__init__``, not per batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

MULTIMODAL_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("modality", pa.string()),  # 'image' | 'audio' | 'video'
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


def decode_image(payload: bytes) -> np.ndarray:
    """Real image decode — unavailable in this container."""
    raise NotImplementedError(
        "image codecs are not installed in this environment; use "
        "FakeImageDecoder for pipeline plumbing (deterministic stub)"
    )


class FakeImageDecoder:
    """Deterministic stand-in decoder: bytes → (h, w, 3) uint8 array
    seeded by the payload content.  Actor-pool stage."""

    def __init__(self, out_h: int = 8, out_w: int = 8):
        self.out_h = out_h
        self.out_w = out_w

    def _decode_bytes(self, payload: bytes, h: int, w: int) -> np.ndarray:
        seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
        rng = np.random.Generator(np.random.PCG64(seed))
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    @staticmethod
    def _resize(img: np.ndarray, h: int, w: int) -> np.ndarray:
        # nearest-neighbour resize, pure numpy
        ys = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
        xs = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
        return img[ys][:, xs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        hs = batch.column("height").to_pylist()
        ws = batch.column("width").to_pylist()
        pixels, means = [], []
        for p, h, w in zip(payloads, hs, ws):
            img = self._decode_bytes(p or b"", max(1, h or 1), max(1, w or 1))
            img = self._resize(img, self.out_h, self.out_w)
            pixels.append(img.reshape(-1).tolist())
            means.append(float(img.mean()))
        return pa.table(
            {
                "item_id": batch.column("item_id"),
                "pixels": pa.array(pixels, pa.list_(pa.uint8())),
                "mean_intensity": pa.array(means, pa.float64()),
            }
        )


def decode_images(
    ds: ray.data.Dataset,
    out_h: int = 8,
    out_w: int = 8,
    batch_size: int = 64,
    concurrency: tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """Decode+resize stage over a MULTIMODAL_SCHEMA dataset.  Small
    batches by default — payloads are wide."""
    return ds.map_batches(
        FakeImageDecoder,
        fn_constructor_args=(out_h, out_w),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Video stub: emit ``every_nth`` frame index rows per item —
    output layout for a real ffmpeg-backed sampler."""

    def __init__(self, every_nth: int = 10):
        self.every_nth = every_nth

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("item_id").to_numpy(zero_copy_only=False)
        n_frames = batch.column("n_frames").to_numpy(zero_copy_only=False)
        out_id, out_frame = [], []
        for i, nf in zip(ids, n_frames):
            frames = np.arange(0, max(int(nf), 0), self.every_nth)
            out_id.extend([int(i)] * len(frames))
            out_frame.extend(frames.tolist())
        return pa.table(
            {
                "item_id": pa.array(out_id, pa.int64()),
                "frame": pa.array(out_frame, pa.int32()),
            }
        )


def sample_frames(
    ds: ray.data.Dataset, every_nth: int = 10, batch_size: int = 64
) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSampler,
        fn_constructor_args=(every_nth,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=(1, 8),
    )


def synth_multimodal_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake multimodal table for tests/bench."""
    rng = np.random.Generator(np.random.PCG64(seed))
    payloads = [rng.integers(0, 256, size=32, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "item_id": pa.array(np.arange(n, dtype=np.int64)),
            "modality": pa.array(["image"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rng.integers(4, 32, n).astype(np.int32)),
            "height": pa.array(rng.integers(4, 32, n).astype(np.int32)),
            "sample_rate": pa.array(np.zeros(n, np.int32)),
            "n_frames": pa.array(rng.integers(0, 100, n).astype(np.int32)),
        }
    )
