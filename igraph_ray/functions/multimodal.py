"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, decoded/feature-extracted by actor-pool stages.

The image/audio libraries are not available in this container, so the
codec boundary is an INJECTION SEAM: every decode stage takes a
user-supplied codec callable and defaults to the deterministic stub.

- :func:`decode_images` accepts ``decode_fn(payload: bytes, h_hint,
  w_hint) -> (h, w, 3) uint8 ndarray`` — pass e.g. a Pillow-backed
  ``lambda p, h, w: np.asarray(Image.open(io.BytesIO(p)).convert("RGB"))``
  where Pillow exists; the default :func:`fake_decode_bytes` produces
  deterministic pseudo-pixels from the payload so shapes, batch
  sizes, actor signatures and output layout are real and tested.
- :func:`sample_frames` accepts ``frame_index_fn(payload: bytes,
  n_frames: int, every_nth: int) -> int ndarray`` — an ffmpeg-backed
  implementation would probe the container; the default
  :func:`stub_frame_indices` derives indices from the metadata.

Codec callables are shipped to the actor pool by value (cloudpickle),
so they must be importable or self-contained; per-actor setup that is
expensive (opening a codec context) belongs in a callable CLASS whose
``__call__`` does the decode — the stage passes the callable through
unchanged, once per actor.

The injected codec's output contract is validated per item ((h, w, 3)
uint8) with a clear error naming the seam, so a miswired real codec
fails loudly, not with a shape error deep in resize.

Scale notes baked into the stage defaults: large binary payloads need
small ``batch_size`` (a batch × concurrency must fit the worker heap),
and decoders are stateful actor pools (codec setup once per actor in
``__init__``, not per batch).
"""

from __future__ import annotations

from typing import Callable

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

DecodeFn = Callable[[bytes, int, int], np.ndarray]
FrameIndexFn = Callable[[bytes, int, int], np.ndarray]


def decode_image(payload: bytes) -> np.ndarray:
    """Real image decode — unavailable in this container."""
    raise NotImplementedError(
        "image codecs are not installed in this environment; inject a "
        "real codec via decode_images(..., decode_fn=...) — the "
        "default fake_decode_bytes stub exercises the same plumbing"
    )


def fake_decode_bytes(payload: bytes, h: int, w: int) -> np.ndarray:
    """Default stub codec: deterministic pseudo-pixels seeded by the
    payload content — the injected default of :func:`decode_images`."""
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def stub_frame_indices(
    payload: bytes, n_frames: int, every_nth: int
) -> np.ndarray:
    """Default stub frame prober: every ``every_nth`` index from the
    metadata frame count (a real prober would read the container)."""
    return np.arange(0, max(int(n_frames), 0), every_nth)


class ImageDecoder:
    """Decode + resize actor stage around an injected codec callable
    (``decode_fn(payload, h_hint, w_hint) -> (h, w, 3) uint8``)."""

    def __init__(
        self,
        out_h: int = 8,
        out_w: int = 8,
        decode_fn: DecodeFn | None = None,
    ):
        self.out_h = out_h
        self.out_w = out_w
        self.decode_fn = decode_fn or fake_decode_bytes

    @staticmethod
    def _resize(img: np.ndarray, h: int, w: int) -> np.ndarray:
        # nearest-neighbour resize, pure numpy
        ys = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
        xs = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
        return img[ys][:, xs]

    def _checked_decode(self, payload: bytes, h: int, w: int) -> np.ndarray:
        img = self.decode_fn(payload, h, w)
        if (
            not isinstance(img, np.ndarray)
            or img.ndim != 3
            or img.shape[2] != 3
            or img.dtype != np.uint8
            or img.shape[0] < 1
            or img.shape[1] < 1
        ):
            raise ValueError(
                "injected decode_fn must return a (h, w, 3) uint8 "
                f"ndarray; got {type(img).__name__}"
                + (
                    f" shape={img.shape} dtype={img.dtype}"
                    if isinstance(img, np.ndarray)
                    else ""
                )
            )
        return img

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        hs = batch.column("height").to_pylist()
        ws = batch.column("width").to_pylist()
        pixels, means = [], []
        for p, h, w in zip(payloads, hs, ws):
            img = self._checked_decode(
                p or b"", max(1, h or 1), max(1, w or 1)
            )
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


class FakeImageDecoder(ImageDecoder):
    """Back-compat alias: :class:`ImageDecoder` with the stub codec
    (the pre-seam name; prefer ImageDecoder + decode_fn)."""

    def __init__(self, out_h: int = 8, out_w: int = 8):
        super().__init__(out_h=out_h, out_w=out_w, decode_fn=None)

    def _decode_bytes(self, payload: bytes, h: int, w: int) -> np.ndarray:
        return fake_decode_bytes(payload, h, w)


def decode_images(
    ds: ray.data.Dataset,
    out_h: int = 8,
    out_w: int = 8,
    batch_size: int = 64,
    concurrency: tuple[int, int] = (1, 8),
    decode_fn: DecodeFn | None = None,
) -> ray.data.Dataset:
    """Decode+resize stage over a MULTIMODAL_SCHEMA dataset.  Small
    batches by default — payloads are wide.  ``decode_fn`` is the
    codec injection seam (module docstring); default = the
    deterministic stub."""
    return ds.map_batches(
        ImageDecoder,
        fn_constructor_args=(out_h, out_w, decode_fn),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Frame-sampling actor stage around an injected prober callable
    (``frame_index_fn(payload, n_frames, every_nth) -> int ndarray``);
    the default derives indices from metadata only."""

    def __init__(
        self,
        every_nth: int = 10,
        frame_index_fn: FrameIndexFn | None = None,
    ):
        self.every_nth = every_nth
        self.frame_index_fn = frame_index_fn or stub_frame_indices

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("item_id").to_numpy(zero_copy_only=False)
        n_frames = batch.column("n_frames").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        out_id, out_frame = [], []
        for i, nf, p in zip(ids, n_frames, payloads):
            frames = np.asarray(
                self.frame_index_fn(p or b"", int(nf), self.every_nth),
                dtype=np.int64,
            )
            out_id.extend([int(i)] * len(frames))
            out_frame.extend(int(f) for f in frames)
        return pa.table(
            {
                "item_id": pa.array(out_id, pa.int64()),
                "frame": pa.array(out_frame, pa.int32()),
            }
        )


def sample_frames(
    ds: ray.data.Dataset,
    every_nth: int = 10,
    batch_size: int = 64,
    frame_index_fn: FrameIndexFn | None = None,
) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSampler,
        fn_constructor_args=(every_nth, frame_index_fn),
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
