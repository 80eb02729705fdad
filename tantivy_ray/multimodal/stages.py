"""Multimodal actor-pool stages.

Images/audio/video are opaque ``binary`` columns with typed metadata
(width/height/format ...). The Ray-side plumbing is real and tested:
callable-class stages for ``map_batches(Cls, concurrency=N, batch_size=B)``
with per-actor init, Arrow-in/Arrow-out schemas, and small batch sizes
for large payloads.

Codecs: netpbm (P5/P6) and uncompressed 24-bit BMP decode for REAL via
``codecs.py`` (pure numpy — no external libraries needed).  Compressed
formats (JPEG/PNG) and video need codecs absent from this container,
so those stay behind a clearly-marked seam —

- ``strict=True``  → raise NotImplementedError at the decode call
  (production posture: fail loudly until a codec is wired in);
- ``strict=False`` → deterministic fake decode (content-hash-seeded
  pixels) so downstream plumbing (resize, feature extract, frame
  sampling) is exercised end-to-end with stable outputs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def fake_decode_rgb(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decoder: content-hash-seeded RGB pixels."""
    seed = int.from_bytes(
        hashlib.blake2b(payload or b"", digest_size=4).digest(), "big")
    rs = np.random.RandomState(seed)
    return rs.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


class DecodeImageStage:
    """binary → fixed-size RGB array column (``image`` as flat uint8 list).

    map_batches(DecodeImageStage, concurrency=N, batch_size=B, num_cpus=1);
    keep B small: payload x B x concurrency must fit a worker heap."""

    def __init__(self, width: int = 32, height: int = 32,
                 payload_col: str = "html", strict: bool = False):
        self.width = width
        self.height = height
        self.payload_col = payload_col
        self.strict = strict

    def _decode(self, payload: bytes) -> np.ndarray:
        from .codecs import UnsupportedImage, decode_image

        try:
            # REAL codec path (codecs.py): netpbm P5/P6 and 24-bit BMP
            # decode with numpy alone; nearest-resize to the stage size
            img = decode_image(payload)
            h, w = img.shape[:2]
            yi = np.arange(self.height) * h // self.height
            xi = np.arange(self.width) * w // self.width
            return img[yi[:, None], xi[None, :], :]
        except UnsupportedImage:
            if self.strict:
                raise NotImplementedError(
                    "compressed image codec (JPEG/PNG) not available in "
                    "this environment; wire PIL/turbojpeg here or run "
                    "with strict=False"
                )
            return fake_decode_rgb(payload, self.width, self.height)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        imgs = np.stack([self._decode(p or b"") for p in payloads])
        flat = imgs.reshape(len(payloads), -1)
        return batch.append_column(
            "image", pa.FixedSizeListArray.from_arrays(
                pa.array(flat.ravel(), type=pa.uint8()), flat.shape[1])
        )


class ResizeImageStage:
    """image (H*W*3 flat) → resized (h2*w2*3 flat), nearest-neighbor."""

    def __init__(self, src_wh=(32, 32), dst_wh=(16, 16)):
        self.sw, self.sh = src_wh
        self.dw, self.dh = dst_wh
        ys = (np.arange(self.dh) * self.sh // self.dh)
        xs = (np.arange(self.dw) * self.sw // self.dw)
        self._yi, self._xi = np.meshgrid(ys, xs, indexing="ij")

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("image")
        flat = col.combine_chunks().flatten().to_numpy(zero_copy_only=False)
        imgs = flat.reshape(len(batch), self.sh, self.sw, 3)
        small = imgs[:, self._yi, self._xi, :]
        out = small.reshape(len(batch), -1)
        return batch.set_column(
            batch.schema.get_field_index("image"), "image",
            pa.FixedSizeListArray.from_arrays(
                pa.array(out.ravel(), type=pa.uint8()), out.shape[1]),
        )


class ExtractImageFeaturesStage:
    """image → small feature vector (channel means/stds — the model-free
    placeholder for an embedding model loaded once per actor)."""

    def __init__(self, wh=(16, 16)):
        self.w, self.h = wh

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat = batch.column("image").combine_chunks().flatten().to_numpy(
            zero_copy_only=False)
        imgs = flat.reshape(len(batch), self.h, self.w, 3).astype(np.float64)
        feats = np.concatenate([
            imgs.mean(axis=(1, 2)), imgs.std(axis=(1, 2))
        ], axis=1)
        return batch.append_column(
            "image_features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), type=pa.float64()), feats.shape[1]),
        )


class FrameSampleStage:
    """video binary → every Nth 'frame' (stub: derives frame payloads by
    hashing; real implementation seeks keyframes via ffmpeg per actor)."""

    def __init__(self, num_frames: int = 4, payload_col: str = "html",
                 strict: bool = False):
        self.num_frames = num_frames
        self.payload_col = payload_col
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "video codec not available; wire ffmpeg here or use "
                "strict=False"
            )
        payloads = batch.column(self.payload_col).to_pylist()
        frames = [
            [hashlib.blake2b((p or b"") + bytes([i]), digest_size=16).digest()
             for i in range(self.num_frames)]
            for p in payloads
        ]
        return batch.append_column(
            "frames", pa.array(frames, type=pa.list_(pa.binary()))
        )
