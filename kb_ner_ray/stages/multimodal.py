"""Multimodal (image/audio) column plumbing.

Binary media travel as opaque ``binary`` columns with typed metadata; decode
and feature extraction are actor-pool ``map_batches`` stages.  The actual
codec libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernel is a clearly-marked deterministic fake behind the same
interface (``_decode_image`` raises NotImplementedError unless
``allow_fake=True``); the Ray-side plumbing — schema, batch sizing for
large binary payloads, actor signature, output layout — is real and tested.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import ray

IMAGE_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("url", pa.string()),
    ("content", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])


def make_fake_images(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake 'image' blobs: header(width,height) + noise bytes."""
    rows = []
    for i in range(n):
        h = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=16).digest()
        width = 32 + h[0] % 96
        height = 32 + h[1] % 96
        payload = struct.pack("<II", width, height) + h * 8
        rows.append({"media_id": i, "url": f"https://img.example.com/{i}.fake",
                     "content": payload, "mime": "image/fake",
                     "width": width, "height": height})
    return pa.Table.from_pylist(rows, schema=IMAGE_SCHEMA)


def _decode_image(content: bytes, allow_fake: bool = False) -> np.ndarray:
    """STUB: real deployments decode with PIL/libvips here. The fake decoder
    understands only the make_fake_images layout."""
    if not allow_fake:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "construct the stage with allow_fake=True for the test fake")
    width, height = struct.unpack("<II", content[:8])
    body = np.frombuffer(content[8:], dtype=np.uint8)
    reps = (width * height + len(body) - 1) // len(body)
    return np.tile(body, reps)[: width * height].reshape(height, width)


class ImageFeatures:
    """Actor-pool stage: binary image column -> per-image feature vector
    (mean/std/histogram).  Small batch_size — large binary payloads
    (SURVEY.md §4 memory note)."""

    def __init__(self, allow_fake: bool = False):
        self.allow_fake = allow_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, stds, hists = [], [], []
        for content in batch.column("content").to_pylist():
            img = _decode_image(content, self.allow_fake)
            means.append(float(img.mean()))
            stds.append(float(img.std()))
            hist, _ = np.histogram(img, bins=8, range=(0, 256))
            hists.append((hist / hist.sum()).astype(np.float32).tolist())
        return pa.table({
            "media_id": batch.column("media_id"),
            "mean_px": pa.array(means, pa.float64()),
            "std_px": pa.array(stds, pa.float64()),
            "hist": pa.array(hists, pa.list_(pa.float32())),
        })


class ImageResize:
    """Actor-pool stage: resize via stride sampling (the frame-sample /
    thumbnail seat); output stays a binary column."""

    def __init__(self, target: int = 16, allow_fake: bool = False):
        self.target = target
        self.allow_fake = allow_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for content in batch.column("content").to_pylist():
            img = _decode_image(content, self.allow_fake)
            ys = np.linspace(0, img.shape[0] - 1, self.target).astype(int)
            xs = np.linspace(0, img.shape[1] - 1, self.target).astype(int)
            out.append(img[np.ix_(ys, xs)].tobytes())
        return pa.table({
            "media_id": batch.column("media_id"),
            "thumb": pa.array(out, pa.binary()),
            "thumb_w": pa.array([self.target] * batch.num_rows, pa.int32()),
            "thumb_h": pa.array([self.target] * batch.num_rows, pa.int32()),
        })


def image_feature_pipeline(images_ds, allow_fake: bool = False,
                           concurrency=(1, 2)):
    return images_ds.map_batches(
        ImageFeatures, fn_constructor_kwargs={"allow_fake": allow_fake},
        batch_format="pyarrow", batch_size=64, concurrency=concurrency)
