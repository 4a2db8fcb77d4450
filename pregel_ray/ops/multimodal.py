"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as `binary` columns with sidecar metadata
(mime, width/height/duration). Decode / feature-extract / resize /
frame-sample are actor-pool `map_batches` stages whose Ray-side
plumbing (schema, batch sizing for large payloads, actor signature,
output layout) is real and tested; the codec call itself is STUBBED —
the image/audio libraries are not in this container. Swap
`_decode_stub` for PIL/torchaudio/pyav in production.

Batch sizing: binary payloads are large → small `batch_size` so
batch × concurrency fits worker heaps (map_batches guidance in
SURVEY.md §4 / memory-aware bullet of the build brief).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synth_media(n: int = 64, seed: int = 21) -> pa.Table:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.bytes(rng.integers(512, 4096)) for _ in range(n)]
    w = rng.integers(32, 256, n).astype(np.int32)
    h = rng.integers(32, 256, n).astype(np.int32)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "mime": pa.array(["image/png"] * n),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array(w),
            "height": pa.array(h),
        },
        schema=MEDIA_SCHEMA,
    )


def _decode_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: seeded uint8 HxWx3 'pixels' derived from
    the payload digest. Replace with a real codec in production.
    Raises like a real decoder on empty payloads."""
    if not payload:
        raise ValueError("empty media payload")
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


class DecodeAndFeaturize:
    """Actor-pool stage: 'model' (here: projection matrix) loaded ONCE per
    actor in __init__; per-batch work decodes and embeds."""

    def __init__(self, feat_dim: int = 16, resize_to: int = 32):
        rng = np.random.default_rng(99)
        self.proj = rng.standard_normal((resize_to * resize_to * 3, feat_dim)).astype(
            np.float32
        )
        self.resize_to = resize_to
        self.feat_dim = feat_dim

    def _resize(self, img: np.ndarray) -> np.ndarray:
        # nearest-neighbor resize, pure numpy (no image libs in container)
        h, w, _ = img.shape
        r = self.resize_to
        yi = (np.arange(r) * h // r).clip(0, h - 1)
        xi = (np.arange(r) * w // r).clip(0, w - 1)
        return img[yi][:, xi]

    def __call__(self, t: pa.Table) -> pa.Table:
        feats, ok = [], []
        for pl, w, h in zip(
            t["payload"].to_pylist(), t["width"].to_pylist(), t["height"].to_pylist()
        ):
            try:
                img = _decode_stub(pl, w, h)
                small = self._resize(img).astype(np.float32).ravel() / 255.0
                feats.append(small @ self.proj)
                ok.append(True)
            except ValueError:
                feats.append(np.zeros(self.feat_dim, np.float32))
                ok.append(False)
        return pa.table(
            {
                "media_id": t["media_id"],
                "feature": pa.array([f.tolist() for f in feats],
                                    pa.list_(pa.float32())),
                "decoded": pa.array(ok),
            }
        )


def media_features(media: rd.Dataset, concurrency: int = 2,
                   batch_size: int = 16) -> rd.Dataset:
    """The stateful decode→feature pipeline. Small batch_size: payload
    bytes × batch × concurrency must fit the worker heap."""
    return media.map_batches(
        DecodeAndFeaturize,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def quantize_features(feats: rd.Dataset, scale: int = 10_000) -> rd.Dataset:
    """(media_id, decoded, feature_q): features quantized to int64 at
    `scale` — a hash-stable representation for golden-file comparison
    (tests/make_golden.py reproduces it with an independent straight-numpy
    implementation of the same spec)."""

    def _q(t: pa.Table) -> pa.Table:
        q = [
            np.round(np.asarray(f, np.float32) * scale).astype(np.int64).tolist()
            for f in t["feature"].to_pylist()
        ]
        return pa.table(
            {
                "media_id": t["media_id"],
                "decoded": t["decoded"],
                "feature_q": pa.array(q, pa.list_(pa.int64())),
            }
        )

    return feats.map_batches(_q, batch_format="pyarrow")
