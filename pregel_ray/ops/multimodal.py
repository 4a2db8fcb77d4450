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


def _frames_stub(payload: bytes, n_frames: int, hw: int):
    """Deterministic fake video decode: `n_frames` seeded frames drawn in
    stream order from the payload digest (so frame k is the same
    regardless of sampling stride). Replace with a pyav wrapper in
    production."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
    rng = np.random.default_rng(seed)
    for _ in range(n_frames):
        yield rng.integers(0, 256, (hw, hw, 3), dtype=np.uint8)


class DecodeAndFeaturize:
    """Actor-pool stage: 'model' (here: projection matrix) loaded ONCE per
    actor in __init__; per-batch work decodes and embeds.

    `codec` is the injection point for a real decoder: any picklable
    callable ``(payload: bytes, width: int, height: int) -> uint8 HxWx3``
    (e.g. a PIL/torchvision wrapper) drops in without touching the
    pipeline — plumbing, batch sizing and output schema are codec-
    agnostic. Default: the deterministic `_decode_stub` (no image libs in
    this container). A decode failure must raise ValueError; the row is
    emitted with decoded=False and a zero feature."""

    def __init__(self, feat_dim: int = 16, resize_to: int = 32, codec=None):
        rng = np.random.default_rng(99)
        self.proj = rng.standard_normal((resize_to * resize_to * 3, feat_dim)).astype(
            np.float32
        )
        self.resize_to = resize_to
        self.feat_dim = feat_dim
        self.codec = codec or _decode_stub

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
                img = np.asarray(self.codec(pl, w, h), dtype=np.uint8)
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
                   batch_size: int = 16, codec=None) -> rd.Dataset:
    """The stateful decode→feature pipeline. Small batch_size: payload
    bytes × batch × concurrency must fit the worker heap. `codec` swaps
    in a real decoder (see DecodeAndFeaturize)."""
    return media.map_batches(
        DecodeAndFeaturize,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
        fn_constructor_kwargs={"codec": codec},
    )


class FrameSampler:
    """Actor-pool stage: video payloads → every-k-th decoded frame.

    Real Ray plumbing (schema, small batches for large payloads, one
    `__init__` per actor), stubbed codec like _decode_stub: a 'video' is
    deterministically expanded to `n_frames` fake frames from the payload
    digest; a real build swaps the stub for pyav. Output: one row per
    SAMPLED frame (media_id, frame_idx, frame binary, width, height) —
    the fan-out shape a downstream per-frame featurizer consumes."""

    def __init__(self, every_k: int = 4, n_frames: int = 16,
                 frame_hw: int = 16, codec=None):
        self.every_k = every_k
        self.n_frames = n_frames
        self.hw = frame_hw
        # injection point: ``(payload, n_frames, hw) -> iterable of uint8
        # HxWx3 frames IN STREAM ORDER`` (a pyav wrapper in production)
        self.codec = codec or _frames_stub

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for mid, pl in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            for k, frame in enumerate(self.codec(pl, self.n_frames, self.hw)):
                if k % self.every_k == 0:
                    ids.append(mid)
                    fidx.append(k)
                    frames.append(np.asarray(frame, np.uint8).tobytes())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame": pa.array(frames, pa.large_binary()),
                "width": pa.array(np.full(len(ids), self.hw, np.int32)),
                "height": pa.array(np.full(len(ids), self.hw, np.int32)),
            }
        )


def frame_sample(media: rd.Dataset, every_k: int = 4, n_frames: int = 16,
                 concurrency: int = 2, batch_size: int = 8,
                 codec=None) -> rd.Dataset:
    """Video → sampled-frame rows (decode/sample in an actor pool; small
    batch_size keeps payload bytes × batch × concurrency in worker heap).
    `codec` swaps in a real frame decoder (see FrameSampler)."""
    return media.map_batches(
        FrameSampler,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
        fn_constructor_kwargs={"every_k": every_k, "n_frames": n_frames,
                               "codec": codec},
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
