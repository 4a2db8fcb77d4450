"""Generate the multimodal golden parquet with an INDEPENDENT
straight-numpy implementation of the documented spec (no pregel_ray
imports) — the oracle for the `multimodal_features` driver query.

Spec (pregel_ray/ops/multimodal.py docstrings):
  media table: seeded rng(21); payload = rng.bytes(rng.integers(512, 4096));
      width/height = rng.integers(32, 256).
  decode stub: seed = little-endian blake2b-8(payload); pixels =
      rng(seed).integers(0, 256, (h, w, 3), uint8).
  featurize: nearest-neighbor resize to 32×32 (index maps
      arange(r)*dim//r clipped), /255 float32, matmul with the
      rng(99).standard_normal((32*32*3, 16)) float32 projection.
  quantize: round(feature * 10_000) → int64.

Run: python tests/make_golden.py  (writes tests/golden/*.parquet)
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N = 256
RESIZE = 32
FEAT_DIM = 16
SCALE = 10_000


def main() -> None:
    rng = np.random.default_rng(21)
    payloads = [rng.bytes(rng.integers(512, 4096)) for _ in range(N)]
    widths = rng.integers(32, 256, N).astype(np.int32)
    heights = rng.integers(32, 256, N).astype(np.int32)

    proj = np.random.default_rng(99).standard_normal(
        (RESIZE * RESIZE * 3, FEAT_DIM)
    ).astype(np.float32)

    feats_q, decoded = [], []
    for pl, w, h in zip(payloads, widths, heights):
        seed = int.from_bytes(hashlib.blake2b(pl, digest_size=8).digest(), "little")
        img = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        yi = (np.arange(RESIZE) * h // RESIZE).clip(0, h - 1)
        xi = (np.arange(RESIZE) * w // RESIZE).clip(0, w - 1)
        small = img[yi][:, xi].astype(np.float32).ravel() / 255.0
        feat = small @ proj
        feats_q.append(np.round(feat * SCALE).astype(np.int64).tolist())
        decoded.append(True)

    out = pa.table(
        {
            "media_id": pa.array(np.arange(N, dtype=np.int64)),
            "decoded": pa.array(decoded),
            "feature_q": pa.array(feats_q, pa.list_(pa.int64())),
        }
    )
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
    os.makedirs(d, exist_ok=True)
    pq.write_table(out, os.path.join(d, f"multimodal_features_{N}.parquet"))
    print(f"wrote {d}/multimodal_features_{N}.parquet ({out.num_rows} rows)")


if __name__ == "__main__":
    main()
