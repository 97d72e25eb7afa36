"""Multimodal columns — images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: schema, partition-friendly
``mapInPandas`` batch shape, Arrow binary transfer, and a deterministic
fake feature extractor. The actual codec step is STUBBED: the sandbox image
has no image/audio libraries, so ``decode_image`` raises
``NotImplementedError`` unless Pillow is importable (import-try gate).
Swapping the fake for a real decoder changes one function, not the plan.

Media table schema:
    media(media_id: long, kind: string, payload: binary,
          meta: map<string,string>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = "media_id long, kind string, payload binary, meta map<string,string>"
FEATURES_SCHEMA = (
    "media_id long, kind string, width int, height int, n_bytes int, "
    "mean_intensity double, feature array<float>"
)

try:  # pragma: no cover - not installed in the sandbox
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode path — unavailable in this container (no Pillow)."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decoding requires Pillow, which is not installed in this "
            "environment; use fake_decode (deterministic) or install PIL"
        )
    import io

    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(payload)))


def fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for a decoder: (width, height,
    mean_intensity) derived from the payload digest — lets the whole
    pipeline (schema, batching, downstream joins) be exercised for real."""
    d = hashlib.md5(payload).digest()
    width = 16 + d[0] % 240
    height = 16 + d[1] % 240
    mean = int.from_bytes(d[2:4], "big") / 65535.0
    return width, height, mean


def generate_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payloads)."""
    kinds = ["image", "audio", "video"]

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_list()
            rows = {
                "media_id": ids,
                "kind": [kinds[i % 3] for i in ids],
                "payload": [
                    hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 5)
                    for i in ids
                ],
                "meta": [{"seed": str(seed), "idx": str(i)} for i in ids],
            }
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def extract_features(
    media: DataFrame, feat_dim: int = 8, decoder: str = "fake"
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``decoder="fake"`` (default) uses the deterministic digest-derived
    stand-in; ``decoder="real"`` decodes with Pillow on the EXECUTORS
    (detected at runtime — raises NotImplementedError where absent); the
    batch shape — one pandas frame of binary payloads in, one frame of
    fixed-width features out — is identical for both, so swapping decoders
    changes zero plan structure."""
    if decoder not in ("fake", "real"):
        raise ValueError(f"decoder must be 'fake' or 'real', got {decoder!r}")
    use_real = decoder == "real"

    def _decode(raw: bytes) -> tuple[int, int, float]:
        if use_real:
            arr = decode_image(raw)
            h, w = arr.shape[0], arr.shape[1]
            return w, h, float(arr.mean()) / 255.0
        return fake_decode(raw)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            widths, heights, nbytes, means, feats = [], [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                w, h, mean = _decode(raw)
                widths.append(w)
                heights.append(h)
                nbytes.append(len(raw))
                means.append(mean)
                d = hashlib.sha256(raw).digest()
                feats.append(
                    np.frombuffer(d[: 4 * feat_dim], dtype=np.uint8)[:feat_dim]
                    .astype(np.float32)
                    / 255.0
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": widths,
                    "height": heights,
                    "n_bytes": nbytes,
                    "mean_intensity": means,
                    "feature": feats,
                }
            )

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)
