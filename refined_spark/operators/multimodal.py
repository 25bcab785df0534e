"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The Spark-side plumbing (schemas, batching, partition sizing) is real and
tested; the codec step is stubbed behind a deterministic fake (the
image/audio libraries are not in this container) with a clearly marked
seam — swap ``_decode_image_impl`` for a Pillow/ffmpeg call in production.

Pattern: ``mapInPandas`` over an iterator of Arrow batches so decode can
stream without materializing a partition in memory; batch shape is
controlled by ``spark.sql.execution.arrow.maxRecordsPerBatch``. Binary
payloads dominate partition size, so pipelines carrying media should set
``spark.sql.files.maxPartitionBytes`` low (64-128m) — decode output is
usually larger than input.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    FloatType,
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("payload", BinaryType()),
    StructField("mime", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("kind", StringType()),
    StructField("feat", ArrayType(FloatType())),
    StructField("feat_json", StringType()),   # rounded JSON — oracle-able
    StructField("feat_dim", IntegerType()),
    StructField("decode_ok", StringType()),
])


def _decode_image_impl(payload: bytes) -> np.ndarray:
    """STUB: deterministic fake decode (replace with Pillow in production).

    Real implementation would be::

        from PIL import Image
        import io
        arr = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))

    The fake derives a stable 3x8x8 'thumbnail' from the payload hash so
    downstream plumbing (shapes, batching, feature math) is exercised.
    """
    if payload is None:
        raise NotImplementedError("no payload")
    digest = hashlib.sha256(bytes(payload)).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def pooled_feature(payload: bytes, feat_dim: int) -> list[float]:
    """Decode + mean-pool + tile to feat_dim, scaled to [0,1]. Shared by the
    Spark operator and the fixture-golden generator (which recomputes the
    POOLING independently; only the codec stub is shared)."""
    img = _decode_image_impl(payload)
    # float64 end-to-end: (int_sum / n_px) / 255 is bit-deterministic, so an
    # independent recompute (the fixture golden) matches exactly
    pooled = img.astype(np.float64).mean(axis=(0, 1))  # RGB
    reps = int(np.ceil(feat_dim / pooled.shape[0]))
    feat = np.tile(pooled, reps)[:feat_dim] / 255.0
    return [float(x) for x in feat]


def feat_to_json(feat: list[float] | None) -> str | None:
    """Canonical rounded-JSON rendering of a feature vector (the value the
    driver's canonicalizer can sort/hash — ARRAY<FLOAT> columns are not
    hashable there)."""
    import json

    if feat is None:
        return None
    return json.dumps([round(float(x), 6) for x in feat])


def extract_media_features(media: DataFrame,
                           feat_dim: int = 16) -> DataFrame:
    """Decode + pooled feature per media row, streaming Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload in pdf["payload"]:
                try:
                    feats.append(pooled_feature(payload, feat_dim))
                    oks.append("ok")
                except NotImplementedError:
                    feats.append(None)
                    oks.append("decode_unavailable")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feat": feats,
                "feat_json": [feat_to_json(f) for f in feats],
                "feat_dim": feat_dim,
                "decode_ok": oks,
            })

    return media.mapInPandas(run, FEATURE_SCHEMA)


def synth_media_rows(n: int = 64) -> list[tuple]:
    """Deterministic fake media rows (binary payload = seeded); shared by
    tests and the fixture generator."""
    rows = []
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(
            np.random.SeedSequence([99, i])))
        payload = rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()
        kind = ["image", "audio", "video"][i % 3]
        rows.append((f"m{i:05d}", kind, bytearray(payload),
                     {"image": "image/png", "audio": "audio/wav",
                      "video": "video/mp4"}[kind],
                     64, 64, 1000 * (i % 30 + 1)))
    return rows


def synth_media_table(spark, n: int = 64) -> DataFrame:
    return spark.createDataFrame(synth_media_rows(n), MEDIA_SCHEMA)
