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
                # catch ANY decode failure, not just the stub's
                # NotImplementedError: the documented production swap
                # (Pillow etc.) raises codec-specific errors on
                # non-image bytes, and one bad row must yield a
                # decode_unavailable row, not kill the job (kind
                # routing belongs behind the codec seam)
                try:
                    feats.append(pooled_feature(payload, feat_dim))
                    oks.append("ok")
                except Exception:  # noqa: BLE001 — decode contract
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

    # explicit projection so the scan prunes to exactly the UDF's inputs
    # (mapInPandas ships every column it is handed into Python)
    return media.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURE_SCHEMA)


# --------------------------------------------------------------------------
# resize (images) and frame sampling (video) — the remaining two multimodal
# verbs of the build brief ("decode / feature-extract / resize /
# frame-sample"). Same stub-codec seam as extract_media_features: the
# decode is a deterministic fake, the resize / sampling MATH and the Spark
# plumbing (declarative kind filter pushed to the scan, mapInPandas
# streaming, 1->N row fan-out for frames) are real.
# --------------------------------------------------------------------------

RESIZE_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("kind", StringType()),
    StructField("src_w", IntegerType()),
    StructField("src_h", IntegerType()),
    StructField("out_w", IntegerType()),
    StructField("out_h", IntegerType()),
    StructField("px_json", StringType()),     # row-major RGB ints — oracle-able
    StructField("decode_ok", StringType()),
])

FRAME_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("n_total_frames", IntegerType()),
    StructField("frame_idx", IntegerType()),
    StructField("ts_ms", IntegerType()),
    StructField("frame_digest", StringType()),  # sha256[:16] of frame bytes
])

#: stub codec frame rate: a fake video has duration_ms // FRAME_MS frames.
FRAME_MS = 100


def nn_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize with the integer truncation rule
    ``src_i = (dst_i * src) // dst`` (OpenCV INTER_NEAREST's scale-truncate;
    exactly replayable in pure Python / SQL — no float rounding to match)."""
    src_h, src_w = img.shape[:2]
    ri = (np.arange(out_h) * src_h) // out_h
    ci = (np.arange(out_w) * src_w) // out_w
    return img[ri][:, ci]


def resize_media(media: DataFrame, out_w: int = 4,
                 out_h: int = 4) -> DataFrame:
    """Decode + nearest-neighbor resize per IMAGE row.

    The ``kind == 'image'`` filter is declarative (pushed to the scan, so
    audio/video payload bytes are never shipped to Python); decode streams
    Arrow batches through ``mapInPandas``. Output pixels surface as
    row-major rounded-JSON so the fixture oracle can compare values.
    Reference analog: preprocessing in
    /root/reference/src/refined/inference/processor.py feeds fixed-shape
    tensors the same way (resize-at-ingest, not at-score).
    """
    import json

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "kind", "src_w", "src_h",
                                   "px_json", "decode_ok")}
            for media_id, kind, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"]):
                try:
                    img = _decode_image_impl(payload)
                    small = nn_resize(img, out_w, out_h)
                    px = json.dumps(small.reshape(-1).tolist())
                    src_h, src_w, ok = img.shape[0], img.shape[1], "ok"
                except NotImplementedError:
                    px, src_h, src_w, ok = None, None, None, "decode_unavailable"
                out["media_id"].append(media_id)
                out["kind"].append(kind)
                out["src_w"].append(src_w)
                out["src_h"].append(src_h)
                out["px_json"].append(px)
                out["decode_ok"].append(ok)
            yield pd.DataFrame({
                "media_id": out["media_id"], "kind": out["kind"],
                "src_w": pd.array(out["src_w"], dtype="Int32"),
                "src_h": pd.array(out["src_h"], dtype="Int32"),
                "out_w": out_w, "out_h": out_h,
                "px_json": out["px_json"], "decode_ok": out["decode_ok"],
            })

    from pyspark.sql import functions as F

    return media.filter(F.col("kind") == "image").select(
        "media_id", "kind", "payload").mapInPandas(run, RESIZE_SCHEMA)


def _decode_frame_impl(payload: bytes, frame_idx: int) -> np.ndarray:
    """STUB: deterministic fake video-frame decode (replace with an ffmpeg
    seek+decode in production). Frame = stable 8x8x3 array seeded from
    (payload digest, frame index) so two samplings of the same frame agree
    byte-for-byte."""
    if payload is None:
        raise NotImplementedError("no payload")
    digest = hashlib.sha256(
        bytes(payload) + int(frame_idx).to_bytes(4, "little")).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def uniform_frame_indices(n_total: int, n_frames: int) -> list[int]:
    """Endpoint-inclusive uniform stride: ``idx_i = (i*(T-1)) // (n-1)``,
    deduped (a short clip with T < n yields T rows, not padded repeats)."""
    if n_total <= 1 or n_frames <= 1:
        return [0]
    return sorted({(i * (n_total - 1)) // (n_frames - 1)
                   for i in range(n_frames)})


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Uniform frame sampling per VIDEO row: one OUTPUT row per sampled
    frame (the 1->N fan-out shape a frame-level training pipeline needs).

    Total frame count comes from the stub codec's duration rule
    (``duration_ms // FRAME_MS``, i.e. 10 fps); a real decoder would read
    it from the container header. Frames surface as short digests — the
    decode bytes stay in the executor, only frame-scale metadata rows
    shuffle, which is the property that matters at 10^9 videos.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "n_total_frames",
                                    "frame_idx", "ts_ms", "frame_digest")}
            for media_id, payload, dur in zip(
                    pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                # NULL payload/duration (legal under MEDIA_SCHEMA) must
                # not crash the task (int(NaN) / decode of None): such a
                # row yields zero frames — the fan-out analog of the
                # siblings' decode_unavailable rows
                if payload is None or dur is None or pd.isna(dur):
                    continue
                n_total = max(1, int(dur) // FRAME_MS)
                for fi in uniform_frame_indices(n_total, n_frames):
                    try:
                        frame = _decode_frame_impl(payload, fi)
                    except Exception:  # noqa: BLE001 — decode contract
                        continue
                    rows["media_id"].append(media_id)
                    rows["n_total_frames"].append(n_total)
                    rows["frame_idx"].append(fi)
                    rows["ts_ms"].append(fi * FRAME_MS)
                    rows["frame_digest"].append(
                        hashlib.sha256(frame.tobytes()).hexdigest()[:16])
            yield pd.DataFrame({
                "media_id": rows["media_id"],
                "n_total_frames": pd.array(rows["n_total_frames"],
                                           dtype="Int32"),
                "frame_idx": pd.array(rows["frame_idx"], dtype="Int32"),
                "ts_ms": pd.array(rows["ts_ms"], dtype="Int32"),
                "frame_digest": rows["frame_digest"],
            })

    from pyspark.sql import functions as F

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload", "duration_ms").mapInPandas(run, FRAME_SCHEMA)


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
