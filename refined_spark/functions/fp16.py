"""fp16-at-rest entity description embeddings.

The reference precomputes description embeddings for all ~33M entities
and stores them half-precision, doubling what fits in memory and halving
load time (/root/reference/src/refined/doc_preprocessing/
preprocessor.py:188-200 — "precomputed_description_embeddings" kept as
fp16 tensors). The engine analog: the ``entity_emb`` table's
``desc_emb ARRAY<FLOAT>`` column packed to an fp16 BINARY sidecar
(parquet has no half type Spark reads natively; a 2-byte-per-element
binary is the same at-rest size) and unpacked to fp32 arrays at load.

Scale story: the embedding table is the dominant resource artifact
(ref: 33M x 300 x 4B = 40 GB fp32). Halving it doubles what a broadcast
budget or an executor-side cache holds — the same trade the reference
documents. The fp16->fp32 decode is exact (every fp16 value is fp32-
representable); only the ONE-TIME fp32->fp16 rounding at write changes
scores, bounded by the format's ~1e-3 relative error.

Both directions are Arrow-batched numpy reshapes — one crossing each.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, BinaryType, FloatType


@pandas_udf(BinaryType())
def _pack_f16(arrs: pd.Series) -> pd.Series:
    # NULL rows round-trip as NULL (an entity with no description):
    # np.asarray(None) would otherwise abort the whole partition
    return arrs.map(
        lambda a: None if a is None else
        np.asarray(a, dtype=np.float32).astype(np.float16).tobytes())


@pandas_udf(ArrayType(FloatType()))
def _unpack_f16(bufs: pd.Series) -> pd.Series:
    return bufs.map(
        lambda b: None if b is None else
        np.frombuffer(b, dtype=np.float16).astype(np.float32))


def write_entity_emb_fp16(entity_emb: DataFrame, path: str) -> None:
    """entity_emb(qcode_idx, desc_emb ARRAY<FLOAT>) -> fp16 sidecar
    parquet (qcode_idx, emb_f16 BINARY) at half the at-rest size."""
    (entity_emb.select("qcode_idx",
                       _pack_f16(F.col("desc_emb")).alias("emb_f16"))
     .write.mode("overwrite").parquet(path))


def read_entity_emb_fp16(spark: SparkSession, path: str) -> DataFrame:
    """fp16 sidecar -> (qcode_idx, desc_emb ARRAY<FLOAT>) — the exact
    frame shape the scoring joins consume, values fp16-rounded."""
    return (spark.read.parquet(path)
            .select("qcode_idx",
                    _unpack_f16(F.col("emb_f16")).alias("desc_emb")))


def ensure_fp16_sidecar(spark: SparkSession, fixture_dir: str) -> str:
    """Write the sidecar next to the fixture's fp32 table if missing
    (content-stamped by the fixture dir's own versioning — the sidecar
    regenerates with the fixtures because it lives inside the dir)."""
    import os

    path = os.path.join(fixture_dir, "entity_emb_fp16.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        emb = spark.read.parquet(
            os.path.join(fixture_dir, "entity_emb.parquet"))
        write_entity_emb_fp16(emb, path)
    return path
