"""fp16-at-rest entity embeddings (functions/fp16.py) — the reference's
documented half-precision trade (preprocessor.py:188-200)."""

import os

import numpy as np
import pytest

from refined_spark.functions.fp16 import (
    read_entity_emb_fp16,
    write_entity_emb_fp16,
)


def test_round_trip_and_size(spark, fx_t1, tmp_path_factory):
    emb = spark.read.parquet(os.path.join(fx_t1, "entity_emb.parquet"))
    path = str(tmp_path_factory.mktemp("fp16") / "emb")
    write_entity_emb_fp16(emb, path)
    back = read_entity_emb_fp16(spark, path)

    a = {r["qcode_idx"]: np.asarray(r["desc_emb"], dtype=np.float32)
         for r in emb.collect()}
    b = {r["qcode_idx"]: np.asarray(r["desc_emb"], dtype=np.float32)
         for r in back.collect()}
    assert a.keys() == b.keys()
    for k in a:
        # decode is exact; the only error is the one-time fp16 rounding
        assert np.array_equal(b[k],
                              a[k].astype(np.float16).astype(np.float32))
        assert np.allclose(a[k], b[k], rtol=2e-3, atol=1e-4)

    def du(p):
        if os.path.isfile(p):  # fixture tables are single files
            return os.path.getsize(p)
        return sum(os.path.getsize(os.path.join(root, f))
                   for root, _d, fs in os.walk(p) for f in fs
                   if ".parquet" in f)

    # at-rest halving is the point; parquet framing overhead keeps the
    # ratio shy of exactly 2x on a tiny fixture
    fp32_bytes = du(os.path.join(fx_t1, "entity_emb.parquet"))
    fp16_bytes = du(path)
    assert fp16_bytes < 0.7 * fp32_bytes


def test_pipeline_parity_fp16(spark, fx_t1):
    """Links must be identical on the fixture corpus; desc-dependent
    scores within fp16 tolerance (the fixture margins dwarf 1e-3
    relative rounding)."""
    from refined_spark.pipeline import run_pipeline

    res32 = run_pipeline(spark, fx_t1, mode="spans")
    res16 = run_pipeline(spark, fx_t1, mode="spans", emb_precision="fp16")
    l32 = {(r["url"], r["start"]): (r["pred_qcode"], r["confidence"])
           for r in res32["links"].collect()}
    l16 = {(r["url"], r["start"]): (r["pred_qcode"], r["confidence"])
           for r in res16["links"].collect()}
    assert l32.keys() == l16.keys() and l32
    for k, (q32, c32) in l32.items():
        q16, c16 = l16[k]
        assert q16 == q32
        assert c16 == pytest.approx(c32, rel=5e-3, abs=1e-4)
    res32["unpersist"]()
    res16["unpersist"]()
