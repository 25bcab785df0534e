"""Text-analysis column ops + multimodal plumbing."""

import pyspark.sql.functions as F

from refined_spark.operators.multimodal import (
    extract_media_features,
    synth_media_table,
)
from refined_spark.operators.textstats import (
    with_fingerprint,
    with_lang_id,
    with_quality,
    with_token_count,
)


def test_lang_id(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog of to in"),
         (2, "der hund und die katze nicht"),
         (3, "le chat et la mer les des"),
         (4, "xyzzy plugh")],
        "id: long, text: string")
    out = {r["id"]: r["lang_pred"] for r in with_lang_id(df).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_token_count_and_quality(spark):
    df = spark.createDataFrame([(1, "Hello, world! The answer is 42.")],
                               "id: long, text: string")
    r = with_quality(with_token_count(df)).collect()[0]
    # tokens: Hello , world ! The answer is 42 .
    assert r["n_tokens"] == 9
    assert r["n_chars"] == 31
    assert 0.0 <= r["quality_score"] <= 1.0


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [(1, "a  b\tc"), (2, " a b c "), (3, "a b d")],
        "id: long, text: string")
    out = {r["id"]: r["fingerprint"]
           for r in with_fingerprint(df).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_media_feature_plumbing(spark):
    media = synth_media_table(spark, 12)
    out = extract_media_features(media, feat_dim=16).collect()
    assert len(out) == 12
    for r in out:
        assert r["decode_ok"] == "ok"
        assert len(r["feat"]) == 16
        assert all(0.0 <= x <= 1.0 for x in r["feat"])
    # determinism
    again = extract_media_features(media, feat_dim=16).collect()
    assert sorted(map(str, out)) == sorted(map(str, again))
