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


def test_resize_media_nn_rule(spark):
    import json

    from refined_spark.operators.multimodal import (
        _decode_image_impl,
        resize_media,
        synth_media_rows,
    )

    media = synth_media_table(spark, 12)
    out = resize_media(media, out_w=4, out_h=4).collect()
    images = [r for r in synth_media_rows(12) if r[1] == "image"]
    assert len(out) == len(images) and len(out) > 0
    by_id = {r["media_id"]: r for r in out}
    # naive per-pixel replay of the truncation rule vs the numpy grids
    for m_id, _k, payload, *_rest in images:
        img = _decode_image_impl(bytes(payload))
        want = []
        for oy in range(4):
            for ox in range(4):
                sy, sx = (oy * img.shape[0]) // 4, (ox * img.shape[1]) // 4
                want.extend(int(img[sy, sx, c]) for c in range(3))
        r = by_id[m_id]
        assert json.loads(r["px_json"]) == want
        assert (r["src_w"], r["src_h"], r["out_w"], r["out_h"],
                r["decode_ok"]) == (8, 8, 4, 4, "ok")


def test_sample_frames_stride_rule(spark):
    from refined_spark.operators.multimodal import (
        FRAME_MS,
        sample_frames,
        synth_media_rows,
        uniform_frame_indices,
    )

    media = synth_media_table(spark, 24)
    out = sample_frames(media, n_frames=4).collect()
    videos = {r[0]: r for r in synth_media_rows(24) if r[1] == "video"}
    assert {r["media_id"] for r in out} == set(videos)
    groups: dict[str, list] = {}
    for r in out:
        groups.setdefault(r["media_id"], []).append(r)
    for m_id, rows in groups.items():
        n_total = max(1, videos[m_id][6] // FRAME_MS)
        idxs = sorted(r["frame_idx"] for r in rows)
        assert idxs == uniform_frame_indices(n_total, 4)
        if n_total >= 4:
            # endpoints included, exactly n_frames rows
            assert idxs[0] == 0 and idxs[-1] == n_total - 1
            assert len(idxs) == 4
        for r in rows:
            assert r["ts_ms"] == r["frame_idx"] * FRAME_MS
            assert r["n_total_frames"] == n_total
            assert len(r["frame_digest"]) == 16


def test_uniform_frame_indices_edges():
    from refined_spark.operators.multimodal import uniform_frame_indices

    assert uniform_frame_indices(1, 4) == [0]          # single-frame clip
    assert uniform_frame_indices(10, 1) == [0]         # single sample
    assert uniform_frame_indices(2, 4) == [0, 1]       # T < n dedups
    assert uniform_frame_indices(100, 4) == [0, 33, 66, 99]


def test_repetition_signals_known_values(spark):
    """Gopher repetition signals against hand-computed values — the
    multi-line fixture makes dup_line_frac non-vacuous (the driver
    corpus is single-line, so its gate covers only the word signal)."""
    from refined_spark.operators.textstats import (
        top_ngram_fraction,
        with_repetition,
    )

    rows = [
        # 6 words, 4 distinct -> dup_word 2/6; bigrams: "a b","b a",
        # "a b","b c","c d" -> top "a b" 2 of 5
        ("d1", "a b a b c d"),
        # 3 lines, one duplicated -> dup_line 1/3; words all distinct
        ("d2", "x y\nz w\nx y"),
        ("d3", "unique"),          # 1 word: no bigrams -> 0.0
        ("d4", ""),                # degenerate
        ("d5", "The the THE"),     # case-folded dups: 2/3
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r
           for r in top_ngram_fraction(with_repetition(df), n=2).collect()}

    assert abs(out["d1"]["dup_word_frac"] - 2 / 6) < 1e-12
    assert out["d1"]["dup_line_frac"] == 0.0
    assert abs(out["d1"]["top_2gram_frac"] - 2 / 5) < 1e-12

    assert abs(out["d2"]["dup_line_frac"] - 1 / 3) < 1e-12
    # \s+ spans the newlines: words are [x,y,z,w,x,y] -> 2 dups of 6
    assert abs(out["d2"]["dup_word_frac"] - 2 / 6) < 1e-12
    # d2 bigrams: "x y","y z","z w","w x","x y" -> 2/5
    assert abs(out["d2"]["top_2gram_frac"] - 2 / 5) < 1e-12

    assert out["d3"]["top_2gram_frac"] == 0.0
    assert out["d3"]["dup_word_frac"] == 0.0
    assert out["d4"]["top_2gram_frac"] == 0.0
    assert abs(out["d5"]["dup_word_frac"] - 2 / 3) < 1e-12


def test_top_ngram_fraction_trigram_and_plan(spark):
    """n=3 path + the scale shape: gram build must not shuffle (grams
    explode in the scan stage; the only exchanges are the two agg
    keys and the join back)."""
    from refined_spark.operators.textstats import top_ngram_fraction

    df = spark.createDataFrame(
        [("d1", "p q r p q r p q r"), ("d2", "a b")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r
           for r in top_ngram_fraction(df, n=3).collect()}
    # d1 trigrams: pqr,qrp,rpq,pqr,qrp,rpq,pqr -> top "p q r" 3 of 7
    assert abs(out["d1"]["top_3gram_frac"] - 3 / 7) < 1e-12
    assert out["d2"]["top_3gram_frac"] == 0.0  # 2 words < n
