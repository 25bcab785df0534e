"""Text analysis operators for training-data pipelines: language-ID,
quality scoring, token counting, document fingerprinting.

All four are pure Column expressions (WholeStageCodegen, zero UDFs) so the
formulas are by construction reproducible in the DuckDB oracle and free at
scale (they fuse into the parquet scan's projection).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets (n-gram-heuristic language ID)
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "las", "una", "por"],
}


def _count_word(text: Column, word: str) -> Column:
    # count of whole-word occurrences, case-insensitive
    return F.size(F.regexp_extract_all(
        F.lower(text), F.lit(rf"\b{word}\b"), 0))


def lang_scores(text: Column) -> dict[str, Column]:
    return {
        lang: sum((_count_word(text, w) for w in words), F.lit(0))
        for lang, words in _LANG_MARKERS.items()
    }


def with_lang_id(df: DataFrame, text_col: str = "text",
                 out_col: str = "lang_pred") -> DataFrame:
    """Marker-word vote; ties/zero evidence → 'und' (undetermined)."""
    scores = lang_scores(F.col(text_col))
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    # deterministic priority order on ties: reverse so earlier keys win
    for lang in reversed(list(scores)):
        pred = F.when((scores[lang] == best) & (best > 0),
                      F.lit(lang)).otherwise(pred)
    return df.withColumn(out_col, pred)


def with_token_count(df: DataFrame, text_col: str = "text",
                     out_col: str = "n_tokens") -> DataFrame:
    """Whitespace token count (the BPE-ish proxy: words + punct runs)."""
    toks = F.size(F.regexp_extract_all(
        F.col(text_col), F.lit(r"[A-Za-z0-9]+|[^\sA-Za-z0-9]"), 0))
    return df.withColumn(out_col, toks)


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality features + a
    composite [0,1] score (heuristics in the C4/Gopher-rule style)."""
    t = F.col(text_col)
    # ALL length atoms run over the TRIMMED text: leading/trailing
    # whitespace otherwise inflates n_chars (deflating alpha_ratio) and
    # yields empty edge word tokens (inflating n_words, deflating
    # stop_ratio/mean_word_len) — web text is routinely padded, and the
    # skew propagated into host condemnation (r5 review, live-confirmed:
    # '  the cat  ' scored 0.873 vs 1.0 for 'the cat')
    trimmed = F.trim(t)
    n_chars = F.length(trimmed)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    n_words = F.when(trimmed.isNull() | (trimmed == ""),
                     F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+")))
    n_stop = sum((_count_word(t, w) for w in _LANG_MARKERS["en"]), F.lit(0))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(0.0)
    mean_word_len = F.when(n_words > 0, n_alpha / n_words).otherwise(0.0)
    score = (
        F.lit(0.4) * F.least(alpha_ratio * F.lit(1.25), F.lit(1.0))
        + F.lit(0.3) * F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * F.lit(4.0),
                                             F.lit(1.0)))
    )
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("alpha_ratio", alpha_ratio)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stop_ratio", stop_ratio)
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("quality_score", score)
    )


def with_fingerprint(df: DataFrame, text_col: str = "text",
                     out_col: str = "fingerprint") -> DataFrame:
    """Deterministic 64-bit content fingerprint (xxhash64 of the
    whitespace-canonicalized text) — the rolling-hash doc identity used
    for incremental dedup manifests."""
    canon = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.withColumn(out_col, F.xxhash64(canon))


def with_repetition(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-rule repetition signals, the in-row half: fraction of
    duplicate words and duplicate lines (Rae et al. 2021, "Scaling
    Language Models" §A1.1 repetition filters — a document repeating
    itself is low-quality training data regardless of its other stats).

    Both are collection expressions over one split (size vs
    array_distinct size) — no UDF, no shuffle, fuses into the scan like
    the other per-doc stats. Line-level is 0.0 by construction on a
    single-line corpus; the pytest fixture gates it on multi-line docs,
    the driver gate on the (always-meaningful) word-level signal.
    """
    t = F.col(text_col)
    words = F.split(F.lower(F.trim(t)), r"\s+")
    n_w = F.size(words)
    dup_w = F.when(
        n_w > 0,
        (n_w - F.size(F.array_distinct(words))).cast("double") / n_w
    ).otherwise(0.0)
    lines = F.split(t, r"\n")
    n_l = F.size(lines)
    dup_l = F.when(
        n_l > 0,
        (n_l - F.size(F.array_distinct(lines))).cast("double") / n_l
    ).otherwise(0.0)
    return (df.withColumn("dup_word_frac", dup_w)
            .withColumn("dup_line_frac", dup_l))


def top_ngram_fraction(df: DataFrame, n: int = 2, text_col: str = "text",
                       id_col: str = "doc_id",
                       out_col: str | None = None,
                       attach: bool = True) -> DataFrame:
    """The other Gopher repetition signal: the fraction of a document's
    word n-grams accounted for by its single most frequent n-gram
    (templated / boilerplate text scores high).

    Shape at scale: gram rows explode WITHIN their scan partition (no
    shuffle to build them), then ONE map-side-combining aggregation
    keyed (doc, gram) and a second tiny one keyed doc — the same
    physics as the MinHash signature aggregation. The per-doc result
    joins back onto ``df`` by ``id_col``; docs with fewer than ``n``
    words get 0.0. In-row alternatives (a HOF frequency count) are
    O(words²) per document and interpreted — wrong at web scale.

    ``attach=False`` returns just the per-doc ``(id_col, out_col)``
    frame (docs with no n-grams absent): at corpus scale, attach the
    scalar frame to an already-projected metrics frame instead of
    letting the default join shuffle the full corpus rows — ``text``
    should never cross an exchange for a scalar statistic.
    """
    out_col = out_col or f"top_{n}gram_frac"
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = F.when(
        F.size(F.col("_ws")) >= n,
        F.expr(
            "transform(sequence(1, size(_ws) - %d),"
            " i -> concat_ws(' ', slice(_ws, i, %d)))" % (n - 1, n)),
    ).otherwise(F.array().cast("array<string>"))
    gram_rows = (df.select(F.col(id_col).alias("_id"),
                           words.alias("_ws"))
                 .select("_id", F.explode(grams).alias("gram")))
    per_doc = (gram_rows.groupBy("_id", "gram")
               .agg(F.count(F.lit(1)).alias("cnt"))
               .groupBy("_id")
               .agg((F.max("cnt") / F.sum("cnt")).alias(out_col)))
    if not attach:
        return per_doc.withColumnRenamed("_id", id_col)
    return (df.join(per_doc, df[id_col] == per_doc["_id"], "left")
            .drop("_id")
            .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(0.0))))
