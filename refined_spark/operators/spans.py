"""E3/E6/E7/E8 — span hygiene operators.

- correct_spans: the reference's span corrections
  (/root/reference/src/refined/utilities/general_utils.py:144-211):
  drop 1-char / newline-only / "the" spans; strip up to two leading and
  trailing newlines and unbalanced quotes (adjusting start/length); drop
  "the" after stripping; split a document-leading span containing one
  paragraph break into title + first-mention spans. (The reference
  mutates the list while iterating — this implements the intended rule
  set declaratively.)
- merge_spans (general_utils.py:213-238): combine additional (predicted)
  spans with prioritised (provided) spans, dropping any additional span
  that overlaps a prioritised one.
- split_sentences: offset-preserving sentence segmentation (E3) via a
  shared RE2-compatible chunk regex; offsets computed in-row (aggregate
  HOF — no shuffle).
- decode_bio (E8): token BIO tags -> spans, lenient decode (an I after O
  opens a new span), pure window/groupBy relational work.

All four are Column/window compositions — no UDFs; at corpus scale they
fuse into the scan (corrections, sentences) or cost one url-partitioned
window (BIO, merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SENT_RE = r"[^.!?]+[.!?]*\s*"


def correct_spans(spans: DataFrame) -> DataFrame:
    """spans: (url, start, length, text) -> corrected spans (same shape).
    """
    df = spans
    # initial drops on the ORIGINAL text
    df = df.where(~(
        (F.length("text") == 1)
        | F.col("text").isin("\n\n", "\n\n\n", "\n\n\n\n", "the")
    ))
    # reference parity (general_utils.py:159): the len > 2 eligibility
    # check runs ONCE, before any strip — the strips themselves apply
    # unconditionally on the shrinking text ('\na\n' strips to 'a',
    # not to 'a\n'; a re-derived per-strip length guard blocked the
    # trailing strip at len 2 — r5 review)
    df = df.withColumn("_elig", F.length("text") > 2)

    # unrolled strips (reference checks each rule twice for newlines)
    def strip_lead(df):
        cond = F.col("_elig") & (F.substring("text", 1, 1) == "\n")
        return df.withColumn(
            "start", F.when(cond, F.col("start") + 1).otherwise(F.col("start"))
        ).withColumn(
            "length", F.when(cond, F.col("length") - 1).otherwise(F.col("length"))
        ).withColumn(
            "text", F.when(cond, F.expr("substring(text, 2)"))
            .otherwise(F.col("text")))

    def strip_trail(df):
        cond = (F.col("_elig")
                & (F.substring("text", -1, 1) == "\n"))
        return df.withColumn(
            "length", F.when(cond, F.col("length") - 1).otherwise(F.col("length"))
        ).withColumn(
            "text", F.when(cond, F.expr("substring(text, 1, length(text)-1)"))
            .otherwise(F.col("text")))

    df = strip_lead(strip_lead(df))
    df = strip_trail(strip_trail(df))

    lead_q = (F.col("_elig") & (F.substring("text", 1, 1) == '"')
              & (F.substring("text", -1, 1) != '"'))
    df = (df.withColumn("start", F.when(lead_q, F.col("start") + 1)
                        .otherwise(F.col("start")))
          .withColumn("length", F.when(lead_q, F.col("length") - 1)
                      .otherwise(F.col("length")))
          .withColumn("text", F.when(lead_q, F.expr("substring(text, 2)"))
                      .otherwise(F.col("text"))))
    trail_q = (F.col("_elig") & (F.substring("text", -1, 1) == '"')
               & (F.substring("text", 1, 1) != '"'))
    df = (df.withColumn("length", F.when(trail_q, F.col("length") - 1)
                        .otherwise(F.col("length")))
          .withColumn("text",
                      F.when(trail_q,
                             F.expr("substring(text, 1, length(text)-1)"))
                      .otherwise(F.col("text"))))

    # title/first-mention split: document-leading span with exactly one
    # paragraph break becomes two MENTION spans. The post-strip
    # `text != 'the'` drop (reference order: after the quote strips,
    # before the split) is FOLDED INTO the explode input — a NULL array
    # explodes to zero rows — rather than expressed as a where():
    # filter pushdown substitutes aliases with no cost guard, and the
    # pushed predicate re-composed the whole 6-step strip chain into one
    # ~450 KB Filter expression that overflowed janino's 64 KB method
    # limit (whole-stage codegen silently fell back to interpreted for
    # the span-correction stage; measured round 4). Generate input
    # expressions are not subject to predicate pushdown, so the chain
    # stays one step per Project.
    pieces = F.split("text", "\n\n")
    splittable = ((F.col("start") == 0) & (F.size(pieces) == 2)
                  & F.col("_elig"))
    parts = F.when(F.col("text") != "the", F.when(splittable, F.array(
        F.struct(F.lit(0).alias("p_start"),
                 F.element_at(pieces, 1).alias("p_text")),
        F.struct((F.locate("\n\n", F.col("text")) + 1).alias("p_start"),
                 F.element_at(pieces, 2).alias("p_text")),
    )).otherwise(F.array(F.struct(F.col("start").alias("p_start"),
                                  F.col("text").alias("p_text")))))
    return (
        df.select("url", F.explode(parts).alias("p"))
        .select("url",
                F.col("p.p_start").cast("int").alias("start"),
                F.length("p.p_text").cast("int").alias("length"),
                F.col("p.p_text").alias("text"))
    )


def merge_spans(additional: DataFrame, prioritised: DataFrame) -> DataFrame:
    """E7 — union with prioritised overlap resolution: an additional span
    survives only if it overlaps NO prioritised span of the same url.
    Anti range-join on url (co-partitioned with the span shuffle)."""
    p = prioritised.select(F.col("url").alias("p_url"),
                           F.col("start").alias("p_start"),
                           F.col("length").alias("p_length"))
    overlap = ((F.col("url") == F.col("p_url"))
               & (F.col("start") < F.col("p_start") + F.col("p_length"))
               & (F.col("p_start") < F.col("start") + F.col("length")))
    kept = additional.join(p, overlap, "left_anti")
    return (prioritised.select("url", "start", "length", "text")
            .withColumn("from_prioritised", F.lit(True))
            .unionByName(kept.select("url", "start", "length", "text")
                         .withColumn("from_prioritised", F.lit(False))))


def split_sentences(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """E3 — (url, text) -> (url, sent_idx, sent_start, sentence).
    Chunk regex keeps terminators + trailing whitespace; offsets come
    from an in-row position-search fold (zero shuffle), so characters
    the chunk regex skips cannot shift later offsets; emitted sentences
    are trimmed (sent_start points at the trimmed first character),
    empty chunks dropped.

    The pattern is passed as a Column literal (Python API), NOT
    interpolated into an F.expr SQL string: Spark's SQL parser unescapes
    string literals, so an embedded ``\\s`` would degrade to a plain
    ``s`` and the chunk regex would stop consuming trailing whitespace,
    shifting every subsequent sentence offset (round-2 advisor repro)."""
    chunks = F.regexp_extract_all(F.col(text_col), F.lit(SENT_RE), F.lit(0))
    d = docs.select("url", F.col(text_col).alias("_t"),
                    chunks.alias("chunks"))
    # offsets by POSITION SEARCH, not a blind prefix-sum of chunk
    # lengths: any character the chunk regex skips (a leading '!', a
    # run of bare terminators) would shift every subsequent offset
    # (r5 review, simulated: '!Hello. World.' put 'Hello.' at 0, real
    # position 1). locate() from the previous chunk's end finds each
    # chunk's true start; monotone search keeps repeated sentences
    # aligned to their own instances.
    offs = F.expr("""
        aggregate(chunks, struct(cast(array() as array<int>) as offs,
                                 0 as pos),
          (acc, c) -> struct(
              acc.offs || array(locate(c, _t, acc.pos + 1) - 1),
              locate(c, _t, acc.pos + 1) - 1 + length(c)),
          acc -> acc.offs)
    """)
    z = d.select("url", F.posexplode(F.arrays_zip(
        F.col("chunks").alias("chunk"), offs.alias("off"))).alias("i", "e"))
    sent = F.trim(F.col("e.chunk"))
    # the emitted sentence is trimmed — point sent_start at its first
    # character, not at the untrimmed chunk's
    lead_ws = F.length("e.chunk") - F.length(F.ltrim(F.col("e.chunk")))
    return (
        z.where(F.length(sent) > 0)
        .select("url", F.col("i").cast("int").alias("sent_idx"),
                (F.col("e.off") + lead_ws).cast("int")
                .alias("sent_start"),
                sent.alias("sentence"))
    )


def decode_bio(tokens: DataFrame) -> DataFrame:
    """E8 — (url, tok_idx, token, start, tag B|I|O) -> decoded spans
    (url, start, length, mention_text, n_tokens). Lenient: I with no open
    span starts one. seg id = running count of span-opens; one window +
    one groupBy, both partitioned by url."""
    w = Window.partitionBy("url").orderBy("tok_idx")
    prev = F.lag("tag", 1, "O").over(w)
    opens = ((F.col("tag") == "B")
             | ((F.col("tag") == "I") & (prev == "O"))).cast("int")
    seg = tokens.withColumn("seg_id", F.sum(opens).over(w))
    return (
        seg.where(F.col("tag") != "O")
        .groupBy("url", "seg_id")
        .agg(
            F.min("start").alias("start"),
            (F.max(F.col("start") + F.length("token"))
             - F.min("start")).cast("int").alias("length"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("tok_idx", "token"))),
                    lambda s: s["token"]), " ").alias("mention_text"),
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
        )
        .select("url", "start", "length", "mention_text", "n_tokens")
    )
