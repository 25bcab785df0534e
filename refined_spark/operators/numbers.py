"""Numeric special-span handlers — CARDINAL / ORDINAL / MONEY / PERCENT
/ TIME / QUANTITY.

The reference's MD head emits 17 coarse tags (B-/I- pairs over DATE,
CARDINAL, MONEY, PERCENT, TIME, ORDINAL, QUANTITY, MENTION —
/root/reference/src/refined/model_components/config.py:7-25) and routes
special spans through a handler registry
(inference/processor.py:131-134); only the DATE handler is implemented
there ("other handlers can be added here"). This module completes the
registry for the numeric types the tag set names, as the same
deterministic-grammar stand-in the engine uses for DATE (operators/
dates.py): a closed RE2-compatible grammar DETECTS candidate numeric
expressions, a priority CASE cascade assigns the coarse type, and a
declarative normalizer resolves a numeric ``value`` (+ ``unit``) where
the surface form determines one.

Everything after detection is Column work (whole-stage codegen, zero
shuffle — fuses into the scan); detection itself is one Arrow crossing
(char offsets need ``re.finditer``; Spark's regexp functions return
matches, not positions). The grammar is backref/lookaround-free by
construction so the DuckDB oracle replays the IDENTICAL patterns.

Deviations, documented: the reference's head is trained — this grammar
is closed; spans the date grammar also matches (e.g. bare ``3/4/1999``)
are emitted by BOTH handlers, as the reference's per-type span routing
would (each coarse type resolves independently); adjacency-ambiguous
words ("second" the unit-of-time vs the ordinal) resolve by the fixed
priority order below.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- grammar atoms (RE2-compatible; shared verbatim with the oracle) ---

_NUM = r"\d+(?:,\d{3})*(?:\.\d+)?"
_SCALE = r"(?:hundred|thousand|million|billion|trillion)"
_CURR_SYM = r"[$£€]"  # $ £ €
_CURR_WORD = r"(?:dollars|pounds|euros|cents)"
_UNIT = (r"(?:km|kg|mm|cm|mi|lb|oz|ft|mph|kilometres|kilometers|miles|"
         r"metres|meters|feet|kilograms|grams|tonnes|tons|litres|liters|"
         r"gallons|acres|hectares)")
_ORD_WORD = (r"(?:first|second|third|fourth|fifth|sixth|seventh|eighth|"
             r"ninth|tenth|eleventh|twelfth|twentieth|hundredth)")
_CARD_WORD = (r"(?:zero|one|two|three|four|five|six|seven|eight|nine|ten|"
              r"eleven|twelve|thirteen|fourteen|fifteen|sixteen|seventeen|"
              r"eighteen|nineteen|twenty|thirty|forty|fifty|sixty|seventy|"
              r"eighty|ninety|hundred|thousand|million|billion)")

P_PERCENT = rf"{_NUM}\s?(?:%|percent|per cent)"
P_MONEY = (rf"{_CURR_SYM}\s?{_NUM}(?:\s?{_SCALE})?"
           rf"|{_NUM}(?:\s?{_SCALE})?\s{_CURR_WORD}")
P_TIME = r"\d{1,2}:\d{2}(?::\d{2})?(?:\s?(?:am|pm))?|\d{1,2}\s?(?:am|pm)"
P_QUANTITY = rf"{_NUM}\s?{_UNIT}"
P_ORDINAL = rf"\d+(?:st|nd|rd|th)|{_ORD_WORD}"
P_CARDINAL = rf"{_NUM}(?:\s{_SCALE})?|{_CARD_WORD}"

# detection: priority-ordered alternation (leftmost-FIRST semantics are
# identical in Python re and RE2's Perl mode, which DuckDB uses — the
# same contract date_detect relies on). \b guards flank word-char ends;
# currency symbols carry their own left edge.
# the PERCENT word alternatives need their own trailing \b ('95
# percentile' must not leak a '95 percent' span — r5 review); the '%'
# symbol cannot take one (non-word char), mirroring the MONEY
# symbol/word split below
DETECT_PATTERN = (rf"\b(?:{_NUM}\s?(?:%|percent\b|per cent\b))"
                  rf"|{_CURR_SYM}\s?{_NUM}(?:\s?{_SCALE})?\b"
                  rf"|\b(?:{_NUM}(?:\s?{_SCALE})?\s{_CURR_WORD})\b"
                  rf"|\b(?:{P_TIME})\b"
                  rf"|\b(?:{P_QUANTITY})\b"
                  rf"|\b(?:{P_ORDINAL})\b"
                  rf"|\b(?:{P_CARDINAL})\b")

# classification: anchored per-type patterns, fixed priority
COARSE_TYPES = ("PERCENT", "MONEY", "TIME", "QUANTITY", "ORDINAL",
                "CARDINAL")
TYPE_PATTERNS = {
    "PERCENT": rf"^(?:{P_PERCENT})$",
    "MONEY": rf"^(?:{P_MONEY})$",
    "TIME": rf"^(?:{P_TIME})$",
    "QUANTITY": rf"^(?:{P_QUANTITY})$",
    "ORDINAL": rf"^(?:{P_ORDINAL})$",
    "CARDINAL": rf"^(?:{P_CARDINAL})$",
}

_ORD_VALUES = {w: i + 1 for i, w in enumerate(
    ["first", "second", "third", "fourth", "fifth", "sixth", "seventh",
     "eighth", "ninth", "tenth", "eleventh", "twelfth"])}
_ORD_VALUES.update({"twentieth": 20, "hundredth": 100})
_CARD_VALUES = {w: i for i, w in enumerate(
    ["zero", "one", "two", "three", "four", "five", "six", "seven",
     "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
     "fifteen", "sixteen", "seventeen", "eighteen", "nineteen"])}
_CARD_VALUES.update({"twenty": 20, "thirty": 30, "forty": 40, "fifty": 50,
                     "sixty": 60, "seventy": 70, "eighty": 80,
                     "ninety": 90, "hundred": 100, "thousand": 1_000,
                     "million": 1_000_000, "billion": 1_000_000_000})
_SCALE_VALUES = {"hundred": 100.0, "thousand": 1e3, "million": 1e6,
                 "billion": 1e9, "trillion": 1e12}


def detect_number_spans(docs: DataFrame, text_col: str = "text",
                        url_col: str = "url") -> DataFrame:
    """(url, text) -> (url, start, num_text): one row per detected
    numeric expression, char offsets, case-insensitive. Same shape and
    physics as dates.detect_date_spans — one Arrow crossing, the rest of
    the handler path is pure Column work."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    rx = re.compile(DETECT_PATTERN, re.IGNORECASE)
    schema = ArrayType(StructType([
        StructField("start", IntegerType()),
        StructField("num_text", StringType()),
    ]))

    @pandas_udf(schema)
    def find(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: [
            (m.start(), m.group(0)) for m in rx.finditer(t or "")])

    return (docs.select(F.col(url_col).alias("url"),
                        find(F.col(text_col)).alias("_m"))
            .select("url", F.explode_outer("_m").alias("m"))
            .where(F.col("m").isNotNull())
            .select("url", F.col("m.start").alias("start"),
                    F.col("m.num_text").alias("num_text")))


def _map_case(col, mapping: dict, out_type: str = "double"):
    """Closed word -> value lookup as a literal CASE chain."""
    expr = F.lit(None).cast(out_type)
    for w, v in mapping.items():
        expr = F.when(col == w, F.lit(float(v)).cast(out_type)) \
            .otherwise(expr)
    return expr


def classify_number_spans(spans: DataFrame,
                          text_col: str = "num_text") -> DataFrame:
    """+ (coarse_type, value, unit): anchored priority cascade + the
    declarative normalizer. All Column work.

    value: CARDINAL/PERCENT/MONEY/QUANTITY -> magnitude (commas stripped,
    scale words multiplied); ORDINAL -> rank; TIME -> seconds since
    midnight (am/pm applied). unit: '%' / currency token / measure unit /
    's' / NULL.
    """
    s = F.lower(F.col(text_col))

    def like(t):
        return F.regexp_like(F.col(text_col),
                             F.lit(f"(?i){TYPE_PATTERNS[t]}"))

    ctype = F.when(like("PERCENT"), "PERCENT") \
        .when(like("MONEY"), "MONEY") \
        .when(like("TIME"), "TIME") \
        .when(like("QUANTITY"), "QUANTITY") \
        .when(like("ORDINAL"), "ORDINAL") \
        .otherwise("CARDINAL")

    digits = F.nullif(
        F.regexp_replace(F.regexp_extract(s, f"({_NUM})", 1), ",", ""),
        F.lit("")).cast("double")
    scale = _map_case(F.regexp_extract(s, f"({_SCALE})", 1),
                      _SCALE_VALUES)
    magnitude = digits * F.coalesce(scale, F.lit(1.0))

    # TIME: h[:m[:s]] [am|pm]  — 12am -> 0h, 12pm -> 12h
    th = F.regexp_extract(s, r"^(\d{1,2})", 1).cast("int")
    tm = F.coalesce(F.nullif(
        F.regexp_extract(s, r":(\d{2})", 1), F.lit("")).cast("int"),
        F.lit(0))
    tsec = F.coalesce(F.nullif(
        F.regexp_extract(s, r":\d{2}:(\d{2})", 1), F.lit("")).cast("int"),
        F.lit(0))
    ampm = F.regexp_extract(s, r"(am|pm)$", 1)
    th12 = F.when(ampm != "", F.pmod(th, F.lit(12))
                  + F.when(ampm == "pm", 12).otherwise(0)).otherwise(th)
    time_val = (th12 * 3600 + tm * 60 + tsec).cast("double")

    word = F.regexp_replace(s, r"\s+$", "")
    ord_digits = F.nullif(
        F.regexp_extract(s, r"^(\d+)(?:st|nd|rd|th)$", 1),
        F.lit("")).cast("double")
    ord_val = F.coalesce(ord_digits, _map_case(word, _ORD_VALUES))
    card_word_val = _map_case(
        F.regexp_extract(s, rf"^({_CARD_WORD})$", 1), _CARD_VALUES)

    value = F.when(ctype == "TIME", time_val) \
        .when(ctype == "ORDINAL", ord_val) \
        .when(ctype == "CARDINAL", F.coalesce(magnitude, card_word_val)) \
        .otherwise(magnitude)

    unit = F.when(ctype == "PERCENT", F.lit("%")) \
        .when(ctype == "MONEY", F.coalesce(
            F.nullif(F.regexp_extract(s, f"({_CURR_SYM})", 1), F.lit("")),
            F.nullif(F.regexp_extract(s, f"({_CURR_WORD})", 1),
                     F.lit("")))) \
        .when(ctype == "QUANTITY",
              F.nullif(F.regexp_extract(s, f"({_UNIT})$", 1), F.lit(""))) \
        .when(ctype == "TIME", F.lit("s")) \
        .otherwise(F.lit(None).cast("string"))

    return spans.withColumn("coarse_type", ctype) \
        .withColumn("value", value).withColumn("unit", unit)


def resolve_numbers(docs: DataFrame, text_col: str = "text",
                    url_col: str = "url") -> DataFrame:
    """The full numeric handler path: detect -> classify/normalize.
    Output: (url, start, num_text, coarse_type, value, unit)."""
    return classify_number_spans(
        detect_number_spans(docs, text_col=text_col, url_col=url_col))
