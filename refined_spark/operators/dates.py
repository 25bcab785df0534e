"""E9 — DATE special-span resolution.

Re-creates the reference's date handler semantics
(/root/reference/src/refined/utilities/numeric_handling/date_utils.py:97-229,
golden corpus shapes in date_test_examples.py, handler registry
inference/processor.py:314-321) as a DECLARATIVE dataflow:

1. split a date span into parts (``"1945 to 1988"`` → two dates) with the
   reference's sequential offset scan (`_split_date_text`),
2. strip lead-in words (``early / late / mid / the start of …``),
3. parse an explicit grammar of the common formats the reference's
   dateutil round-trip resolves deterministically: bare years, month
   names (full + 3-letter with optional dot), ordinal days, month-day,
   month-year, worded full dates (both orders), and numeric d/m/y with
   ``/ . -`` separators,
4. numeric dates that cannot reveal their order (day <= 12 AND month <= 12)
   are *unknown-format*: their fields are nulled unless the DOCUMENT vote
   (`resolve_multiple` / `_get_date_formats`: exactly ONE distinct format
   revealed by the url's unambiguous numeric dates) disambiguates them,
5. unparseable parts are dropped (the reference filters ``None`` dates);
   resolved dates render the reference's ``to_string`` timepoint format.

Everything is Column work (whole-stage codegen): per-part parsing is a
regexp cascade fused into the scan; the only shuffle is the url-level
format vote (groupBy(url) on revealing rows — metric-sized — joined
back). No Python, no UDF: at 10^12 documents this is a map stage plus one
tiny broadcastable aggregate.

Deviations from the dateutil-backed reference, documented: the grammar is
closed (decades/centuries/BC are unresolved in the reference too — its
test corpus maps them to None); the numeric pattern does not require the
two separators to be the same character; lead-in stripping is applied on
the lowercased text. Round 4 narrows the gap with the worded shapes
dateutil's JUMP list resolves ('21st of February 2009', '21 February',
'February of 2009', '2009 February' — see P_D_OF_MY..P_YEAR_MONTH);
year-first numeric (ISO '2021-01-30') stays out: the reference's own
doc-format vote misclassifies it (get_doc_format scans numbers_only for
str(day), which collides with the year's digits), so there is no sane
behavior to be parity with. The day-month detection atom inherits the
inherent '3 May' homograph ambiguity ('chapter 3 may appear') the
reference delegates to its trained MD head.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPLIT_RE = r"\s?--\s?| - | to "
PREFIX_RE = (r"^(early|late|mid|the start of|the end of|the middle of"
             r"|the year)( |-)")

# month atom: full names + 3-letter abbreviations (optional trailing dot),
# 'sept' included — RE2-compatible (no backrefs / lookarounds) so the
# DuckDB oracle can run the identical pattern
MONTH_RE = (r"(jan(?:uary)?|feb(?:ruary)?|mar(?:ch)?|apr(?:il)?|may"
            r"|jun(?:e)?|jul(?:y)?|aug(?:ust)?|sep(?:t(?:ember)?)?"
            r"|oct(?:ober)?|nov(?:ember)?|dec(?:ember)?)\.?")
MONTHS3 = ("array('jan','feb','mar','apr','may','jun','jul','aug','sep',"
           "'oct','nov','dec')")

P_YEAR = r"^(\d{4})$"
P_MONTH = rf"^{MONTH_RE}$"
P_DAY = r"^(\d{1,2})(?:st|nd|rd|th)$"
P_MONTH_DAY = rf"^{MONTH_RE} (\d{{1,2}})(?:st|nd|rd|th)?$"
P_MONTH_YEAR = rf"^{MONTH_RE} (\d{{4}})$"
P_MDY = rf"^{MONTH_RE} (\d{{1,2}})(?:st|nd|rd|th)?,? (\d{{4}})$"
P_DMY = rf"^(\d{{1,2}})(?:st|nd|rd|th)? {MONTH_RE},? (\d{{4}})$"
P_NUM = r"^(\d{1,2})[/.-](\d{1,2})[/.-](\d{4})$"

# dateutil-parity tail (round 4): worded shapes the reference resolves via
# dateutil's JUMP token list ('of' and ',' are skipped — parser.py
# parserinfo.JUMP) that the r3 closed grammar rejected. All carry letters,
# so in the reference they never join the numeric format vote
# (date_utils.py:41-43 can_identify_format returns True on any letter) —
# adding them cannot perturb the url-level day/month-first resolution.
# Goldens: tests/test_dates.py pins each shape to the dateutil._parse
# output (dateutil ships as a pandas dependency — a public oracle).
P_D_OF_MY = (rf"^(\d{{1,2}})(?:st|nd|rd|th)? of {MONTH_RE}"
             rf"(?:,? (\d{{4}}))?$")   # '21st of February( 2009)?'
P_DM = rf"^(\d{{1,2}})(?:st|nd|rd|th)? {MONTH_RE}$"   # '21 February'
P_MONTH_OF_YEAR = rf"^{MONTH_RE} of (\d{{4}})$"       # 'February of 2009'
P_YEAR_MONTH = rf"^(\d{{4}}) {MONTH_RE}$"             # '2009 February'


def _month_num(col):
    """Month-name column -> 1..12 (NULL if not a month)."""
    key = F.substring(F.regexp_replace(col, r"\.", ""), 1, 3)
    return F.nullif(F.array_position(F.expr(MONTHS3), key), F.lit(0)) \
        .cast("int")


def split_date_parts(spans: DataFrame,
                     text_col: str = "date_text") -> DataFrame:
    """One row per date part with the reference's sequential offset scan
    (`_split_date_text`: each part is searched from the end of the
    previous part, so separators are skipped naturally)."""
    parts = F.split(F.col(text_col), SPLIT_RE)
    # Spark's SQL parser unescapes string literals, so the regex must be
    # double-escaped when interpolated into the expr text — otherwise
    # '\s?--\s?' degrades to 's?--s?' and spaced range joiners
    # ('4 May 1945 -- 8 May 1988') yield offsets shifted by one
    # (round-2 advisor repro; the Python-API F.split above is unaffected)
    split_re_sql = SPLIT_RE.replace("\\", "\\\\")
    offs = F.expr(f"""
        aggregate(
          split({text_col}, '{split_re_sql}'),
          struct(cast(array() as array<int>) as offs, 0 as pos),
          (acc, p) -> struct(
            acc.offs || array(locate(p, {text_col}, acc.pos + 1) - 1),
            locate(p, {text_col}, acc.pos + 1) - 1 + length(p)),
          acc -> acc.offs)
    """)
    z = spans.withColumn("_z", F.arrays_zip(parts.alias("part"),
                                            offs.alias("offset")))
    return (
        z.select("*", F.posexplode("_z").alias("part_idx", "_e"))
        .withColumn("date_part", F.col("_e.part"))
        .withColumn("offset", F.col("_e.offset"))
        .drop("_z", "_e")
    )


# ---------------------------------------------------------------------------
# detection — deterministic stand-in for the reference's DATE-typed MD
# ---------------------------------------------------------------------------
#
# In the reference, DATE spans come from the trained MD head (coarse_type
# "DATE", processor.py:314-321 routes them to the date handler). The
# deterministic analog is a grammar scan for exactly the atoms the
# resolver parses (a bare 4-digit year only qualifies inside a range —
# standalone numbers are hopelessly ambiguous without a model).
# RE2-compatible (no backrefs/lookarounds) so DuckDB can run it verbatim.

_ATOM = (rf"(?:\d{{1,2}}(?:st|nd|rd|th)? of {MONTH_RE},? \d{{4}}"
         rf"|{MONTH_RE} \d{{1,2}}(?:st|nd|rd|th)?,? \d{{4}}"
         rf"|\d{{1,2}}(?:st|nd|rd|th)? {MONTH_RE},? \d{{4}}"
         rf"|\d{{1,2}}(?:st|nd|rd|th)? of {MONTH_RE}"
         rf"|{MONTH_RE} of \d{{4}}"
         rf"|\d{{4}} {MONTH_RE}"
         rf"|{MONTH_RE} \d{{4}}"
         rf"|{MONTH_RE} \d{{1,2}}(?:st|nd|rd|th)?"
         rf"|\d{{1,2}}(?:st|nd|rd|th)? {MONTH_RE}"
         rf"|\d{{1,2}}[/.-]\d{{1,2}}[/.-]\d{{4}})")
_RANGE_SEP = r"(?:\s?--\s?| - | to )"
DETECT_PATTERN = (rf"\b(?:(?:{_ATOM}|\d{{4}}){_RANGE_SEP}"
                  rf"(?:{_ATOM}|\d{{4}})|{_ATOM})")


def detect_date_spans(docs: DataFrame, text_col: str = "text",
                      url_col: str = "url") -> DataFrame:
    """(url, text) -> (url, start, date_text) — one row per detected date
    expression, char offsets. One Arrow crossing (offsets need
    ``re.finditer``; Spark's regexp functions return matches, not
    positions), case-insensitive, leftmost-longest via alternation
    order (ranges before single atoms)."""
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
        StructField("date_text", StringType()),
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
                    F.col("m.date_text").alias("date_text")))


def resolve_dates(spans: DataFrame,
                  text_col: str = "date_text") -> DataFrame:
    """spans: (url, start, date_text) -> one row per RESOLVED date part:

    (url, start, part_idx, offset, date_part, day, month, year,
     known_format, timepoint)

    Unknown-format numeric dates resolved by the url-level vote where
    possible; still-ambiguous ones keep NULL fields with
    known_format=false; unparseable parts are dropped.
    """
    p = split_date_parts(spans, text_col)
    s = F.regexp_replace(F.lower("date_part"), PREFIX_RE, "")
    p = p.withColumn("_s", s)

    def ex(pat, i):
        return F.regexp_extract("_s", pat, i)

    def num(pat, i):
        return F.nullif(ex(pat, i), F.lit("")).cast("int")

    parsed = p.select(
        "*",
        F.when(ex(P_YEAR, 1) != "", F.struct(
            F.lit(None).cast("int").alias("day"),
            F.lit(None).cast("int").alias("month"),
            num(P_YEAR, 1).alias("year"),
            F.lit("fixed").alias("kind"),
        )).when(ex(P_MONTH, 1) != "", F.struct(
            F.lit(None).cast("int").alias("day"),
            _month_num(ex(P_MONTH, 1)).alias("month"),
            F.lit(None).cast("int").alias("year"),
            F.lit("fixed").alias("kind"),
        )).when(ex(P_DAY, 1) != "", F.struct(
            num(P_DAY, 1).alias("day"),
            F.lit(None).cast("int").alias("month"),
            F.lit(None).cast("int").alias("year"),
            F.lit("fixed").alias("kind"),
        )).when(ex(P_MDY, 1) != "", F.struct(
            num(P_MDY, 2).alias("day"),
            _month_num(ex(P_MDY, 1)).alias("month"),
            num(P_MDY, 3).alias("year"),
            F.lit("fixed").alias("kind"),
        )).when(ex(P_DMY, 2) != "", F.struct(
            num(P_DMY, 1).alias("day"),
            _month_num(ex(P_DMY, 2)).alias("month"),
            num(P_DMY, 3).alias("year"),
            F.lit("fixed").alias("kind"),
        )).when(ex(P_MONTH_DAY, 1) != "", F.struct(
            num(P_MONTH_DAY, 2).alias("day"),
            _month_num(ex(P_MONTH_DAY, 1)).alias("month"),
            F.lit(None).cast("int").alias("year"),
            F.lit("fixed").alias("kind"),
        )).when(ex(P_MONTH_YEAR, 1) != "", F.struct(
            F.lit(None).cast("int").alias("day"),
            _month_num(ex(P_MONTH_YEAR, 1)).alias("month"),
            num(P_MONTH_YEAR, 2).alias("year"),
            F.lit("fixed").alias("kind"),
        )).when(ex(P_NUM, 1) != "", F.struct(
            num(P_NUM, 1).alias("day"),     # provisional: a, b
            num(P_NUM, 2).alias("month"),
            num(P_NUM, 3).alias("year"),
            F.lit("num").alias("kind"),
        )).when(ex(P_D_OF_MY, 1) != "", F.struct(
            num(P_D_OF_MY, 1).alias("day"),
            _month_num(ex(P_D_OF_MY, 2)).alias("month"),
            num(P_D_OF_MY, 3).alias("year"),   # optional group -> NULL
            F.lit("fixed").alias("kind"),
        )).when(ex(P_DM, 1) != "", F.struct(
            num(P_DM, 1).alias("day"),
            _month_num(ex(P_DM, 2)).alias("month"),
            F.lit(None).cast("int").alias("year"),
            F.lit("fixed").alias("kind"),
        )).when(ex(P_MONTH_OF_YEAR, 1) != "", F.struct(
            F.lit(None).cast("int").alias("day"),
            _month_num(ex(P_MONTH_OF_YEAR, 1)).alias("month"),
            num(P_MONTH_OF_YEAR, 2).alias("year"),
            F.lit("fixed").alias("kind"),
        )).when(ex(P_YEAR_MONTH, 1) != "", F.struct(
            F.lit(None).cast("int").alias("day"),
            _month_num(ex(P_YEAR_MONTH, 2)).alias("month"),
            num(P_YEAR_MONTH, 1).alias("year"),
            F.lit("fixed").alias("kind"),
        )).alias("_d"),
    ).where(F.col("_d").isNotNull())

    a, b = F.col("_d.day"), F.col("_d.month")
    # numeric order resolution + per-date format reveal (get_doc_format:
    # a revealing date is numeric with its DAY component > 12)
    parsed = parsed.select(
        "*",
        F.when(F.col("_d.kind") == "num",
               F.when((a > 12) & (b <= 12), F.lit("day_first"))
               .when((b > 12) & (a <= 12), F.lit("month_first"))
               ).alias("_reveal"),
    )

    # url-level vote: exactly one distinct revealed format
    votes = (parsed.where(F.col("_reveal").isNotNull())
             .groupBy("url")
             .agg(F.when(F.count_distinct("_reveal") == 1,
                         F.min("_reveal")).alias("_doc_fmt")))
    r = parsed.join(F.broadcast(votes), "url", "left")

    is_num = F.col("_d.kind") == "num"
    ambig = is_num & (a <= 12) & (b <= 12)
    eff_fmt = F.coalesce(F.col("_reveal"), F.col("_doc_fmt"))
    day = (
        F.when(~is_num, F.col("_d.day"))
        .when(eff_fmt == "day_first", a)
        .when(eff_fmt == "month_first", b)
    )
    month = (
        F.when(~is_num, F.col("_d.month"))
        .when(eff_fmt == "day_first", b)
        .when(eff_fmt == "month_first", a)
    )
    year = F.when(~is_num | eff_fmt.isNotNull(), F.col("_d.year"))
    known = ~(ambig & eff_fmt.isNull())
    valid = (
        (~is_num & F.coalesce(F.col("_d.day"), F.lit(1)).between(1, 31))
        | (is_num & ambig & (F.least(a, b) >= 1))
        | (is_num & ~ambig & F.least(a, b).between(1, 12)
           & (F.greatest(a, b) <= 31))
    )

    ts = F.when(
        day.isNotNull() & month.isNotNull() & year.isNotNull(),
        F.format_string('[timepoint: ["%d/%d/%d"]]', year, month, day),
    ).when(
        day.isNull() & month.isNotNull() & year.isNotNull(),
        F.format_string('[timepoint: ["%d/%d"]]', year, month),
    ).when(
        day.isNull() & month.isNull() & year.isNotNull(),
        F.format_string('[timepoint: ["%d"]]', year),
    ).when(
        day.isNotNull() & month.isNotNull() & year.isNull(),
        F.format_string('[day of the year: ["%d/%d"]]', month, day),
    )

    return (
        r.where(valid)
        .select(
            "url", "start", "part_idx", "offset", "date_part",
            day.alias("day"), month.alias("month"), year.alias("year"),
            known.alias("known_format"), ts.alias("timepoint"),
        )
    )
