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

# (?i): the range is DETECTED case-insensitively, so it must SPLIT
# case-insensitively too — '1945 To 1988' was detected as one range
# span and then silently dropped whole (no family matched the unsplit
# text; r5 review, live repro). (?i) is supported by both engines.
SPLIT_RE = r"(?i)\s?--\s?| - | to "
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

# The resolvable grammar, as THREE family patterns + the numeric one —
# merged by leading token so each date part is tested against 4 regexes,
# not 13 per-shape ones. The merge matters twice over: (a) ~3x less
# regex work per row in any execution mode, and (b) the per-shape
# cascade's ~40 inlined regexp_extract calls overflowed janino's 64 KB
# method limit in the fused Generate+Project stage (whole-stage codegen
# fell back to interpreted — a pre-existing r3 condition, measured, not
# introduced by the round-4 shapes). Alternation capture semantics are
# leftmost-FIRST in both java.util.regex and RE2, so the DuckDB oracle
# extracts identical groups. Round 4 also added the worded shapes
# dateutil resolves via its JUMP token list ('of' and ',' are skipped —
# parser.py parserinfo.JUMP) that the r3 closed grammar rejected; all
# carry letters, so per the reference's can_identify_format
# (date_utils.py:41-43) they never join the numeric format vote.
# Goldens: tests/test_dates.py pins every shape, the new ones to the
# dateutil._parse output itself (dateutil ships as a pandas dependency —
# a public oracle).
#
# Month-led — 'February', 'Feb. 21st', 'March 2021', 'February 21st
# 2009', 'February 21, 2009', 'February of 2009':
#   g1=month, g2=year(of-form), g3=day, g4=year(after day), g5=bare year
P_FAM_M = (rf"^{MONTH_RE}(?: of (\d{{4}})"
           rf"| (\d{{1,2}})(?:st|nd|rd|th)?(?:,? (\d{{4}}))?"
           rf"| (\d{{4}}))?$")
# Day-led — '23rd' (bare day REQUIRES the ordinal suffix: standalone
# numbers are not dates), '21 February', '21st of February 2009',
# '4 May 1945', '30th of January, 2021':
#   g1=day, g2=month, g3=year
P_FAM_D = (r"^(\d{1,2})(?:(?:st|nd|rd|th)"
           rf"|(?:st|nd|rd|th)? (?:of )?{MONTH_RE}(?:,? (\d{{4}}))?)$")
# Year-led — '2012', '2009 February':  g1=year, g2=month
P_FAM_Y = rf"^(\d{{4}})(?: {MONTH_RE})?$"
# Numeric — '30/01/2021' (day/month order resolved by the doc vote)
P_NUM = r"^(\d{1,2})[/.-](\d{1,2})[/.-](\d{4})$"


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
# trailing \b as well as leading: without it the grammar matched
# truncated PREFIXES of longer digit runs and fabricated dates
# ('12/05/20199' emitted 12/05/2019; 'May 20091' emitted May 2009 —
# r5 review, live repro). \b is RE2-safe (no lookaround), so the
# DuckDB replay keeps running the identical pattern.
DETECT_PATTERN = (rf"\b(?:(?:{_ATOM}|\d{{4}}){_RANGE_SEP}"
                  rf"(?:{_ATOM}|\d{{4}})|{_ATOM})\b")


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

    # Codegen discipline (measured, not speculative): the parse runs in
    # the stage FUSED with the posexplode, where every reference to a
    # projection alias is re-inlined by CollapseProject / filter-pushdown
    # alias substitution. The r3 shape (9 per-shape patterns, ~40
    # regexp_extract calls, a separate _reveal select, a final valid
    # filter) emitted the cascade ~3x and overflowed janino's 64 KB
    # method limit — whole-stage codegen silently fell back to
    # interpreted for the whole stage. Two fixes, both load-bearing:
    # (1) the per-shape patterns are merged into the four FAMILY
    # patterns above (~3x fewer regex evaluations per row in any mode),
    # and (2) the parse is split into a raw-GROUP extraction step (each
    # group exactly ONE regexp_extract, multi-referenced downstream) and
    # a cheap struct-assembly step over those group ATTRIBUTES —
    # CollapseProject's cost guard keeps non-cheap aliases referenced
    # more than once un-collapsed, so the regex work is emitted once in
    # the projection plus once in the pushed-down keep filter, well
    # under the method limit. Downstream consumers touch `_d` fields
    # only across the votes join (bound references — no re-inlining).
    groups = {
        "_gy1": ex(P_FAM_Y, 1), "_gy2": ex(P_FAM_Y, 2),
        "_gd1": ex(P_FAM_D, 1), "_gd2": ex(P_FAM_D, 2),
        "_gd3": ex(P_FAM_D, 3),
        "_gm1": ex(P_FAM_M, 1), "_gm2": ex(P_FAM_M, 2),
        "_gm3": ex(P_FAM_M, 3), "_gm4": ex(P_FAM_M, 4),
        "_gm5": ex(P_FAM_M, 5),
        "_gn1": ex(P_NUM, 1), "_gn2": ex(P_NUM, 2), "_gn3": ex(P_NUM, 3),
    }
    p = p.select("*", *[c.alias(n) for n, c in groups.items()])

    def snum(name):
        return F.nullif(F.col(name), F.lit("")).cast("int")

    # family discriminators: the leading capture group participates on
    # every match of its family (empty groups extract as ''), and the
    # four families are mutually exclusive by their leading token.
    # reveal + structural validity are folded into the branch that knows
    # them (get_doc_format: a revealing date is numeric with its DAY
    # component > 12).
    a0, b0 = snum("_gn1"), snum("_gn2")
    fixed_valid = (lambda day:
                   F.coalesce(day, F.lit(1)).between(1, 31))
    num_ambig = (a0 <= 12) & (b0 <= 12)

    # url-level vote, derived BEFORE the struct assembly: a revealing
    # row is by construction a P_NUM row (the numeric leading token is
    # disjoint from every worded family), so the votes subtree needs
    # only the two numeric groups — column pruning drops the other 11
    # extracts from its scan, and the pushed-down reveal filter
    # re-inlines 2 regexes instead of the whole parse (the votes stage
    # was the last 64 KB codegen overflow standing). An invalid
    # revealing row still votes — reference parity with the sequential
    # replay.
    reveal0 = (F.when((a0 > 12) & (b0 <= 12), F.lit("day_first"))
               .when((b0 > 12) & (a0 <= 12), F.lit("month_first")))
    votes = (p.select("url", reveal0.alias("_rv"))
             .where(F.col("_rv").isNotNull())
             .groupBy("url")
             .agg(F.when(F.count_distinct("_rv") == 1,
                         F.min("_rv")).alias("_doc_fmt")))

    # Structural validity GATES each branch's condition (an invalid
    # parse yields NULL `_d`, dropped by the keep filter below) instead
    # of living in a separate post-join filter: a pushed-down
    # where(_d.valid) was a THIRD full-cascade emission in the fused
    # stage — the last 64 KB overflow. Equivalent row set: the families
    # are disjoint by leading token, so a gated-out branch never falls
    # through to another family, and (since the vote derives from `p`
    # above) an invalid revealing row still votes, as in the reference.
    parsed = p.select(
        "*",
        F.when(F.col("_gy1") != "", F.struct(
            F.lit(None).cast("int").alias("day"),
            _month_num(F.col("_gy2")).alias("month"),
            snum("_gy1").alias("year"),
            F.lit("fixed").alias("kind"),
            F.lit(None).cast("string").alias("reveal"),
        )).when((F.col("_gd1") != "")
                & fixed_valid(snum("_gd1")), F.struct(
            snum("_gd1").alias("day"),
            _month_num(F.col("_gd2")).alias("month"),
            snum("_gd3").alias("year"),
            F.lit("fixed").alias("kind"),
            F.lit(None).cast("string").alias("reveal"),
        )).when((F.col("_gm1") != "")
                & fixed_valid(snum("_gm3")), F.struct(
            snum("_gm3").alias("day"),
            _month_num(F.col("_gm1")).alias("month"),
            F.coalesce(snum("_gm2"), snum("_gm4"),
                       snum("_gm5")).alias("year"),
            F.lit("fixed").alias("kind"),
            F.lit(None).cast("string").alias("reveal"),
        )).when((F.col("_gn1") != "")
                & (num_ambig & (F.least(a0, b0) >= 1)
                   | (~num_ambig & F.least(a0, b0).between(1, 12)
                      & (F.greatest(a0, b0) <= 31))), F.struct(
            a0.alias("day"),     # provisional: a, b
            b0.alias("month"),
            snum("_gn3").alias("year"),
            F.lit("num").alias("kind"),
            F.when((a0 > 12) & (b0 <= 12), F.lit("day_first"))
            .when((b0 > 12) & (a0 <= 12), F.lit("month_first"))
            .alias("reveal"),
        )).alias("_d"),
    ).drop("_s", *groups).where(F.col("_d").isNotNull())

    r = parsed.join(F.broadcast(votes), "url", "left")

    a, b = F.col("_d.day"), F.col("_d.month")
    is_num = F.col("_d.kind") == "num"
    ambig = is_num & (a <= 12) & (b <= 12)
    eff_fmt = F.coalesce(F.col("_d.reveal"), F.col("_doc_fmt"))
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
        r.select(
            "url", "start", "part_idx", "offset", "date_part",
            day.alias("day"), month.alias("month"), year.alias("year"),
            known.alias("known_format"), ts.alias("timepoint"),
        )
    )
