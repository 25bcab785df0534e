"""E9 date resolution — golden cases shaped after the reference's
date_test_examples.py (resolvable subset of the grammar; decades/centuries
map to no output there too)."""

from __future__ import annotations

import pytest

from refined_spark.operators.dates import resolve_dates

# (text, expected list of (day, month, year, known_format)) — single-doc
# context (no format vote available)
GOLDEN = [
    ("2012", [(None, None, 2012, True)]),
    ("the start of 2012", [(None, None, 2012, True)]),
    ("the end of 2012", [(None, None, 2012, True)]),
    ("the year 1988", [(None, None, 1988, True)]),
    ("1945 to 1988", [(None, None, 1945, True), (None, None, 1988, True)]),
    ("23rd", [(23, None, None, True)]),
    ("February", [(None, 2, None, True)]),
    ("early June", [(None, 6, None, True)]),
    ("early-June", [(None, 6, None, True)]),
    ("mid-June", [(None, 6, None, True)]),
    ("late-June", [(None, 6, None, True)]),
    ("February 21st", [(21, 2, None, True)]),
    ("Feb 21st", [(21, 2, None, True)]),
    ("Feb. 21st", [(21, 2, None, True)]),
    ("March 2021", [(None, 3, 2021, True)]),
    ("February 21st 2009", [(21, 2, 2009, True)]),
    ("Feb. 21st 2009", [(21, 2, 2009, True)]),
    ("30/01/2021", [(30, 1, 2021, True)]),
    ("01/30/2021", [(30, 1, 2021, True)]),
    # ambiguous alone in its doc: fields nulled, known_format False
    ("01/01/2021", [(None, None, None, False)]),
    ("30-01-2021", [(30, 1, 2021, True)]),
    ("01-30-2021", [(30, 1, 2021, True)]),
    ("30.01.2021", [(30, 1, 2021, True)]),
    # unparseable -> no rows
    ("80s", []),
    ("the 1980s", []),
    ("the nineteenth century", []),
    ("19th century", []),      # "19th" would be a day, but "century" trails
    ("1-day", []),
    ("bimonthly", []),
    # round-4 dateutil-parity tail: worded shapes the reference resolves
    # through dateutil's JUMP list ('of'/',' skipped) that the r3 closed
    # grammar rejected. Expected tuples = dateutil.parser._parse output
    # (pinned independently by test_dateutil_parity below).
    ("21st of February 2009", [(21, 2, 2009, True)]),
    ("21 of February 2009", [(21, 2, 2009, True)]),
    ("30th of January, 2021", [(30, 1, 2021, True)]),
    ("1st of May", [(1, 5, None, True)]),
    ("21 February", [(21, 2, None, True)]),
    ("21st February", [(21, 2, None, True)]),
    ("4 Sept.", [(4, 9, None, True)]),
    ("February of 2009", [(None, 2, 2009, True)]),
    ("2009 February", [(None, 2, 2009, True)]),
    ("2009 Feb.", [(None, 2, 2009, True)]),
    # 'the' is not in dateutil's JUMP list: the reference returns None
    ("the 21st of February 2009", []),
    # worded range: splitter + the new atoms compose
    ("1st of May 1945 to 8 May 1988",
     [(1, 5, 1945, True), (8, 5, 1988, True)]),
    ("February of 2009 -- 2010 March",
     [(None, 2, 2009, True), (None, 3, 2010, True)]),
]


@pytest.fixture(scope="module")
def resolved(spark):
    # one url per case: no cross-case vote contamination
    rows = [(f"u{i:03d}", 0, text) for i, (text, _) in enumerate(GOLDEN)]
    df = spark.createDataFrame(rows, "url: string, start: int, "
                                     "date_text: string")
    out = {}
    for r in resolve_dates(df).collect():
        out.setdefault(r["url"], []).append(
            (r["day"], r["month"], r["year"], r["known_format"]))
    return out


def test_golden_cases(resolved):
    for i, (text, want) in enumerate(GOLDEN):
        got = resolved.get(f"u{i:03d}", [])
        assert got == want, f"{text!r}: {got} != {want}"


def test_doc_format_vote(spark):
    """resolve_multiple: one revealing date disambiguates the others."""
    rows = [
        ("d1", 0, "30/01/2021"),   # reveals day_first
        ("d1", 20, "01/02/2021"),  # ambiguous -> day=1, month=2
        ("d2", 0, "01/30/2021"),   # reveals month_first
        ("d2", 20, "01/02/2021"),  # ambiguous -> month=1, day=2
        ("d3", 0, "30/01/2021"),   # conflict: both formats revealed
        ("d3", 20, "01/30/2021"),
        ("d3", 40, "01/02/2021"),  # -> stays unresolved
    ]
    df = spark.createDataFrame(rows, "url: string, start: int, "
                                     "date_text: string")
    got = {(r["url"], r["start"]): (r["day"], r["month"], r["year"],
                                    r["known_format"], r["timepoint"])
           for r in resolve_dates(df).collect()}
    assert got[("d1", 20)] == (1, 2, 2021, True,
                               '[timepoint: ["2021/2/1"]]')
    assert got[("d2", 20)] == (2, 1, 2021, True,
                               '[timepoint: ["2021/1/2"]]')
    assert got[("d3", 40)] == (None, None, None, False, None)


def test_range_offsets(spark):
    df = spark.createDataFrame([("u", 0, "1945 to 1988")],
                               "url: string, start: int, date_text: string")
    rows = sorted((r["part_idx"], r["offset"], r["date_part"])
                  for r in resolve_dates(df).collect())
    assert rows == [(0, 0, "1945"), (1, 8, "1988")]


def test_detect_date_spans(spark):
    from refined_spark.operators.dates import (
        detect_date_spans,
        resolve_dates,
    )

    docs = spark.createDataFrame([
        ("u1", "Born on June 12, 1987 in Paris; moved 03/04/1999."),
        ("u2", "The war lasted 1939 to 1945, ending in May 1945."),
        ("u3", "The grandmarch 2020 parade had no dates at all here."),
        ("u4", ""),
    ], "url string, text string")
    got = {(r["url"], r["start"], r["date_text"])
           for r in detect_date_spans(docs).collect()}
    assert ("u1", 8, "June 12, 1987") in got
    assert ("u1", 38, "03/04/1999") in got
    assert ("u2", 15, "1939 to 1945") in got
    assert ("u2", 39, "May 1945") in got
    # \b guard: 'march 2020' inside 'grandmarch' must NOT match
    assert not any(u == "u3" for u, _, _ in got)
    assert len(got) == 4

    # detected spans feed the resolver end-to-end
    res = {(r["url"], r["start"], r["part_idx"]):
           (r["day"], r["month"], r["year"])
           for r in resolve_dates(detect_date_spans(docs)).collect()}
    assert res[("u1", 8, 0)] == (12, 6, 1987)
    assert res[("u2", 15, 0)] == (None, None, 1939)
    assert res[("u2", 15, 1)] == (None, None, 1945)
    assert res[("u2", 39, 0)] == (None, 5, 1945)


def test_range_offsets_spaced_joiner(spark):
    # round-2 advisor repro: '\s?--\s?' degraded to 's?--s?' inside the
    # F.expr SQL literal, shifting the second part's offset by one
    df = spark.createDataFrame(
        [("u", 0, "4 May 1945 -- 8 May 1988"),
         ("v", 0, "1950 -- 1977")],
        "url: string, start: int, date_text: string")
    rows = sorted((r["url"], r["part_idx"], r["offset"], r["date_part"])
                  for r in resolve_dates(df).collect())
    assert rows == [("u", 0, 0, "4 May 1945"), ("u", 1, 14, "8 May 1988"),
                    ("v", 0, 0, "1950"), ("v", 1, 8, "1977")]


def test_dateutil_parity_new_shapes():
    """The round-4 worded shapes are pinned to the PUBLIC oracle the
    reference actually runs — dateutil.parser._parse (dateutil ships as a
    pandas dependency). Pure-Python: replays the reference's
    _get_date_from_text preprocessing (start_regex strip on the raw text)
    and compares (day, month, year) with the GOLDEN rows so the Spark
    grammar, the goldens, and dateutil cannot drift three ways."""
    import re

    import dateutil.parser

    parser = dateutil.parser.parser()
    start_re = re.compile(r"^(early|late|mid|the start of|the end of"
                          r"|the middle of|the year)( |-)")
    new_shapes = {t: w for t, w in GOLDEN if " of " in t.lower()
                  or re.match(r"^\d{1,2}(st|nd|rd|th)? [A-Za-z]+\.?$", t)
                  or re.match(r"^\d{4} [A-Za-z]+\.?$", t)}
    assert len(new_shapes) >= 9   # the tail is non-vacuous
    for text, want in new_shapes.items():
        if " to " in text or "--" in text:
            continue  # ranges split before parsing; atoms covered above
        res, _ = parser._parse(start_re.sub("", text.lower()))
        got = (None if res is None
               else [(res.day, res.month, res.year, True)])
        want_cmp = want if want else None
        assert got == want_cmp, (text, got, want_cmp)


def test_detect_new_worded_shapes(spark):
    from refined_spark.operators.dates import detect_date_spans

    docs = spark.createDataFrame([
        ("w1", "Signed on the 21st of February 2009 in Rome."),
        ("w2", "It rained 21 February and snowed in February of 2009."),
        ("w3", "The 2009 February issue sold out."),
        # day-month homograph: the grammar stand-in (unlike the
        # reference's trained MD head) DOES match '3 May' here —
        # documented inherent ambiguity, pinned so a change is loud
        ("w4", "chapter 3 may appear later"),
    ], "url string, text string")
    got = {(r["url"], r["start"], r["date_text"])
           for r in detect_date_spans(docs).collect()}
    assert ("w1", 14, "21st of February 2009") in got
    assert ("w2", 10, "21 February") in got
    assert ("w2", 36, "February of 2009") in got
    assert ("w3", 4, "2009 February") in got
    assert ("w4", 8, "3 may") in got


def test_grammar_boundaries_and_mixed_case_ranges(spark):
    """r5 review repros: a longer digit run must not yield a truncated
    fabricated date, and a mixed-case range joiner must split the way
    it detected."""
    from refined_spark.operators.dates import detect_date_spans, resolve_dates

    docs = spark.createDataFrame(
        [("u1", "released 12/05/20199 build"),
         ("u2", "May 20091 units"),
         ("u3", "the war ran 1945 To 1988 overall")],
        "url string, text string")
    spans = detect_date_spans(docs)
    got = {(r.url, r.date_text) for r in spans.collect()}
    assert not any(u in ("u1", "u2") for u, _ in got), got
    assert ("u3", "1945 To 1988") in got
    years = {(r.url, r.year) for r in
             resolve_dates(spans).select("url", "year").collect()}
    assert ("u3", 1945) in years and ("u3", 1988) in years
