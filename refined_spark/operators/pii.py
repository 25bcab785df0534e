"""PII detection + redaction — the web-pipeline scrub step.

Published training-data pipelines scrub personally identifiable
information from web text before training (BigScience ROOTS' PII
pipeline; FineWeb anonymizes emails and IP addresses at scale with
exactly this regex-replace shape). This module is that step as pure
JVM ``regexp_replace``/``regexp_count`` Column expressions — no UDF,
no shuffle, fuses into the parquet scan, so at 10^12 documents the
cost IS the scan (the same physics as textstats.py).

Detector classes, applied IN ORDER (order is part of the contract —
each stage counts and redacts on the output of the previous one, so
``n_<class>`` is exactly the number of replacements performed, and an
IP-shaped substring inside an email is the email's, not the IP's):

1. ``email``  — ``user@host.tld`` shapes.
2. ``ip``     — dotted IPv4 quads, word-bounded (4+-digit runs in any
   octet position defeat the boundary, so version strings like
   ``999.999.999.9999`` do not match).
3. ``phone``  — NNN[- ]NNN[- ]NNNN, word-bounded. Deliberately a
   closed North-American shape: phone formats are locale politics; a
   production deployment extends PATTERNS, and anything added must
   keep the cross-engine regex subset (below).

Every pattern is written in the Java-regex ∩ RE2 common subset —
character classes, bounded repetition, ``\\b`` word boundaries, no
lookaround, no backreferences — so the DuckDB oracle replays the
IDENTICAL pattern strings (:func:`redacted_sql` / :func:`count_sql`
emit them; the gate's SQL is generated from the same PATTERNS list the
Spark plan compiles, and cannot drift). Both engines' ``regexp_*``
scan non-overlapping matches left-to-right, so counts agree exactly.

Reference role: the reference links entities in already-clean text and
has no scrub stage; this is part of the §2.6-style training-data tail
(SURVEY "LLM-data-pipeline operators") grafted onto the same corpus
surface as textstats/lm_quality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement-token) — ordered; see module docstring.
PATTERNS: list[tuple[str, str, str]] = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}",
     "<EMAIL>"),
    ("ip", r"\b([0-9]{1,3}[.]){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b", "<PHONE>"),
]


def with_pii(docs: DataFrame, text_col: str = "text",
             out_col: str = "redacted") -> DataFrame:
    """Input schema + ``n_email, n_ip, n_phone`` (int: replacements
    performed per class, sequential semantics) + ``has_pii`` (bool) +
    ``out_col`` (the scrubbed text). One narrow projection — zero
    exchanges, whole-stage-codegen throughout (each stage is one
    ``withColumn`` over the previous alias; CollapseProject's cost
    guard keeps multi-referenced stages emitted once, the dates.py
    lesson)."""
    cur = F.col(text_col)
    out = docs
    counts = []
    for name, pat, token in PATTERNS:
        # NULL text must yield count 0, not NULL: the docstring promises
        # int counts and a bool has_pii, and a NULL has_pii row vanishes
        # from BOTH branches of any has_pii predicate (a scrub audit
        # would lose extraction-failed rows entirely)
        out = out.withColumn(f"n_{name}",
                             F.coalesce(F.regexp_count(cur, F.lit(pat)),
                                        F.lit(0)))
        out = out.withColumn(f"_pii_{name}",
                             F.regexp_replace(cur, pat, token))
        cur = F.col(f"_pii_{name}")
        counts.append(F.col(f"n_{name}"))
    has = counts[0] > 0
    for c in counts[1:]:
        has = has | (c > 0)
    out = out.withColumn("has_pii", has).withColumn(out_col, cur)
    return out.drop(*[f"_pii_{n}" for n, _, _ in PATTERNS])


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus with ``text_col`` scrubbed in place — schema
    preserved, the production sink shape (counts are the audit
    variant above)."""
    cur = F.col(text_col)
    for _, pat, token in PATTERNS:
        cur = F.regexp_replace(cur, pat, token)
    return docs.withColumn(text_col, cur)


# -- shared DuckDB replay emitters (oracle cannot drift: same PATTERNS) --

def _sql_quote(pat: str) -> str:
    # single-quote escaping ONLY: SQL standard string literals do not
    # process backslashes, so '\b' must reach DuckDB as one backslash
    return pat.replace("'", "''")


def redacted_sql(text_expr: str, upto: int | None = None) -> str:
    """Nested regexp_replace replay of the sequential scrub over
    ``text_expr``; ``upto`` limits to the first k stages (the
    intermediate a later stage counts on)."""
    expr = text_expr
    for name, pat, token in PATTERNS[:upto]:
        expr = (f"regexp_replace({expr}, '{_sql_quote(pat)}', "
                f"'{token}', 'g')")
    return expr


def count_sql(stage: int) -> str:
    """Replay of ``n_<class>`` for PATTERNS[stage]: count on the text
    as already scrubbed by the stages before it."""
    name, pat, _ = PATTERNS[stage]
    prev = redacted_sql("text", upto=stage)
    return (f"cast(len(regexp_extract_all({prev}, "
            f"'{_sql_quote(pat)}')) as int) as n_{name}")
