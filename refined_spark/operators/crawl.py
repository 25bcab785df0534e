"""Crawl-snapshot dedup — URL canonicalization + latest-crawl-wins.

A Common-Crawl-style corpus (the north rule's input shape: url, warc_ts,
html, text, lang) carries the SAME page many times: one row per crawl
snapshot, plus URL aliases of each other (scheme/host case, ``www.``,
default ports, fragments, trailing slashes). Before any content-level
dedup (dedup.py) a crawl pipeline collapses these the cheap way — by
URL identity, keeping the newest snapshot per canonical URL (the CDX
collapse convention). Content dedup then runs on the survivor set.

Reference analog: none (the reference links caller-supplied texts); this
is part of the training-data-pipeline operator set the build brief adds.

Canonicalization rules (closed, regex-only, so the DuckDB oracle replays
them verbatim — :func:`canonical_url_sql` emits the identical SQL):

1. scheme and authority lowercase (path/query case is preserved — paths
   are case-significant on most origins);
2. a leading ``www.`` on the host is dropped;
3. an explicit default port is dropped (``:80`` for http, ``:443`` for
   https);
4. the fragment is dropped (never sent to the origin);
5. one trailing ``/`` is dropped (so ``https://h/`` and ``https://h``
   collapse; the query string is PRESERVED — it addresses content).

Scale shape: :func:`latest_snapshot` is ONE map-side-combining
aggregation on the canonical key — ``max_by(payload, (warc_ts, url))``
partial-aggregates to one row per key per partition before the
exchange, so a hot site with millions of snapshots still ships one row
per map task (no window sort over the corpus, the shape entity_index
was rebuilt to avoid). The (warc_ts, url) order key makes the pick
total: ties on warc_ts fall to the lexicographically larger raw url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# regex atoms shared verbatim by the Spark and DuckDB sides (RE2-safe:
# no backrefs, no lookaround; '-' sits last in classes so neither engine
# needs an escape)
RE_SCHEME = "^([A-Za-z][A-Za-z0-9+.-]*)://"
RE_AUTH = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
RE_REST = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"
RE_WWW = "^www\\."
RE_P80 = ":80$"
RE_P443 = ":443$"
RE_SLASH = "/$"


def canonical_url(col: F.Column) -> F.Column:
    """The canonical form of a URL column under the module rules.
    Non-URL strings (no ``scheme://``) canonicalize to the empty
    authority form ``'://'`` + nothing — callers feeding arbitrary
    strings should pre-filter; the corpus contract guarantees URLs."""
    scheme = F.lower(F.regexp_extract(col, RE_SCHEME, 1))
    auth = F.regexp_replace(
        F.lower(F.regexp_extract(col, RE_AUTH, 1)), RE_WWW, "")
    auth = (F.when(scheme == "http", F.regexp_replace(auth, RE_P80, ""))
            .when(scheme == "https", F.regexp_replace(auth, RE_P443, ""))
            .otherwise(auth))
    rest = F.regexp_replace(
        F.regexp_extract(col, RE_REST, 1), RE_SLASH, "")
    return F.concat(scheme, F.lit("://"), auth, rest)


def canonical_url_sql(col: str = "url") -> str:
    """The IDENTICAL rules as ANSI/DuckDB SQL text (single-quoted regex
    literals — DuckDB does no backslash processing inside '...', and
    every replacement is anchored to one occurrence so first-match
    replace semantics agree with Spark's replace-all)."""
    scheme = f"lower(regexp_extract({col}, '{RE_SCHEME}', 1))"
    auth0 = (f"regexp_replace(lower(regexp_extract({col}, '{RE_AUTH}', 1)),"
             f" '{RE_WWW}', '')")
    auth = (f"case when {scheme} = 'http' then "
            f"regexp_replace({auth0}, '{RE_P80}', '') "
            f"when {scheme} = 'https' then "
            f"regexp_replace({auth0}, '{RE_P443}', '') "
            f"else {auth0} end")
    rest = (f"regexp_replace(regexp_extract({col}, '{RE_REST}', 1), "
            f"'{RE_SLASH}', '')")
    return f"({scheme} || '://' || {auth} || {rest})"


def with_canonical_url(docs: DataFrame, url_col: str = "url",
                       out_col: str = "canonical_url") -> DataFrame:
    return docs.withColumn(out_col, canonical_url(F.col(url_col)))


def latest_snapshot(docs: DataFrame, url_col: str = "url",
                    ts_col: str = "warc_ts") -> DataFrame:
    """One row per canonical URL: the newest snapshot's full row (ties
    on ``ts_col`` broken by max raw url — a total order), plus
    ``n_snapshots``, the collapsed multiplicity. Output columns:
    (canonical_url, <all input columns>, n_snapshots)."""
    cols = list(docs.columns)
    d = docs.select(canonical_url(F.col(url_col)).alias("canonical_url"),
                    F.struct(*cols).alias("_row"),
                    F.struct(F.col(ts_col), F.col(url_col)).alias("_ord"))
    picked = d.groupBy("canonical_url").agg(
        F.max_by("_row", "_ord").alias("_row"),
        F.count(F.lit(1)).alias("n_snapshots"))
    return picked.select("canonical_url", "_row.*", "n_snapshots")


def drop_stale_snapshots(docs: DataFrame, url_col: str = "url",
                         ts_col: str = "warc_ts") -> DataFrame:
    """The collapsed corpus with the input schema preserved (the frame
    content dedup runs on next)."""
    keep = latest_snapshot(docs, url_col, ts_col)
    return keep.select(*docs.columns)
