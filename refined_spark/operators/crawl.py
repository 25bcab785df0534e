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
5. one trailing ``/`` is dropped from the PATH (so ``https://h/`` and
   ``https://h`` collapse; the query string is PRESERVED byte-for-byte
   — it addresses content, including any ``/`` characters inside it).

Scale shape: :func:`latest_snapshot` is ONE map-side-combining
aggregation on the canonical key — ``max_by(payload, (warc_ts, url))``
partial-aggregates to one row per key per partition before the
exchange, so a hot site with millions of snapshots still ships one row
per map task (no window sort over the corpus, the shape entity_index
was rebuilt to avoid). The (warc_ts, url) order key totalizes the pick
across DISTINCT captures (ties on warc_ts fall to the lexicographically
larger raw url); two rows identical in (warc_ts, url) but differing in
payload — a malformed upstream capture — are outside that order, so
callers needing byte-determinism under task retries there pass
``content_tiebreak_col`` to extend the key with a payload hash.
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
RE_PATH = "^([^?]*)"          # rest up to (excl.) the query string
RE_QUERY = "(\\?.*)$"          # the query string incl. '?', or empty


def url_scheme(col: F.Column) -> F.Column:
    return F.lower(F.regexp_extract(col, RE_SCHEME, 1))


def canonical_authority(col: F.Column) -> F.Column:
    """Rules 1-3 on the authority: lowercase, leading ``www.`` dropped,
    scheme-default port dropped. THE single definition of host identity
    — hosts.host_of and (through it) urlfilter's registered domains
    delegate here, so URL dedup and host condemnation can never drift
    onto different host identities."""
    scheme = url_scheme(col)
    auth = F.regexp_replace(
        F.lower(F.regexp_extract(col, RE_AUTH, 1)), RE_WWW, "")
    return (F.when(scheme == "http", F.regexp_replace(auth, RE_P80, ""))
            .when(scheme == "https",
                  F.regexp_replace(auth, RE_P443, ""))
            .otherwise(auth))


def canonical_url(col: F.Column) -> F.Column:
    """The canonical form of a URL column under the module rules.
    Non-URL strings (no ``scheme://``) canonicalize to the empty
    authority form ``'://'`` + nothing — callers feeding arbitrary
    strings should pre-filter; the corpus contract guarantees URLs."""
    scheme = url_scheme(col)
    auth = canonical_authority(col)
    rest = F.regexp_extract(col, RE_REST, 1)
    # rule 5 applies to the PATH only: a trailing '/' INSIDE the query
    # string addresses different content and must survive
    path = F.regexp_replace(
        F.regexp_extract(rest, RE_PATH, 1), RE_SLASH, "")
    query = F.regexp_extract(rest, RE_QUERY, 1)
    return F.concat(scheme, F.lit("://"), auth, path, query)


def canonical_url_sql(col: str = "url") -> str:
    """The IDENTICAL rules as ANSI/DuckDB SQL text (single-quoted regex
    literals — DuckDB does no backslash processing inside '...', and
    every replacement is anchored to one occurrence so first-match
    replace semantics agree with Spark's replace-all)."""
    scheme = f"lower(regexp_extract({col}, '{RE_SCHEME}', 1))"
    auth = canonical_authority_sql(col)
    rest = f"regexp_extract({col}, '{RE_REST}', 1)"
    path = (f"regexp_replace(regexp_extract({rest}, '{RE_PATH}', 1), "
            f"'{RE_SLASH}', '')")
    query = f"regexp_extract({rest}, '{RE_QUERY}', 1)"
    return f"({scheme} || '://' || {auth} || {path} || {query})"


def canonical_authority_sql(col: str = "url") -> str:
    """The IDENTICAL authority rules as SQL (the emitter twin of
    :func:`canonical_authority`; hosts.host_sql delegates here)."""
    scheme = f"lower(regexp_extract({col}, '{RE_SCHEME}', 1))"
    auth0 = (f"regexp_replace(lower(regexp_extract({col}, '{RE_AUTH}', 1)),"
             f" '{RE_WWW}', '')")
    return (f"(case when {scheme} = 'http' then "
            f"regexp_replace({auth0}, '{RE_P80}', '') "
            f"when {scheme} = 'https' then "
            f"regexp_replace({auth0}, '{RE_P443}', '') "
            f"else {auth0} end)")


def with_canonical_url(docs: DataFrame, url_col: str = "url",
                       out_col: str = "canonical_url") -> DataFrame:
    return docs.withColumn(out_col, canonical_url(F.col(url_col)))


def latest_snapshot(docs: DataFrame, url_col: str = "url",
                    ts_col: str = "warc_ts",
                    content_tiebreak_col: str | None = None) -> DataFrame:
    """One row per canonical URL: the newest snapshot's full row (ties
    on ``ts_col`` broken by max raw url), plus ``n_snapshots``, the
    collapsed multiplicity. Output columns:
    (canonical_url, <all input columns>, n_snapshots). An input that
    already carries canonical_url/n_snapshots columns has them
    recomputed at the top level (never duplicated — re-collapsing a
    collapsed frame composes). ``content_tiebreak_col`` extends the
    order key with a payload hash for corpora that can hold two rows
    identical in (ts, url) but differing in payload (see module
    docstring)."""
    cols = [c for c in docs.columns
            if c not in ("canonical_url", "n_snapshots")]
    ord_fields = [F.col(ts_col), F.col(url_col)]
    if content_tiebreak_col is not None:
        ord_fields.append(
            F.xxhash64(F.col(content_tiebreak_col).cast("binary")))
    d = docs.select(canonical_url(F.col(url_col)).alias("canonical_url"),
                    F.struct(*cols).alias("_row"),
                    F.struct(*ord_fields).alias("_ord"))
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
