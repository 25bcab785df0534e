"""URL / domain blocklist filtering — the list-based curation step.

Web-pipeline curation drops documents by WHERE they came from before
any content model runs: C4 removes pages whose URL matches a bad-word
list, and essentially every production crawl pipeline (RefinedWeb,
FineWeb, CCNet derivatives) filters against a domain blocklist in the
UT1/adult-categories style. This complements
:mod:`refined_spark.operators.hosts` (statistical, threshold-based)
with the LIST-based rule: a domain is dropped because a curated list
says so, not because its pages scored badly. Reference role: none
(ReFinED consumes curated dumps); §2.6-style training-data tail.

Matching is by REGISTERED DOMAIN, so a blocklist entry condemns every
subdomain (``ads.tracker.example.org`` matches a listed
``example.org``) — the semantics UT1-style lists are published under.
The registered domain derives from the canonical host
(:func:`refined_spark.operators.hosts.host_of` — the crawl.py rule
atoms, so url-alias decorations like case, ``www.``, default ports
cannot split identities) via a CLOSED public-suffix rule: if the last
two labels form a known multi-part suffix (``co.uk`` …), the
registered domain is the last three labels, else the last two; IP
literals and single-label hosts pass through whole. The suffix set is
the module constant ``MULTI_SUFFIXES`` — the deterministic small-scale
instance of the public-suffix list (production swaps in the full PSL
snapshot; the rule shape is identical) — and
:func:`registered_domain_sql` emits the DuckDB replay from the same
constant, so the engines cannot drift suffix-by-suffix.

Scale shape: domain extraction is pure codegen Column work (map-only,
fuses into the scan); the blocklist is a curated-list-scale dimension
joined as a BROADCAST anti join on the key-width domain column
(``broadcast_list=False`` shuffles it for beyond-broadcast lists — an
anti join never expands hot keys). The C4-style URL bad-word cut is
one compiled alternation regex — zero joins, zero exchanges.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hosts import host_of, host_sql

# Closed multi-part public-suffix set (the small-scale deterministic
# instance of the PSL; ONE source of truth for both engines).
MULTI_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "co.in", "co.nz", "co.kr", "co.za",
    "com.br", "com.cn", "com.mx", "com.tr",
)
_RE_PORT = ":[0-9]+$"
_RE_IP = r"^[0-9.]+$"


def registered_domain(url: Column) -> Column:
    """Registered domain of a URL column (see module docstring). Pure
    codegen; NULL-safe on malformed urls (no authority → empty host →
    returned as-is)."""
    host = F.regexp_replace(host_of(url), _RE_PORT, "")
    parts = F.split(host, r"\.")
    last2 = F.concat_ws(".", F.try_element_at(parts, F.lit(-2)),
                        F.try_element_at(parts, F.lit(-1)))
    last3 = F.concat_ws(".", F.try_element_at(parts, F.lit(-3)), last2)
    return (F.when(host.rlike(_RE_IP) | (F.size(parts) <= 2), host)
            .when(last2.isin(*MULTI_SUFFIXES), last3)
            .otherwise(last2))


def registered_domain_sql(url_expr: str) -> str:
    """DuckDB replay of :func:`registered_domain`, emitted from the
    same suffix constant and rule order. ``url_expr`` should be a
    simple column reference (the expression inlines it repeatedly)."""
    host = (f"regexp_replace({host_sql(url_expr)}, '{_RE_PORT}', '')")
    # bind once via a scalar subquery-free trick: DuckDB allows lateral
    # column reuse only in CTEs, so callers get a compact single
    # expression over string_split
    p = f"string_split({host}, '.')"
    last2 = f"({p}[-2] || '.' || {p}[-1])"
    last3 = f"({p}[-3] || '.' || {last2})"
    suf = ", ".join(f"'{s}'" for s in MULTI_SUFFIXES)
    return (f"(case when regexp_matches({host}, '{_RE_IP}') "
            f"or len({p}) <= 2 then {host} "
            f"when {last2} in ({suf}) then {last3} "
            f"else {last2} end)")


def with_registered_domain(docs: DataFrame, url_col: str = "url",
                           out_col: str = "domain") -> DataFrame:
    return docs.withColumn(out_col, registered_domain(F.col(url_col)))


def _probe(docs: DataFrame, url_col: str) -> tuple[DataFrame, str]:
    helper = "_domain"
    while helper in docs.columns:
        helper += "_"
    return (docs.withColumn(helper,
                            registered_domain(F.col(url_col))), helper)


def blocked_docs(docs: DataFrame, blocklist: DataFrame,
                 url_col: str = "url",
                 broadcast_list: bool = True) -> DataFrame:
    """Audit frame: every document whose registered domain is listed,
    with the blocklist's columns (category etc.) attached — the
    what-would-drop report curation reviews before committing a list."""
    probe, helper = _probe(docs, url_col)
    bl = F.broadcast(blocklist) if broadcast_list else blocklist
    hit = probe.join(bl, probe[helper] == bl["domain"], "inner")
    return hit.withColumnRenamed(helper, "matched_domain").drop("domain")


def drop_blocked_domains(docs: DataFrame, blocklist: DataFrame,
                         url_col: str = "url",
                         broadcast_list: bool = True) -> DataFrame:
    """The corpus minus every document of a listed registered domain
    (subdomains inherit), schema preserved. One broadcast anti join on
    the key-width domain column."""
    probe, helper = _probe(docs, url_col)
    bl = blocklist.select("domain")
    if broadcast_list:
        bl = F.broadcast(bl)
    kept = probe.join(bl, probe[helper] == bl["domain"], "left_anti")
    return kept.drop(helper)


def url_badword_pattern(words: tuple[str, ...] | list[str]) -> str:
    """One alternation regex over the (lowercased) url — the C4 rule.
    Words are regex-escaped; matching is substring-anywhere, the
    published semantics."""
    if not words:
        raise ValueError("empty bad-word list would keep everything "
                         "vacuously — refuse instead of silently no-op")
    return "(" + "|".join(re.escape(w.lower()) for w in words) + ")"


def drop_blocked_url_patterns(docs: DataFrame,
                              words: tuple[str, ...] | list[str],
                              url_col: str = "url") -> DataFrame:
    """C4-style URL bad-word cut: drop any document whose lowercased
    url contains any listed word. Pure codegen filter — fuses into the
    scan, zero exchanges."""
    pat = url_badword_pattern(words)
    return docs.where(~F.lower(F.col(url_col)).rlike(pat))
