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
cannot split identities) via the public-suffix longest-match cascade
over the PSL snapshot (:mod:`refined_spark.operators.psl` — exact
ICANN rules at 2 and 3 labels plus the wildcard registries and their
exceptions; see that module for scope and the production regeneration
path): exceptions first (``www.ck`` / ``city.kawasaki.jp`` ARE the
registered domains, with every subdomain theirs); then if the last TWO
labels are a wildcard base (``kawasaki.jp`` …) or the last THREE a
listed 3-label suffix (``k12.ca.us`` …), the registered domain is the
last four labels; then if the last label is a wildcard ccTLD
(``*.ck`` …) or the last TWO a listed 2-label suffix (``co.uk``,
``com.sg`` …), the last three; else the last two. IP
literals and single-label hosts pass through whole; a host that IS a
suffix maps to itself; a NULL/absent authority yields NULL (and the
anti joins below keep NULL-domain rows — nothing condemns them).
:func:`registered_domain_sql` emits the DuckDB replay from the same
constants, so the engines cannot drift suffix-by-suffix.

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
from .psl import SNAPSHOT, SUFFIXES_2, SUFFIXES_3, PslRules

# Back-compat alias: the 2-label slice of the PSL snapshot (rounds 1-4
# shipped a closed 16-entry set under this name; the r4 verdict's
# production-correctness item replaced it with the snapshot).
MULTI_SUFFIXES: tuple[str, ...] = SUFFIXES_2
_RE_PORT = ":[0-9]+$"
_RE_IP = r"^[0-9.]+$"


def registered_domain(url: Column,
                      rules: PslRules = SNAPSHOT) -> Column:
    """Registered domain of a URL column (see module docstring). Pure
    codegen — the suffix memberships compile to O(1) InSet probes
    (Catalyst converts isin past inSetConversionThreshold=10). NULL
    authority → NULL; malformed url with an empty-string authority →
    empty string (both engines). Arm order is the PSL's published
    prevailing-rule order: exception > wildcard/exact at 3 labels >
    wildcard/exact at 2 labels (a wildcard and an exact rule of the
    same depth yield the same registered domain, so only the
    exception-first ordering is load-bearing)."""
    host = F.regexp_replace(host_of(url), _RE_PORT, "")
    parts = F.split(host, r"\.")
    # concat_ws skips NULL slots, so lastN degrades to the full host
    # when the host has < N labels — matched by the size guard / the
    # host-is-the-suffix contract before that ever shows.
    last1 = F.try_element_at(parts, F.lit(-1))
    last2 = F.concat_ws(".", F.try_element_at(parts, F.lit(-2)), last1)
    last3 = F.concat_ws(".", F.try_element_at(parts, F.lit(-3)), last2)
    last4 = F.concat_ws(".", F.try_element_at(parts, F.lit(-4)), last3)
    col = (F.when(host.isNull(), F.lit(None).cast("string"))
           .when(host.rlike(_RE_IP) | (F.size(parts) <= 2), host))
    if rules.exceptions_3:
        col = col.when(last3.isin(*rules.exceptions_3), last3)
    if rules.exceptions_2:
        col = col.when(last2.isin(*rules.exceptions_2), last2)
    if rules.wildcard_2:
        col = col.when(last2.isin(*rules.wildcard_2), last4)
    if rules.suffixes_3:
        col = col.when(last3.isin(*rules.suffixes_3), last4)
    if rules.wildcard_1:
        col = col.when(last1.isin(*rules.wildcard_1), last3)
    if rules.suffixes_2:
        col = col.when(last2.isin(*rules.suffixes_2), last3)
    return col.otherwise(last2)


def registered_domain_sql(url_expr: str,
                          rules: PslRules = SNAPSHOT) -> str:
    """DuckDB replay of :func:`registered_domain`, emitted from the
    same rule tables in the same arm order. ``url_expr`` should be a
    simple column reference (the expression inlines it repeatedly).
    The coalesce on lastN mirrors Spark's NULL-skipping concat_ws
    (DuckDB's || is NULL-propagating)."""
    host = (f"regexp_replace({host_sql(url_expr)}, '{_RE_PORT}', '')")
    # bind once via a scalar subquery-free trick: DuckDB allows lateral
    # column reuse only in CTEs, so callers get a compact single
    # expression over string_split
    p = f"string_split({host}, '.')"
    last2 = f"({p}[-2] || '.' || {p}[-1])"
    last3 = f"coalesce(({p}[-3] || '.' || {last2}), {last2})"
    last4 = f"coalesce(({p}[-4] || '.' || {last3}), {last3})"

    def inset(vals):
        return ", ".join(f"'{v}'" for v in vals)

    arms = []
    if rules.exceptions_3:
        arms.append(f"when {last3} in ({inset(rules.exceptions_3)}) "
                    f"then {last3}")
    if rules.exceptions_2:
        arms.append(f"when {last2} in ({inset(rules.exceptions_2)}) "
                    f"then {last2}")
    if rules.wildcard_2:
        arms.append(f"when {last2} in ({inset(rules.wildcard_2)}) "
                    f"then {last4}")
    if rules.suffixes_3:
        arms.append(f"when {last3} in ({inset(rules.suffixes_3)}) "
                    f"then {last4}")
    if rules.wildcard_1:
        arms.append(f"when {p}[-1] in ({inset(rules.wildcard_1)}) "
                    f"then {last3}")
    if rules.suffixes_2:
        arms.append(f"when {last2} in ({inset(rules.suffixes_2)}) "
                    f"then {last3}")
    return (f"(case when {host} is null then null "
            f"when regexp_matches({host}, '{_RE_IP}') "
            f"or len({p}) <= 2 then {host} "
            + " ".join(arms)
            + f" else {last2} end)")


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
