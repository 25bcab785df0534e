"""Host-level quality aggregation + filtering — the web-pipeline step
between per-document scoring and corpus assembly.

Training-data pipelines over Common-Crawl-style corpora aggregate
per-document quality to the HOST (origin) level and drop whole hosts
whose average quality falls below threshold (spam farms, template
mills): a document-level filter alone keeps the borderline pages of a
bad host, and per-host curation is how the published web pipelines
(C4, Gopher, RefinedWeb) actually prune. Reference analog: none (the
reference links caller-supplied texts) — part of the build brief's
training-data-pipeline operator set.

Host identity is the canonical authority (the same closed regex rules
as operators/crawl.py, whose atoms this module reuses so the DuckDB
replay cannot drift): lowercase, ``www.`` stripped, scheme-default port
stripped.

Scale shape:

- :func:`host_stats` is ONE map-side-combining aggregation on the host
  key — count and sum/count (avg) partial-aggregate to one row per host
  per partition before the exchange, so a Zipf-hot host (millions of
  pages) ships one partial row per map task. No window, no distinct.
- :func:`drop_low_quality_hosts` restricts the corpus with a LEFT ANTI
  join against the offending-host set. That set is host-scale already
  filtered to the bad tail — orders of magnitude below the corpus and
  broadcastable far past the point where the host dimension itself
  outgrows broadcast range; ``broadcast_hosts=False`` falls back to a
  shuffle anti join on the host key (uniform per-host fan-in: an anti
  join emits at most the probe rows, and the hot-host rows that hash
  together are dropped, not expanded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .crawl import canonical_authority, canonical_authority_sql
from .textstats import with_quality


def host_of(col: F.Column) -> F.Column:
    """Canonical host of a URL column: lowercase authority, ``www.``
    and scheme-default port stripped — DELEGATES to crawl.py's
    canonical_authority (the single definition of host identity; the
    r5 review found this block maintained verbatim in two modules,
    where one edited rule would silently split URL dedup and host
    condemnation onto different identities)."""
    return canonical_authority(col)


def host_sql(col: str = "url") -> str:
    """The IDENTICAL host rule as DuckDB SQL (delegates to the
    crawl.py emitter twin)."""
    return canonical_authority_sql(col)


def host_stats(docs: DataFrame, url_col: str = "url",
               text_col: str = "text") -> DataFrame:
    """(host, n_docs, avg_quality) — per-host document count and mean
    composite quality (textstats.with_quality). One map-side-combining
    aggregation; corpus text never crosses the exchange (only the
    (host, partial-sum, partial-count) triples do)."""
    scored = with_quality(docs, text_col=text_col).select(
        host_of(F.col(url_col)).alias("host"), "quality_score")
    return scored.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("quality_score").alias("avg_quality"))


def low_quality_hosts(docs: DataFrame, tau: float,
                      min_docs: int = 1, url_col: str = "url",
                      text_col: str = "text") -> DataFrame:
    """Hosts whose mean quality is below ``tau`` — the drop set. Hosts
    with fewer than ``min_docs`` documents are never condemned (too few
    observations to damn an origin — the standard web-pipeline
    protection for small hosts)."""
    return (host_stats(docs, url_col, text_col)
            .where((F.col("avg_quality") < tau)
                   & (F.col("n_docs") >= min_docs))
            .select("host"))


def drop_low_quality_hosts(docs: DataFrame, tau: float,
                           min_docs: int = 1, url_col: str = "url",
                           text_col: str = "text",
                           broadcast_hosts: bool = True) -> DataFrame:
    """The corpus minus every document of a condemned host, schema
    preserved. Two corpus passes (score+aggregate, anti join) and one
    host-scale broadcast — no corpus-scale shuffle when the drop set
    broadcasts."""
    bad = low_quality_hosts(docs, tau, min_docs, url_col, text_col)
    if broadcast_hosts:
        bad = F.broadcast(bad)
    # helper-column name must not clobber a caller column (the
    # schema-preserved contract): pick the first unused underscore name
    helper = "_host"
    while helper in docs.columns:
        helper += "_"
    probe = docs.withColumn(helper, host_of(F.col(url_col)))
    # NULL-SAFE equality: a NULL-url group aggregates to a NULL host
    # row which low_quality_hosts can condemn, but plain equality never
    # matches NULL — the condemnation would be reported yet silently
    # unenforced. (Scheme-less urls all pool into host '' — one
    # pseudo-host judged together; the corpus contract guarantees real
    # URLs, this is the degradation mode.)
    kept = probe.join(bad, probe[helper].eqNullSafe(bad["host"]),
                      "left_anti")
    return kept.drop(helper)
