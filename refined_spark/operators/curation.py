"""End-to-end corpus curation — the training-data pipeline as ONE
composition of this package's operators, in the canonical order every
published web pipeline uses (CDX collapse → host-level pruning →
model-based quality cut → reproducible sampling):

1. **Crawl-snapshot collapse** (`crawl.drop_stale_snapshots`) — URL
   canonicalization + latest-crawl-wins; the corpus drops from
   snapshot-scale to page-scale.
2. **Host curation** (`hosts.drop_low_quality_hosts`) — condemn origins
   whose mean heuristic quality falls below ``host_tau``.
3. **LM perplexity cut** (`lm_quality`) — train the unigram LM on the
   host-curated survivors, drop the high-perplexity tail at ``lm_tau``
   (the CCNet shape: the model is trained on the cleaner corpus the
   earlier stages produced).
4. **Stratified hash sample** (`sampling.stratified_sample`) — per-lang
   corpus mixing, bit-reproducible.

The full published order has three more slots, each an audited
operator of this package with its own driver gate: the URL/domain
blocklist cut (`urlfilter.drop_blocked_domains`) runs BEFORE stage 1
(list-based, needs only the url); line-level dedup + boilerplate
removal (`lines`) between 1 and 2 (page text must be final before
host/LM statistics); content near-dup removal (`dedup.drop_near_dups`
over MinHash-LSH → Jaccard-verified pair edges) between 3 and 4.
Near-dup is exercised in pytest composition (the driver-oracled entry
keeps to the stages whose DuckDB replay is exact rather than
probabilistic-structure-compared); the terminal step after curation is
sequence packing (`packing.pack_manifest`).

Scale shape: each stage is the already-audited plan of its operator —
one map-side-combining agg per aggregation stage, anti/semi joins on
key-width frames, a map-only sample — so the composition's shuffle
census is the SUM of its parts, with corpus text never crossing an
exchange after stage 1's collapse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .crawl import drop_stale_snapshots
from .hosts import drop_low_quality_hosts
from .lm_quality import drop_high_perplexity, unigram_lm
from .sampling import stratified_sample


def curate_corpus(snapshots: DataFrame, *,
                  host_tau: float, host_min_docs: int,
                  lm_tau: float, rates: dict[str, float],
                  strata_col: str = "lang", url_col: str = "url",
                  salt: str = "s0",
                  blocklist: DataFrame | None = None,
                  line_dedup: bool = False,
                  boilerplate_min_docs: int | None = None) -> DataFrame:
    """snapshots(url, warc_ts, text, <strata_col>, …) → the curated,
    sampled corpus, input schema preserved (modulo the line stages'
    audit columns, which are dropped to keep the contract). See the
    module docstring for the stage order and each stage's scale shape.

    The optional stages default OFF so the driver-oracled entry keeps
    to the exact-replay chain: ``blocklist`` switches on the
    urlfilter.drop_blocked_domains cut before the collapse;
    ``line_dedup`` / ``boilerplate_min_docs`` run the lines.py stages
    between the collapse and the host cut (page text must be final
    before host/LM statistics). The full chain is pytest-composed."""
    if blocklist is not None:
        from .urlfilter import drop_blocked_domains
        snapshots = drop_blocked_domains(snapshots, blocklist,
                                         url_col=url_col)
    pages = drop_stale_snapshots(snapshots, url_col=url_col)
    if line_dedup or boilerplate_min_docs is not None:
        from .lines import drop_boilerplate_lines, line_dedup_keep_first
        cols = pages.columns
        if line_dedup:
            pages = line_dedup_keep_first(
                pages, id_col=url_col).select(cols)
        if boilerplate_min_docs is not None:
            pages = drop_boilerplate_lines(
                pages, boilerplate_min_docs, id_col=url_col).select(cols)
    kept_hosts = drop_low_quality_hosts(
        pages, host_tau, host_min_docs, url_col=url_col)
    lm = unigram_lm(kept_hosts)
    fluent = drop_high_perplexity(kept_hosts, lm, lm_tau, id_col=url_col)
    return stratified_sample(fluent, rates, strata_col, url_col,
                             salt=salt)
