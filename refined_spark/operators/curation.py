"""End-to-end corpus curation — the training-data pipeline as ONE
composition of this package's operators, in the canonical order every
published web pipeline uses:

0. **URL/domain blocklist** (`urlfilter.drop_blocked_domains`,
   optional) — list-based cut by registered domain (PSL-snapshot
   cascade); needs only the url, so it runs before anything touches
   text.
1. **Crawl-snapshot collapse** (`crawl.drop_stale_snapshots`) — URL
   canonicalization + latest-crawl-wins; the corpus drops from
   snapshot-scale to page-scale.
2. **Boilerplate-line cut** (`lines.drop_boilerplate_lines`,
   optional) — normalized lines in >= ``boilerplate_min_docs``
   DISTINCT documents vanish from every document. Runs BEFORE
   keep-first dedup: after a corpus-wide keep-first pass no key spans
   two documents, so the frequency cut would be vacuous by
   construction in the other order.
3. **Line-level exact dedup** (`lines.line_dedup_keep_first`,
   optional) — each surviving normalized line keeps only its first
   (doc, pos) occurrence; fully-duplicate pages vanish. Page text must
   be final before host/LM statistics, so both line stages sit here.
4. **Host curation** (`hosts.drop_low_quality_hosts`) — condemn
   origins whose mean heuristic quality falls below ``host_tau``.
5. **LM perplexity cut** (`lm_quality`) — train the unigram LM on the
   host-curated survivors, drop the high-perplexity tail at ``lm_tau``
   (the CCNet shape: the model is trained on the cleaner corpus the
   earlier stages produced).
6. **Content near-dup removal** (optional, ``near_dup_tau``) —
   MinHash-LSH candidates → exact word-shingle Jaccard >= tau →
   transitive survivor selection (keep longest, tie min id). Catches
   what the line stages cannot: documents similar at the word level
   whose lines are pairwise distinct.
7. **Stratified hash sample** (`sampling.stratified_sample`) —
   per-lang corpus mixing, bit-reproducible.

The terminal step after curation is sequence packing
(`packing.pack_manifest`) — schema-changing, so composed by the caller
(the `curate_pack` gate).

Scale shape: each stage is the already-audited plan of its operator —
one map-side-combining agg per aggregation stage, anti/semi joins on
key-width frames, dup-scale near-dup joins, a map-only sample — so the
composition's shuffle census is the SUM of its parts, with corpus text
never crossing an exchange after stage 1's collapse except the two
line-stage reassembly joins and the near-dup shingle restriction (all
audited in their modules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
                  boilerplate_min_docs: int | None = None,
                  near_dup_tau: float | None = None,
                  near_dup_id_col: str = "doc_id",
                  model_weights: dict[str, float] | None = None,
                  model_tau: float = 0.0) -> DataFrame:
    """snapshots(url, warc_ts, text, <strata_col>, …) → the curated,
    sampled corpus, input schema preserved (modulo the line stages'
    audit columns, which are dropped to keep the contract). See the
    module docstring for the stage order and each stage's scale shape.

    The optional stages default OFF so the r2-vintage driver-oracled
    entry (`curate_corpus`) keeps its exact 4-stage replay;
    ``blocklist`` switches on the urlfilter cut before the collapse,
    ``boilerplate_min_docs`` / ``line_dedup`` the lines.py stages
    (boilerplate FIRST — see module docstring), ``model_weights`` the
    learned quality cut right after the LM cut (quality_model.py — a
    zero-exchange literal-predicate stage; the dict must carry the
    intercept key ``one`` plus every default feature name —
    ``n_kchars``/``alpha_ratio``/``punct_ratio``/``stop_ratio`` — as
    ``fit_quality_model`` returns them), and ``near_dup_tau``
    the MinHash→Jaccard→survivor stage between the LM cut and the
    sample. Near-dup requires an integral per-page id column
    (``near_dup_id_col`` — the connected-components node contract);
    survivor quality is text length (longest-wins, ties min id). The
    FULL chain is driver-gated end to end (`curate_full`)."""
    if blocklist is not None:
        from .urlfilter import drop_blocked_domains
        snapshots = drop_blocked_domains(snapshots, blocklist,
                                         url_col=url_col)
    pages = drop_stale_snapshots(snapshots, url_col=url_col)
    if line_dedup or boilerplate_min_docs is not None:
        from .lines import drop_boilerplate_lines, line_dedup_keep_first
        cols = pages.columns
        if boilerplate_min_docs is not None:
            pages = drop_boilerplate_lines(
                pages, boilerplate_min_docs, id_col=url_col).select(cols)
        if line_dedup:
            pages = line_dedup_keep_first(
                pages, id_col=url_col).select(cols)
    # NO stage-output persists — adjudicated by a runtime census, not
    # assumed: `pages` feeds both the host aggregation and the
    # anti-join probe, `kept_hosts` the LM train + scoring pass + final
    # semi-join probe, and the STATIC plan duplicates those subtrees
    # ~12x — but AQE's runtime exchange-stage reuse dedups every one
    # (measured on the flags-off chain: 16 executed stages, i.e. each
    # distinct shuffle materialized once; with explicit track()
    # persists instead: 27 stages / 4.5x the tasks, paying a
    # cache-write pass and — at corpus scale — memory/spill pressure
    # for work AQE already avoids). Pinned by
    # test_chain_stage_census_aqe_reuse. The near-dup localCheckpoint
    # below is the opposite case: a driver-side PLANNING blowup, which
    # no runtime reuse can help.
    kept_hosts = drop_low_quality_hosts(
        pages, host_tau, host_min_docs, url_col=url_col)
    lm = unigram_lm(kept_hosts)
    fluent = drop_high_perplexity(kept_hosts, lm, lm_tau, id_col=url_col)
    if model_weights is not None:
        # learned quality cut beside the statistical LM cut (the
        # FineWeb-Edu-style placement): a literal dot-product filter —
        # pure codegen, fuses into whatever plan feeds it, so the
        # stage adds zero exchanges
        from .quality_model import drop_low_model_score
        fluent = drop_low_model_score(fluent, model_weights, model_tau)
    if near_dup_tau is not None:
        from .dedup import (drop_near_dups, jaccard_verify,
                            lsh_candidate_pairs, minhash_signatures)
        cols = fluent.columns
        # Lineage cut, not an optimization flourish: the near-dup
        # stage references this frame ~5x (signature chain, both
        # jaccard join sides, the candidate-id restriction, the final
        # survivor semi join), and each reference re-plans the full
        # upstream chain — two HOF-heavy line-stage rebuilds, the host
        # and LM sub-chains — so Catalyst analysis goes multiplicative
        # (measured: >10 CPU-minutes of pure driver planning on a
        # 77-row fixture without the cut; seconds with it). A cluster
        # job would checkpoint the curated pre-near-dup corpus as a
        # stage table here anyway (the resume/lineage story), which is
        # exactly what this is.
        nd = (fluent.withColumn("_nd_len", F.length("text"))
              .localCheckpoint())
        sigs = minhash_signatures(nd, id_col=near_dup_id_col)
        pairs = jaccard_verify(lsh_candidate_pairs(sigs), nd,
                               id_col=near_dup_id_col,
                               threshold=near_dup_tau)
        fluent = drop_near_dups(nd, pairs, id_col=near_dup_id_col,
                                quality_col="_nd_len").select(cols)
    return stratified_sample(fluent, rates, strata_col, url_col,
                             salt=salt)
