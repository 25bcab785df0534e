"""End-to-end corpus curation composition (operators/curation.py)."""

import os

import pyspark.sql.functions as F

from refined_spark.operators.curation import curate_corpus

CFG = dict(host_tau=0.61, host_min_docs=1, lm_tau=5.16,
           rates={"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.25})


def test_every_stage_bites_and_schema_preserved(spark, fx_t1):
    snaps = spark.read.parquet(
        os.path.join(fx_t1, "crawl_snapshots.parquet"))
    out = curate_corpus(snaps, **CFG)
    assert out.columns == snaps.columns
    n_in, n_out = snaps.count(), out.count()
    assert 0 < n_out < n_in
    # stage-by-stage strict decreases (each clause is load-bearing)
    from refined_spark.operators.crawl import drop_stale_snapshots
    from refined_spark.operators.hosts import drop_low_quality_hosts
    from refined_spark.operators.lm_quality import (drop_high_perplexity,
                                                    unigram_lm)

    pages = drop_stale_snapshots(snaps)
    hosted = drop_low_quality_hosts(pages, CFG["host_tau"],
                                    CFG["host_min_docs"])
    lm = unigram_lm(hosted)
    fluent = drop_high_perplexity(hosted, lm, CFG["lm_tau"],
                                  id_col="url")
    counts = [snaps.count(), pages.count(), hosted.count(),
              fluent.count(), n_out]
    assert all(a > b for a, b in zip(counts, counts[1:])), counts
    # reproducible end to end (hash sampling, deterministic picks)
    again = {r["url"] for r in curate_corpus(snaps, **CFG)
             .select("url").collect()}
    assert again == {r["url"] for r in out.select("url").collect()}


def test_near_dup_stage_composes(spark, fx_t1):
    """Production slot between the LM cut and the sample: MinHash-LSH →
    Jaccard-verified pair edges → survivor selection. Inject an exact
    near-dup page pair and show the composition removes one of them
    while the rest of the curated corpus is untouched."""
    from refined_spark.operators.crawl import drop_stale_snapshots
    from refined_spark.operators.dedup import (drop_near_dups,
                                               jaccard_verify,
                                               lsh_candidate_pairs,
                                               minhash_signatures)

    snaps = spark.read.parquet(
        os.path.join(fx_t1, "crawl_snapshots.parquet"))
    # the dedup operators key on LONG doc ids (the documents-table
    # contract); derive one per page url
    pages = drop_stale_snapshots(snaps).select(
        F.xxhash64("url").alias("doc_id"), F.col("text"),
        F.length("text").alias("n_chars"))
    base = pages.limit(1).select(
        F.lit(-12345).cast("long").alias("doc_id"), "text", "n_chars")
    corpus = pages.unionByName(base)
    sigs = minhash_signatures(corpus)
    pairs = jaccard_verify(lsh_candidate_pairs(sigs), corpus,
                           threshold=0.999999)
    cleaned = drop_near_dups(corpus, pairs)
    assert cleaned.count() == corpus.count() - 1
    from refined_spark.caching import release_caches

    release_caches()


def test_model_cut_stage_composes(spark, fx_t1):
    """The learned-quality stage (quality_model weights) slots after
    the LM cut: at a tau below every score it is byte-identical OFF
    (the flags-off contract), at an interior tau it strictly shrinks
    the curated corpus without admitting anything new — every survivor
    was already a flags-off survivor (per-row hash sampling is
    row-independent, so the subset relation is exact)."""
    snaps = spark.read.parquet(
        os.path.join(fx_t1, "crawl_snapshots.parquet"))
    base = curate_corpus(snaps, **CFG)
    w = {"one": 0.0, "n_kchars": 0.0, "alpha_ratio": 1.0,
         "punct_ratio": 0.0, "stop_ratio": 0.0}  # score = alpha_ratio
    idle = curate_corpus(snaps, **CFG, model_weights=w, model_tau=-1.0)
    base_urls = {r.url for r in base.select("url").collect()}
    assert {r.url for r in idle.select("url").collect()} == base_urls
    from refined_spark.operators.quality_model import model_score
    alphas = sorted(r.s for r in base.select(
        model_score(w).alias("s")).collect())
    tau = (alphas[len(alphas) // 2] + alphas[len(alphas) // 2 + 1]) / 2
    cut = curate_corpus(snaps, **CFG, model_weights=w, model_tau=tau)
    cut_urls = {r.url for r in cut.select("url").collect()}
    assert cut_urls < base_urls and len(cut_urls) > 0


def test_full_chain_on_curation_pages(spark, fx_t1):
    """The FULL 8-stage chain over the dedicated curation_pages
    fixture (every stage bites, each drop attributable to exactly one
    stage — the fixture is engineered so thresholds sit far from every
    non-target doc): blocklist, collapse, boilerplate cut, keep-first,
    host cut, LM cut, near-dup survivor election (both the
    longest-wins and the min-id tie-break arm), stratified sample."""
    from refined_spark.caching import release_caches

    pages = spark.read.parquet(
        os.path.join(fx_t1, "curation_pages.parquet"))
    bl = spark.read.parquet(
        os.path.join(fx_t1, "domain_blocklist.parquet"))
    cfg = dict(host_tau=0.5, host_min_docs=2, lm_tau=5.0,
               rates={"en": 1.0, "de": 1.0, "fr": 1.0, "es": 1.0},
               line_dedup=True, boilerplate_min_docs=3,
               near_dup_tau=0.75)
    out = curate_corpus(pages, blocklist=bl, **cfg)
    release_caches()
    assert out.columns == pages.columns
    rows = {r.doc_id: r for r in out.collect()}
    ids = set(rows)

    # blocklist: the 3 blocked pages (incl. the PSL com.sg suffix)
    assert not ids & {700, 701, 702}
    # host cut: the spam host's 4 pages
    assert not ids & {750, 751, 752, 753}
    # LM cut: the hapax doc
    assert 900 not in ids
    # line stages: all-boilerplate and all-duplicate pages vanish
    assert not ids & {920, 921}
    # near-dup pair 1: mirror is LONGER -> longest-wins keeps 801
    assert 801 in ids and 800 not in ids
    # near-dup pair 2: equal lengths -> min-doc-id keeps 810
    assert 810 in ids and 811 not in ids
    # collapse: exactly one snapshot per canonical good page survives
    # stages up to here; with all-1.0 rates nothing else drops, so the
    # survivor count is 32 good pages - 1 keep-first casualty... the
    # cross-doc dup line costs page 9 a line, not the page; total =
    # 32 good + 2 mirror survivors = 34
    assert len(ids) == 34
    # boilerplate banners are gone from every surviving text; the
    # protected 2-doc cross-page line survives on the EARLIER-url page
    # only
    joined = "\n".join(r.text for r in rows.values())
    assert "opyright" not in joined and "ubscribe" not in joined \
        and "rights reserved" not in joined.lower()
    survivors_with_dup = [
        r.doc_id for r in rows.values()
        if "sect i part a " in r.text + " "]
    assert len(survivors_with_dup) == 1
    # pass-through lines ('' / '$$$ ###') still present somewhere
    assert any("$$$ ###" in r.text for r in rows.values())


def test_full_published_order_composes(spark, fx_t1):
    """The optional stages (blocklist before the collapse; line dedup +
    boilerplate cut between collapse and host cut) each bite without
    disturbing the core chain: blocked domains vanish entirely, a
    planted cross-page boilerplate line disappears from surviving
    texts, and with all flags OFF the result is byte-identical to the
    default chain."""
    snaps = spark.read.parquet(
        os.path.join(fx_t1, "crawl_snapshots.parquet"))
    base = curate_corpus(snaps, **CFG)
    base_rows = {(r.url, r.text) for r in
                 base.select("url", "text").collect()}

    # flags-off invariance (the driver-oracled entry's contract)
    again = {(r.url, r.text) for r in
             curate_corpus(snaps, blocklist=None, line_dedup=False,
                           boilerplate_min_docs=None, **CFG)
             .select("url", "text").collect()}
    assert again == base_rows

    # blocklist stage: condemn one registered domain present in the
    # survivors, assert it vanishes and nothing else changes
    from refined_spark.operators.urlfilter import registered_domain
    doms = [r.d for r in base.select(
        registered_domain(F.col("url")).alias("d")).distinct().collect()]
    target = sorted(doms)[0]
    bl = spark.createDataFrame([(target, "ads")],
                               "domain string, category string")
    cut = curate_corpus(snaps, blocklist=bl, **CFG)
    cut_rows = {(r.url, r.text) for r in
                cut.select("url", "text").collect()}
    assert cut_rows < base_rows
    assert all(d != target for d in
               [r.d for r in cut.select(
                   registered_domain(F.col("url")).alias("d"))
                .collect()])

    # line stages: plant a multi-line boilerplate banner across many
    # pages; the boilerplate cut must strip it from every survivor and
    # the rest of the chain must still run
    planted = snaps.withColumn(
        "text", F.concat(F.lit("Accept all cookies now\n"),
                         F.col("text")))
    lined = curate_corpus(planted, line_dedup=True,
                          boilerplate_min_docs=3, **CFG)
    texts = [r.text for r in lined.select("text").collect()]
    assert texts and all("Accept all cookies now" not in t
                         for t in texts)
    assert lined.columns == snaps.columns


def test_corpus_filters_preserve_column_order(spark):
    """Every schema-preserved corpus filter must return the INPUT
    column order even when the id/key column is not first — a by-name
    join hoists the key to the front, which silently reordered the
    output until the curate_full gate caught it (the curation_pages
    fixture is the first corpus whose id column is not leftmost)."""
    docs = spark.createDataFrame(
        [("the quick brown fox jumps", i, f"https://h{i % 2}.x.org/{i}",
          100 + i)
         for i in range(6)],
        "text string, extra int, url string, doc_id long")
    cols = docs.columns  # text, extra, url, doc_id — id/key NOT first

    from refined_spark.operators.decontam import drop_contaminated
    from refined_spark.operators.dedup import drop_near_dups
    from refined_spark.operators.lines import line_dedup_keep_first
    from refined_spark.operators.lm_quality import (drop_high_perplexity,
                                                    unigram_lm)

    lm = unigram_lm(docs)
    assert drop_high_perplexity(docs, lm, 1e9).columns == cols
    bench = spark.createDataFrame([("never matching benchmark text",)],
                                  "text string")
    assert drop_contaminated(docs, bench, n=4).columns == cols
    pairs = spark.createDataFrame([(100, 101)],
                                  "id_a long, id_b long")
    assert drop_near_dups(docs, pairs, quality_col="extra").columns \
        == cols
    assert line_dedup_keep_first(docs).columns \
        == cols + ["n_lines_kept", "n_lines_dropped"]


def test_chain_stage_census_aqe_reuse(spark, fx_t1):
    """The no-persist adjudication in curate_corpus's comment, pinned
    at runtime: the static plan duplicates the collapse/host/LM
    subtrees ~12x (every downstream reference re-plans them), and AQE's
    exchange-stage reuse must dedup them at execution — each distinct
    shuffle materializes ONCE. Measured healthy census: 16 executed
    stages for the flags-off chain (explicit persists measured WORSE:
    27 stages + a cache-write pass). If reuse ever breaks (a conf
    change, a subtree that stops canonicalizing identically), the
    duplicated subtrees execute for real and this bound trips."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    snaps = spark.read.parquet(
        os.path.join(fx_t1, "crawl_snapshots.parquet"))
    sc = spark.sparkContext
    sc.setJobGroup("census", "curate flags-off")
    try:
        curate_corpus(snaps, **CFG).collect()
    finally:
        sc.setJobGroup(None, None)
    st = sc.statusTracker()
    stages = set()
    for j in st.getJobIdsForGroup("census") or []:
        info = st.getJobInfo(j)
        if info:
            stages.update(info.stageIds)
    executed = sum(
        1 for s in stages
        if (si := st.getStageInfo(s)) and si.numCompletedTasks > 0)
    assert 0 < executed <= 20, executed
