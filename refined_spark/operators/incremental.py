"""Incremental cross-snapshot dedup — dedup a NEW crawl increment
against the accumulated corpus WITHOUT re-touching history text.

Production pipelines (CCNet, RefinedWeb, FineWeb and every other
Common-Crawl consumer) ingest the web snapshot by snapshot: each
increment must drop documents the corpus already holds. Re-running
global dedup over history+increment is O(corpus) work per snapshot;
the scalable shape is a persisted MANIFEST of key-width state the
increment joins against:

- **exact**: one 8-byte content fingerprint per corpus document
  (xxhash64 of whitespace-canonicalized text — the
  textstats.with_fingerprint rule with a NULL guard added, since a
  crawl increment can carry extraction-failed NULL texts and nothing
  may condemn those);
- **near**: the per-doc MinHash signature table (``num_perm`` longs) —
  the state signature-based CC dedup pipelines persist between
  snapshots.

Scale shape: the increment's text NEVER joins against history text —
both manifests are key-width, the exact cut is one anti join on an
8-byte key, and the near cut joins band keys (16 bytes/row) then
verifies on signature pairs. Persist manifests bucketed by their join
key (``fingerprint`` / ``(band, bucket)``) so successive increments
co-locate without shuffling the corpus side; the ``broadcast_manifest``
hatch covers early-corpus sizes. The only text-carrying exchange is
the increment's own keep-first window — increment-scale, not
corpus-scale. Reference role: none (ReFinED consumes curated dumps);
part of the §2.6-style training-data tail beside
:mod:`refined_spark.operators.dedup` (the within-corpus batch modes).

Within-increment self-dedup: :func:`dedup_increment` elects keep-first
(min id) among increment rows sharing a fingerprint;
:func:`dedup_increment_near` deliberately does NOT self-pair the
increment — run the batch near-dup path (dedup.lsh_candidate_pairs →
jaccard_verify → drop_near_dups) on the surviving increment when
within-snapshot near-dups matter; cross-snapshot condemnation is this
module's job.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import config
from .dedup import band_buckets, minhash_signatures

_LOG = logging.getLogger(__name__)


def content_fingerprint(text_col: str = "text") -> Column:
    """NULL-safe 64-bit content fingerprint: xxhash64 of the
    whitespace-canonicalized text (trim + internal runs collapsed —
    the with_fingerprint rule). NULL text → NULL fingerprint (Spark's
    xxhash64 would otherwise fold every NULL doc onto the seed hash
    and dedup them together; the contract, like lines.py's empty-key
    rule, is that content-less rows are never dedup keys)."""
    # collapse FIRST, then trim: Spark/DuckDB trim strips spaces only,
    # so an edge tab/newline would otherwise survive as a leading space
    # and '\tef' would not dedup against 'ef' (hypothesis-found)
    canon = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return F.when(canon.isNull(), F.lit(None).cast("long")).otherwise(
        F.xxhash64(canon))


def corpus_manifest(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The exact-dedup manifest of a corpus: distinct non-null
    fingerprints, one column ``fingerprint`` (8 bytes/doc before the
    distinct). Build once from history, then roll forward with
    :func:`advance_manifest` — never recompute from the full corpus."""
    return (docs.select(content_fingerprint(text_col)
                        .alias("fingerprint"))
            .where(F.col("fingerprint").isNotNull())
            .distinct())


def dedup_increment(new_docs: DataFrame, manifest: DataFrame,
                    id_col: str = "doc_id", text_col: str = "text",
                    broadcast_manifest: bool = False) -> DataFrame:
    """The increment minus documents the corpus already holds, schema
    (and column order) preserved.

    Two cuts: (1) fingerprint anti join against the manifest — key-width
    on the corpus side, NULL-fingerprint rows survive by anti-join
    semantics (nothing condemns them); (2) keep-first election WITHIN
    the increment (min ``id_col`` per fingerprint, the lines.py
    keep-first convention) so the increment cannot re-admit its own
    internal copies — NULL fingerprints all pass. The election's
    row_number window is the one text-carrying exchange and is
    increment-scale."""
    helper = "_fp"
    while helper in new_docs.columns:
        helper += "_"
    probe = new_docs.withColumn(helper, content_fingerprint(text_col))
    m = manifest.select(F.col("fingerprint").alias(helper))
    if broadcast_manifest:
        m = F.broadcast(m)
    fresh = probe.join(m, [helper], "left_anti")
    # NULL fingerprints all pass the election, but a bare
    # partitionBy(fingerprint) would still funnel EVERY NULL-text row
    # (the docstring's extraction-failed scenario — can be millions on
    # a crawl increment) into one window partition to sort a number
    # nobody reads. Salting the partition key with the id for NULL
    # rows gives each its own partition (rn=1, passes anyway) and
    # leaves non-null keys untouched — the zero-signature mega-bucket
    # discipline applied to the election exchange.
    salt = F.when(F.col(helper).isNull(),
                  F.col(id_col)).otherwise(F.lit(0))
    rn = F.row_number().over(
        Window.partitionBy(F.col(helper), salt).orderBy(F.col(id_col)))
    kept = (fresh.withColumn("_rn", rn)
            .where(F.col(helper).isNull() | (F.col("_rn") == 1)))
    return kept.select(*new_docs.columns)


def advance_manifest(manifest: DataFrame, kept_docs: DataFrame,
                     text_col: str = "text") -> DataFrame:
    """The rolled-forward manifest: history ∪ the kept increment's
    fingerprints. Write this back bucketed by ``fingerprint`` so the
    next increment's anti join co-locates."""
    return manifest.unionByName(
        corpus_manifest(kept_docs, text_col)).distinct()


def save_manifest(manifest: DataFrame, table: str,
                  n_buckets: int = 256, path: str | None = None) -> None:
    """Persist the fingerprint manifest BUCKETED by its join key
    (``bucketBy`` + ``saveAsTable`` — bucket metadata lives in the
    catalog, which is why this is a table write, not a plain parquet
    path). At corpus scale the manifest is the big side of every future
    increment's anti join: bucketed, a sort-merge anti join reads it
    exchange-free and only the increment's own keys shuffle (to the
    manifest's bucket count) — the property
    ``test_bucketed_manifest_join_shuffles_increment_only`` pins on the
    physical plan. Size ``n_buckets`` so one bucket's fingerprints fit
    an executor core comfortably (8 B/doc: 2^12 buckets at 10^12 docs
    ≈ 2 GB/bucket raw) AND run the increment join with
    ``spark.sql.shuffle.partitions`` equal to it — with more shuffle
    partitions than buckets Spark re-shuffles the bucketed side up to
    the larger number, forfeiting the whole point."""
    w = (manifest.write.mode("overwrite")
         .bucketBy(n_buckets, "fingerprint").sortBy("fingerprint"))
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def load_manifest(spark, table: str) -> DataFrame:
    """The persisted manifest with its bucketing metadata attached (a
    plain ``spark.read.parquet`` of the same files would lose it and
    re-shuffle the corpus side of every increment join)."""
    return spark.table(table)


def signature_manifest(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       num_perm: int = config.MINHASH_PERMS,
                       k: int = config.SHINGLE_K) -> DataFrame:
    """The near-dup manifest: (id, sig) MinHash signatures of the
    corpus (dedup.minhash_signatures — all-JVM, zero-signature rows for
    empty docs are kept here and excluded at banding time). Roll
    forward by unioning the kept increment's signatures."""
    return minhash_signatures(docs, id_col=id_col, text_col=text_col,
                              num_perm=num_perm, k=k)


def estimated_jaccard(sig_a: Column, sig_b: Column) -> Column:
    """MinHash-estimated Jaccard: fraction of equal signature
    components — the standard unbiased estimator, computed JVM-side on
    the (bounded) candidate pairs only. Unequal signature lengths FAIL
    LOUDLY (assert_true): a ``num_perm`` drift between a long-lived
    persisted manifest and a later increment run would otherwise
    silently deflate every estimate (zip_with null-pads — an exact
    copy at 32-vs-64 perms would score 0.5 and be re-admitted)."""
    eq = F.zip_with(sig_a, sig_b,
                    lambda x, y: F.when(x == y, 1).otherwise(0))
    guard = F.assert_true(
        F.size(sig_a) == F.size(sig_b),
        F.lit("estimated_jaccard: signature length mismatch — the "
              "manifest and the increment were signed with different "
              "num_perm"))
    return (F.when(guard.isNull(),
                   F.aggregate(eq, F.lit(0), lambda acc, x: acc + x)
                   / F.size(sig_a)))


def dedup_increment_near(new_docs: DataFrame, sig_manifest: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         num_perm: int = config.MINHASH_PERMS,
                         k: int = config.SHINGLE_K,
                         bands: int = config.MINHASH_BANDS,
                         tau: float = 0.8,
                         max_bucket: int | None = config.LSH_MAX_BUCKET,
                         persist_manifest: bool = True) -> DataFrame:
    """The increment minus documents NEAR-duplicating the corpus,
    schema and column order preserved.

    Shape: sign the increment (one JVM pass), band both sides
    (dedup.band_buckets — zero signatures never band), join increment
    bands against manifest bands on (band, bucket) — 16-byte rows both
    sides — and verify surviving candidate pairs with the signature-
    estimated Jaccard at ``tau``; condemned increment ids leave via one
    anti join. History text is never read. The manifest-side bucket cap
    mirrors lsh_candidate_pairs' census guard: a band bucket holding
    more than ``max_bucket`` corpus docs is a degenerate key (its
    members re-pair in their other bands) and would fan every matching
    increment doc out ``bucket``-wide; drops are counted eagerly and
    logged, never silent. ``persist_manifest=False`` skips caching the
    manifest-side signatures (band_buckets' track barrier): right when
    the manifest is a parquet-backed table bigger than cluster cache —
    its consumers (census, band join, verify fetch) then re-scan
    instead of re-computing, which is what a stored table makes
    cheap."""
    new_sigs = minhash_signatures(new_docs, id_col=id_col,
                                  text_col=text_col,
                                  num_perm=num_perm, k=k)
    inc_b = band_buckets(new_sigs, bands)
    man_b = band_buckets(sig_manifest, bands, persist=persist_manifest)
    if max_bucket is not None:
        big = (man_b.groupBy("band", "bucket")
               .agg(F.count(F.lit(1)).alias("n"))
               .where(F.col("n") > max_bucket)
               .select("band", "bucket"))
        n_dropped = big.count()
        if n_dropped:
            _LOG.warning(
                "dedup_increment_near: dropped %d manifest bucket(s) "
                "larger than max_bucket=%d before the band join",
                n_dropped, max_bucket)
        man_b = man_b.join(F.broadcast(big), ["band", "bucket"],
                           "left_anti")
    cand = (inc_b.select(F.col("id").alias("new_id"), "band", "bucket")
            .join(man_b.select(F.col("id").alias("hist_id"),
                               "band", "bucket"),
                  ["band", "bucket"])
            .select("new_id", "hist_id").distinct())
    verified = (cand
                .join(new_sigs.select(F.col("id").alias("new_id"),
                                      F.col("sig").alias("sig_new")),
                      ["new_id"])
                .join(sig_manifest.select(F.col("id").alias("hist_id"),
                                          F.col("sig").alias("sig_hist")),
                      ["hist_id"])
                .where(estimated_jaccard(
                    F.col("sig_new"), F.col("sig_hist")) >= tau)
                .select("new_id").distinct())
    kept = new_docs.join(
        verified.withColumnRenamed("new_id", id_col), [id_col],
        "left_anti")
    return kept.select(*new_docs.columns)
