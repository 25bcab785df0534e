"""Deduplication suite for large-scale training-data pipelines.

Beyond the reference's operator set (per the build brief): exact dedup,
MinHash+LSH near-dup, SimHash, and n-gram Jaccard verification — each a
composition of built-in DataFrame ops plus (for the hash math) Arrow-
batched numpy, never per-row Python.

Scale notes:
- exact: one groupBy on a 128-bit content hash (md5) — pre-aggregated
  map-side, skew-free (hashes are uniform).
- MinHash-LSH: per-doc signature (pure JVM codegen — one xxhash64 per
  shingle, fixed-width re-hash per permutation; fuses into the scan, no
  Python anywhere on the doc-dedup path) → explode to
  (band_key, doc) → self-join within band buckets. Candidate pairs are
  bounded per band bucket; the band key is uniform by construction, so the
  shuffle is balanced. This is the same bounding trick the north_rule
  mandates for ER blocking (M6).
- SimHash: 64-bit signature; near-dup = identical signature (or banded
  16-bit quarters for hamming<=k candidate search).
- verification joins re-read only the shingle sets of CANDIDATE pairs.

Determinism: all hash seeds fixed; md5/xxhash are stable across runs.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import config
from ..caching import track

_LOG = logging.getLogger(__name__)

# fixed 64-bit hash-mixing parameters (splitmix64-style, public constants)
_MASK64 = (1 << 64) - 1


def _shingles(text: str, k: int) -> set[str]:
    """WORD k-gram shingles. Word-level (not char-level) shingling keeps
    the pairwise-jaccard distribution of unrelated same-domain documents
    near zero — char 3-grams of same-vocabulary text overlap ~40%+, which
    floods LSH buckets with O(n^2) false candidates."""
    toks = text.lower().split()
    if not toks:
        return set()
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _char_shingles(text: str, k: int) -> set[str]:
    """Character k-gram shingles — for SHORT strings (surface forms).
    Word shingles degenerate on 1-3 word surfaces (a single shingle, so one
    typo drops Jaccard to 0); char 3-grams keep typo'd aliases similar."""
    t = text.lower()
    if not t:
        return set()
    if len(t) <= k:
        return {t}
    return {t[i:i + k] for i in range(len(t) - k + 1)}


def _hash64(s: str, seed: int = 0) -> int:
    h = hashlib.blake2b(s.encode("utf-8"), digest_size=8,
                        key=seed.to_bytes(8, "little")).digest()
    return int.from_bytes(h, "little")


# ---- vectorized shingle hashing ------------------------------------------
#
# Round-1 review finding: the signature UDF rebuilt the permutation RNG per
# DOCUMENT and ran blake2b per SHINGLE — per-row Python on the hot path of
# both near-dup dedup and M6 blocking. Now:
#   * permutation constants are computed once per process (_perms cache);
#   * only DISTINCT TOKENS are hashed with blake2b (Zipf vocabulary ->
#     ~100% cache hits), word-shingle hashes are a vectorized positional
#     mix of the k token hashes;
#   * char shingles mix raw codepoints the same way (no per-shingle string
#     materialization at all);
#   * the (perms x shingles) min runs as one numpy matrix op per doc.
# Collision probability of the 64-bit mix is 2^-64 per pair — the same
# regime as hashing the shingle string directly.

_PERM_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}
_TOKEN_HASH_CACHE: dict[str, int] = {}
_POS_MULT_CACHE: dict[int, np.ndarray] = {}


def _perms(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    """Universal-hash constants h_i(x) = a_i*x + b_i mod 2^64 (odd a_i)."""
    if num_perm not in _PERM_CACHE:
        rng = np.random.Generator(np.random.PCG64(1234))
        a = rng.integers(1, _MASK64, size=num_perm,
                         dtype=np.uint64) | np.uint64(1)
        b = rng.integers(0, _MASK64, size=num_perm, dtype=np.uint64)
        _PERM_CACHE[num_perm] = (a, b)
    return _PERM_CACHE[num_perm]


def _pos_mult(n: int) -> np.ndarray:
    """n odd position-mixing multipliers (seeded, independent of _perms)."""
    if n not in _POS_MULT_CACHE:
        rng = np.random.Generator(np.random.PCG64(777))
        _POS_MULT_CACHE[n] = rng.integers(
            1, _MASK64, size=n, dtype=np.uint64) | np.uint64(1)
    return _POS_MULT_CACHE[n]


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain constants), vectorized."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _tok_hash(tok: str) -> int:
    v = _TOKEN_HASH_CACHE.get(tok)
    if v is None:
        v = _hash64(tok)
        if len(_TOKEN_HASH_CACHE) < 4_000_000:
            _TOKEN_HASH_CACHE[tok] = v
    return v


def _windowed_mix(h: np.ndarray, k: int) -> np.ndarray:
    """Distinct hashes of all k-wide windows of element-hash array h
    (or ONE hash of the whole array when len < k — mirroring _shingles)."""
    n = h.shape[0]
    if n == 0:
        return h
    width = k if n >= k else n
    n_sh = n - width + 1
    pos = _pos_mult(width)
    acc = np.zeros(n_sh, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(width):
            acc ^= h[j:j + n_sh] * pos[j]
        return np.unique(_mix64(acc))


def _word_shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = text.lower().split()
    h = np.fromiter((_tok_hash(t) for t in toks), dtype=np.uint64,
                    count=len(toks))
    return _windowed_mix(h, k)


def _char_shingle_hashes(text: str, k: int) -> np.ndarray:
    t = text.lower()
    cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
    return _windowed_mix(_mix64(cps.astype(np.uint64)), k)


def _minhash_sig(text: str, num_perm: int, k: int,
                 char: bool = False) -> list[int]:
    base = (_char_shingle_hashes(text, k) if char
            else _word_shingle_hashes(text, k))
    if base.size == 0:
        return [0] * num_perm
    a, b = _perms(num_perm)
    with np.errstate(over="ignore"):
        sigs = (base[None, :] * a[:, None] + b[:, None]).min(axis=1)
    return [int(x) for x in sigs.astype(np.int64)]


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (content_hash, n_dups, keep_id).

    keep_id = min id (the canonical survivor); only groups with n_dups > 1.
    """
    h = F.md5(F.col(text_col).cast("binary"))
    return (
        docs.select(F.col(id_col).alias("id"), h.alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_dups"), F.min("id").alias("keep_id"))
        .where(F.col("n_dups") > 1)
    )


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       num_perm: int = config.MINHASH_PERMS,
                       k: int = config.SHINGLE_K) -> DataFrame:
    """Per-doc MinHash signature, entirely JVM-side — no Python, no
    Arrow crossing, and (the part that matters) NO higher-order array
    lambdas on the per-shingle path: Spark evaluates HOF lambdas
    interpreted, per element, which measured ~100x slower than the same
    math inside whole-stage codegen.

    Physical shape: explode shingles -> xxhash64 per shingle -> ONE
    codegen hash aggregation per id whose ``num_perm`` buffers each take
    ``min(xxhash64(h, i))`` — the i-th "permutation" is a fixed-width
    re-hash of the 64-bit shingle hash, so per-perm cost is independent
    of shingle length and the whole explode→hash→partial-min pipeline is
    a single generated loop fused into the scan. The explode adds no
    shuffle (a doc's shingle rows stay in its scan partition) and
    map-side partial aggregation collapses them to ONE row per doc per
    partition before the exchange, so shuffle bytes are signature-scale,
    not shingle-scale.

    min under any fixed total order of a uniform hash is a valid minwise
    family, so signed-long order is fine. Empty/whitespace-only text
    keeps the zero-signature convention of the Python helper
    (_minhash_sig, retained for the M6 surface-form blocking UDF where a
    per-process memo beats codegen on Zipf-repeated short strings).

    ANSI note: the classic (a*h + b) mod 2^64 permutation family would
    throw under spark.sql.ansi.enabled on bigint overflow; the re-hash
    family needs no arithmetic at all.
    """
    words = (f"filter(split(lower(coalesce({text_col}, '')), '\\\\s+'),"
             f" w -> w != '')")
    # each WORD is hashed once; a k-gram shingle's hash mixes the k word
    # hashes with one fixed-width xxhash64 — no per-shingle string
    # materialization (concat_ws inside the lambda was the inner cost).
    # mirror _shingles: < k words -> ONE whole-text shingle; duplicates
    # are kept (min() is dedup-invariant, array_distinct would be waste).
    # empty text -> one NULL shingle row, so the doc keeps a groupBy row
    # and gets the zero signature via the coalesce below.
    mix_args = ", ".join(f"element_at(wh, i + {j})" for j in range(k))
    shingle_hashes = (
        f"CASE WHEN size(wh) = 0 THEN array(cast(null as bigint)) "
        f"WHEN size(wh) < {k} THEN"
        f" array(xxhash64(concat_ws(' ', w))) "
        f"ELSE transform(sequence(1, size(wh) - {k - 1}),"
        f" i -> xxhash64({mix_args})) END")
    hashed = (
        docs.select(F.col(id_col).alias("id"), F.expr(words).alias("w"))
        .select("id", "w",
                F.expr("transform(w, x -> xxhash64(x))").alias("wh"))
        .select("id", F.explode(F.expr(shingle_hashes)).alias("h")))
    # xxhash64 SKIPS null inputs (it would hash just the perm index and
    # give empty docs a non-null slot), so the null sentinel is gated
    h_ok = F.col("h").isNotNull()
    mins = hashed.groupBy("id").agg(
        *[F.min(F.when(h_ok, F.xxhash64("h", F.lit(i)))).alias(f"m{i}")
          for i in range(num_perm)])
    zero = F.lit(0).cast("long")
    return mins.select(
        "id",
        F.array(*[F.coalesce(F.col(f"m{i}"), zero)
                  for i in range(num_perm)]).alias("sig"))


def band_buckets(signatures: DataFrame,
                 bands: int = config.MINHASH_BANDS,
                 persist: bool = True) -> DataFrame:
    """(id, band, bucket) band keys of a signature frame — the LSH
    bucketing step shared by :func:`lsh_candidate_pairs` (within-corpus
    pair join) and incremental.dedup_increment_near (increment-vs-
    manifest join). Zero signatures are excluded (the empty-doc
    mega-bucket guard — see lsh_candidate_pairs) and the signature
    frame is persisted via track(): sig is an inlinable Column chain,
    so without the barrier Catalyst re-evaluates the full per-shingle
    hash pipeline once per band per consumer. Pass ``persist=False``
    when the signatures are a PERSISTED table, not a computed chain —
    a corpus-scale parquet-backed manifest re-reads cheaply and would
    blow executor storage if cached per call."""
    signatures = signatures.where(
        F.exists("sig", lambda x: x != F.lit(0)))
    if persist:
        signatures = track(signatures)
    sig_len = F.size("sig")
    # loud divisibility contract ('never silent'): a non-dividing band
    # count would silently ignore the signature tail (recall loss), and
    # bands > len(sig) would band an EMPTY slice — every doc in one
    # global bucket per band, an O(n^2) join
    guard = F.assert_true(
        (sig_len % bands == 0) & (F.lit(bands) <= sig_len),
        F.lit(f"band_buckets: bands={bands} must divide the signature "
              "length and not exceed it"))
    rows_per_band = F.when(guard.isNull(),
                           (sig_len / bands).cast("int"))
    return signatures.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice("sig", b * rows_per_band + 1,
                                        rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"),
             F.col("bk.bucket").alias("bucket"))


def lsh_candidate_pairs(signatures: DataFrame,
                        bands: int = config.MINHASH_BANDS,
                        max_bucket: int | None = config.LSH_MAX_BUCKET,
                        ) -> DataFrame:
    """Band the signature, bucket-join within bands → (id_a, id_b) distinct
    candidate pairs (id_a < id_b).

    Bucket blowup guards (both load-bearing on a real crawl corpus):

    - **Zero signatures are excluded from banding.** Empty/whitespace-only
      docs all carry the all-zero signature (``minhash_signatures``'s
      coalesce convention), hence the SAME bucket in every band — on a
      web crawl (millions of boilerplate-stripped/robots pages) that is
      one O(n²) mega-bucket in a single reducer. An empty doc has no
      content to near-dup match; :func:`exact_dedup_groups` already
      collapses byte-identical empties.
    - **Buckets larger than ``max_bucket`` are dropped** via a count
      pre-pass (the ``lsh_mention_pairs`` pattern, blocking.py) — a
      bucket that big signals a degenerate key, exactly what banding is
      meant to prevent; its members overwhelmingly re-pair in their other
      ``bands-1`` buckets. Never silent: the number of dropped buckets is
      counted eagerly and logged at WARNING. ``max_bucket=None`` disables
      the cap (exactness-test escape hatch).
    """
    # banding persists the SIGNATURE frame (track() inside
    # band_buckets): rows are (id, num_perm longs) — signature-sized
    # even at 10^9 docs (a cluster job would checkpoint this as a
    # stage table). The derived band expr is 8 cheap fixed-width
    # hashes per cached row per consumer.
    banded = band_buckets(signatures, bands)
    if max_bucket is not None:
        # count pre-pass over the (band, bucket) census — bucket-scale
        # rows, computed from the cached signatures. The eager count is
        # the "no silent caps" contract; on a cluster this is one cheap
        # job over a stage table.
        big = track(
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > max_bucket)
            .select("band", "bucket"))
        n_dropped = big.count()
        if n_dropped:
            _LOG.warning(
                "lsh_candidate_pairs: dropped %d bucket(s) larger than "
                "max_bucket=%d before the pair join", n_dropped, max_bucket)
        banded = banded.join(F.broadcast(big), ["band", "bucket"],
                             "left_anti")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(pairs: DataFrame, docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", k: int = config.SHINGLE_K,
                   threshold: float = 0.8,
                   broadcast_ids: bool = True) -> DataFrame:
    """Exact word-n-gram Jaccard on candidate pairs → (id_a, id_b,
    jaccard), filtered to >= threshold. Shingle sets are computed
    JVM-side (split + slice + concat_ws — codegen, no UDF).

    Plan shape (each step dup-scale after the first):

    1. Restrict the corpus to the candidate id set with a left-semi
       join against the broadcast exploded pair ids — the ONLY step
       that touches the corpus, and no corpus row crosses an exchange
       for it. ``broadcast_ids=False`` is the past-broadcast-range
       escape hatch (uniform-key shuffle; ids need no salt).
    2. Shingle the restricted rows ONCE into a persisted (id, shingles)
       frame. Without the restriction the shingle projection sits below
       the verify join and every corpus document gets shingled — and
       left unpersisted, Catalyst inlines the pushed-down threshold
       filter into the join CONDITION, re-evaluating the shingle
       transform per probed row (observed in the executed plan: the
       join condition carried three copies of the transform).
    3. Join pairs to the cached shingle frame on both sides — all
       dup-scale; AQE broadcasts whichever side fits, else a uniform
       shuffle.

    ``pairs`` also feeds the id set, so it is persisted too (two longs
    per row). Both caches are released via caching.release_caches() —
    a cluster job would checkpoint them as stage tables anyway."""
    pairs = track(pairs)
    cand_ids = pairs.select(
        F.explode(F.array("id_a", "id_b")).alias(id_col)).distinct()
    if broadcast_ids:
        cand_ids = F.broadcast(cand_ids)
    restricted = docs.join(cand_ids, on=id_col, how="left_semi")

    # minhash tokenization convention: split on \s+ and FILTER empty
    # tokens — trim() strips only spaces, so a trailing newline/tab
    # produced an empty edge token and a spurious shingle, flipping
    # near-threshold verify decisions on whitespace-padded web text
    # (r5 review: "to be or not\n" vs "to be or not" scored 0.5)
    words = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                r"\s+"),
        lambda w: w != F.lit(""))
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0),
                       F.greatest(F.size(words) - k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
        )
    )
    shingled = track(restricted.select(F.col(id_col).alias("id"),
                                       sh.alias("shingles")))
    a = shingled.alias("a")
    b = shingled.alias("b")
    joined = (
        pairs.join(a, pairs.id_a == F.col("a.id"))
        .join(b, pairs.id_b == F.col("b.id"))
        .select(
            "id_a", "id_b",
            F.size(F.array_intersect("a.shingles", "b.shingles"))
            .alias("inter"),
            F.size(F.array_union("a.shingles", "b.shingles")).alias("uni"),
        )
    )
    return (
        joined.withColumn(
            "jaccard",
            F.when(F.col("uni") > 0, F.col("inter") / F.col("uni"))
            .otherwise(F.lit(1.0)))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _simhash_half(words: str, hex_off: int) -> str:
    """SQL expr: one 32-bit SimHash half from md5-hex chars
    [hex_off, hex_off+8) of each token. 32-bit halves keep every
    intermediate in exact signed-64 range on BOTH engines (no sign /
    overflow divergence between Spark BIGINT and DuckDB BIGINT)."""
    tok_h = (f"transform({words}, w -> "
             f"cast(conv(substring(md5(encode(w, 'UTF-8')), {hex_off}, 8), "
             f"16, 10) as bigint))")
    return (
        f"aggregate(sequence(0, 31), cast(0 as bigint), (acc, j) -> acc + "
        f"if(aggregate({tok_h}, cast(0 as bigint), "
        f"(a, h) -> a + if((shiftright(h, j) & 1) = 1, 1, -1)) > 0, "
        f"shiftleft(cast(1 as bigint), j), cast(0 as bigint)))"
    )


def simhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens as TWO 32-bit halves
    (sim_hi, sim_lo) — entirely JVM-side (whole-stage codegen, fuses into
    the scan; no Python at all), and bit-for-bit reproducible in ANSI SQL
    (md5 + bit math), which is what makes the DuckDB oracle possible.

    Token hash = bits of md5(token); half j's bit i is set iff the count
    of tokens with that md5 bit set exceeds the count without (classic
    Charikar sign-sum).
    """
    words = (f"filter(split(lower({text_col}), '\\\\s+'), "
             f"w -> w != '')")
    return docs.select(
        F.col(id_col).alias("id"),
        F.expr(_simhash_half(words, 1)).alias("sim_hi"),
        F.expr(_simhash_half(words, 9)).alias("sim_lo"),
    )


def simhash_near_pairs(signatures: DataFrame, max_hamming: int = 3
                       ) -> DataFrame:
    """Banded hamming-<=k candidate search + exact verify.

    The 64-bit signature splits into 4 x 16-bit bands; any pair within
    hamming distance k <= 3 must agree on >= 1 band (pigeonhole), so
    same-band bucketing finds ALL such pairs — the shuffle is bounded per
    band bucket exactly like MinHash-LSH banding, no all-pairs join.
    Output: (id_a, id_b, hamming) with hamming <= max_hamming.

    ``max_hamming`` must stay <= 3: at 4 a pair can differ in one bit per
    band and agree on none, so 4-band bucketing would silently miss it —
    refused loudly rather than returning an incomplete pair set (a k >= 4
    search needs 1 + k bands, i.e. a different banding).
    """
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the 4-band pigeonhole "
            "guarantee (hamming <= 3); re-band with >= 1 + max_hamming "
            "bands for larger radii")
    # persist the signature frame: the two self-join sides share no
    # exchange, so an unpersisted sim_hi/sim_lo (an interpreted per-token
    # aggregate HOF) would be re-evaluated over the full corpus once per
    # side — the same defect class lsh_candidate_pairs persists against.
    # Rows are (id, 2 longs); released via caching.release_caches().
    # zero-signature guard (the lsh_candidate_pairs lesson applied to
    # SimHash): every empty/whitespace-only/NULL-text doc signs
    # (0, 0) and would land in ONE bucket in all 4 bands at hamming 0
    # — an O(n^2) self-join on a crawl's millions of empty pages.
    # Empty docs have no content to near-match; exact_dedup_groups
    # already collapses byte-identical empties.
    signatures = track(signatures.where(
        (F.col("sim_hi") != 0) | (F.col("sim_lo") != 0)))
    banded = signatures.select(
        "id", "sim_hi", "sim_lo",
        F.explode(F.array(
            F.struct(F.lit(0).alias("band"),
                     (F.col("sim_hi").bitwiseAND(0xFFFF)).alias("val")),
            F.struct(F.lit(1).alias("band"),
                     F.expr("shiftright(sim_hi, 16) & 65535").alias("val")),
            F.struct(F.lit(2).alias("band"),
                     (F.col("sim_lo").bitwiseAND(0xFFFF)).alias("val")),
            F.struct(F.lit(3).alias("band"),
                     F.expr("shiftright(sim_lo, 16) & 65535").alias("val")),
        )).alias("bk"),
    ).select("id", "sim_hi", "sim_lo",
             F.col("bk.band").alias("band"), F.col("bk.val").alias("val"))
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.expr("bit_count(a.sim_hi ^ b.sim_hi) "
                 "+ bit_count(a.sim_lo ^ b.sim_lo)")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.val") == F.col("b.val"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                ham.cast("int").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def near_dup_survivors(docs: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id",
                       quality_col: str = "n_chars") -> DataFrame:
    """Survivor selection — the step that turns near-dup PAIRS into a
    cleaned corpus: transitive closure over the pair edges (any of this
    module's pair sources: LSH candidates after :func:`jaccard_verify`,
    :func:`simhash_near_pairs`, ``similarity.cosine_near_pairs``), then
    per duplicate cluster keep the single best document.

    Keep rule: max quality, ties broken by min id — the standard web-
    corpus convention ("keep the longest / highest-quality copy");
    ``quality_col="n_chars"`` gives longest-wins, or pass any numeric
    score (operators/textstats.py). NULL quality sorts below every
    scored document: it survives only in an all-NULL cluster, where min
    id wins (pytest-gated; the driver corpus has no NULLs).

    Returns (id_col BIGINT, cluster_id BIGINT, is_survivor BOOLEAN)
    covering EVERY input document — docs in no pair are singleton
    survivors with cluster_id = own id; clustered docs get
    cluster_id = min doc id of their transitive cluster. Ids must be
    integral (they are the CC node ids directly — no hashing).

    Scale design: the iterative large-star/small-star closure
    (clustering.py) runs ONLY over the pair-edge node set — duplicate-
    cluster scale, a small fraction of a web corpus — never over the
    corpus. The survivor pick is one map-side-combining max(struct)
    aggregation on that same dup-scale frame, NOT a window sort over
    the corpus. The survivor id is folded INTO the dup-scale component
    frame first (a dup-scale join), so the corpus-scale frame crosses
    exactly ONE narrow left join — broadcastable whenever the dup
    clusters fit, one uniform-key shuffle otherwise; the component
    frame is persisted (track) for its two readers, released via
    caching.release_caches().

    Reference analog: generalizes exact_dedup_groups' keep-min-id
    convention to transitive near-dup clusters with a quality key.
    """
    from .clustering import connected_components

    edges = pairs.select(F.col("id_a").cast("long").alias("u"),
                         F.col("id_b").cast("long").alias("v"))
    comp = track(connected_components(edges))  # (node, component)

    q = F.coalesce(F.col(quality_col).cast("double"),
                   F.lit(float("-inf")))
    base = docs.select(F.col(id_col).cast("long").alias("id"),
                       q.alias("_q"))

    # survivor per component: dup-scale inner join + one partial-agg
    members = comp.join(base, comp.node == base.id).select(
        "component", "id", "_q")
    pick = members.groupBy("component").agg(
        F.max(F.struct(F.col("_q").alias("q"),
                       (-F.col("id")).alias("negid"))).alias("best"))
    surv = pick.select(
        "component", (-F.col("best.negid")).alias("survivor_id"))

    # fold the survivor id into the dup-scale frame, then ONE corpus join
    comp_surv = comp.join(surv, "component").select(
        "node", "component", "survivor_id")
    out = base.join(comp_surv, base.id == comp_surv.node, "left")
    return out.select(
        F.col("id").alias(id_col),
        F.coalesce("component", "id").alias("cluster_id"),
        # component null (singleton) -> the equality is NULL -> survivor
        F.coalesce(F.col("id") == F.col("survivor_id"),
                   F.lit(True)).alias("is_survivor"),
    )


def drop_near_dups(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id",
                   quality_col: str = "n_chars") -> DataFrame:
    """The cleaned corpus: ``docs`` filtered to near-dup survivors (one
    per transitive cluster + all singletons), original schema preserved.
    A left-semi join against the survivor id set — no corpus columns
    ride the survivor computation. The re-select restores the input
    column ORDER (a by-name join hoists the key column to the
    front)."""
    keep = (near_dup_survivors(docs, pairs, id_col, quality_col)
            .where("is_survivor").select(id_col))
    return (docs.join(keep, on=id_col, how="left_semi")
            .select(*docs.columns))
