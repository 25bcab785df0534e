"""E2 — byte-level BPE tokenization with character offsets.

The reference tokenizes every document with a pretrained RoBERTa
byte-level BPE via HuggingFace fast tokenizers and keeps the char-offset
mapping per word-piece (ref src/refined/doc_preprocessing/
preprocessor.py:211-237; tokens feed chunking E4 and the transformer).
This module re-expresses the same contract Spark-first:

- the merges table is an offline artifact (the reference ships its vocab
  as a downloaded resource; here `train_bpe` builds a deterministic one
  from a corpus at fixture-gen time) stored as parquet `(rank, left,
  right)`;
- encoding runs as ONE Arrow-batched pandas UDF over the text column —
  the merges table is tiny (|vocab| rows), loaded once per executor
  process from the artifact path and cached at module level, exactly the
  executor-side-artifact pattern used for the match dictionary (no
  driver collect, no per-row Python state rebuild);
- output is `ARRAY<STRUCT<piece, token_id, start, end>>` with start/end
  as CHARACTER offsets into the input text (the reference's
  `offset_mapping` contract), so downstream span math composes with the
  extraction/mention operators unchanged.

Byte-level details follow the published GPT-2 scheme: text is
pre-tokenized with the GPT-2 regex (contractions split off, leading
space glued to the following word), each pre-token's UTF-8 bytes are
mapped through the reversible printable-byte alphabet, and merges apply
greedily lowest-rank-first within a pre-token. Token ids are
engine-defined (byte tokens = byte value, merge k = 256 + k) since the
reference's ids come from its shipped vocab file.

At 100 TB the plan shape is: parquet scan -> one WholeStageCodegen
projection -> one Arrow crossing for the UDF. No shuffle, no driver
state; the merges artifact rides the executor filesystem (or a
broadcast-file at cluster scale).
"""

from __future__ import annotations

import logging
import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..caching import track

# GPT-2 pre-tokenizer, translated to stdlib `re` classes:
#   \p{L} -> [^\W\d_]   (unicode letters)
#   \p{N} -> \d         (unicode digits)
#   other -> [^\s\w]|_  (everything else that isn't whitespace)
_LOG = logging.getLogger(__name__)

PRETOKEN_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[^\W\d_]+"
    r"| ?\d+"
    r"| ?(?:[^\s\w]|_)+"
    r"|\s+(?!\S)|\s+"
)


@lru_cache(maxsize=1)
def byte_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte->printable-unicode alphabet: the 188
    printable latin-1 bytes map to themselves, the rest to 256+n."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def map_word(raw: str) -> str:
    """UTF-8 bytes of a pre-token through the byte alphabet (one mapped
    char per byte)."""
    b2u = byte_to_unicode()
    return "".join(b2u[b] for b in raw.encode("utf-8"))


def pretokenize(text: str) -> list[tuple[str, int, int]]:
    """(raw_piece, char_start, char_end) per GPT-2 pre-token; whitespace
    runs that are pure separators (no following merge partner) are kept
    by the GPT-2 pattern and tokenized like any other piece."""
    return [(m.group(0), m.start(), m.end())
            for m in PRETOKEN_RE.finditer(text)]


# --------------------------------------------------------------------------
# training (offline artifact build — the reference downloads its vocab;
# we derive one deterministically from a corpus)
# --------------------------------------------------------------------------

def train_bpe(texts, n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE training over mapped pre-token frequencies.

    Deterministic: ties on pair frequency break on the lexicographically
    smallest (left, right). Sequential by design — the artifact build is
    a one-time offline step over a bounded sample (the reference's vocab
    is likewise a fixed shipped resource, not recomputed per job).
    """
    word_freq: dict[tuple[str, ...], int] = {}
    for text in texts:
        for raw, _, _ in pretokenize(text):
            w = tuple(map_word(raw))
            if w:
                word_freq[w] = word_freq.get(w, 0) + 1
    return _merge_loop(word_freq, n_merges)


def _merge_loop(word_freq: dict[tuple[str, ...], int],
                n_merges: int) -> list[tuple[str, str]]:
    """The sequential greedy merge loop over a (symbol-tuple -> freq)
    table — shared by :func:`train_bpe` (in-process corpora) and
    :func:`train_bpe_spark`'s driver fast path (the collected Zipf
    word-frequency table). Ties on pair frequency break on the
    lexicographically smallest (left, right)."""
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_freq: dict[tuple[str, str], int] = {}
        for w, f in word_freq.items():
            for i in range(len(w) - 1):
                p = (w[i], w[i + 1])
                pair_freq[p] = pair_freq.get(p, 0) + f
        if not pair_freq:
            break
        best = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_freq: dict[tuple[str, ...], int] = {}
        for w, f in word_freq.items():
            out, i = [], 0
            while i < len(w):
                if (i < len(w) - 1 and w[i] == best[0]
                        and w[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            t = tuple(out)
            new_freq[t] = new_freq.get(t, 0) + f
        word_freq = new_freq
    return merges


# --------------------------------------------------------------------------
# encoding
# --------------------------------------------------------------------------

def encode_word(mapped: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge within one pre-token (the public
    GPT-2 encoder loop): repeatedly merge every leftmost occurrence of
    the lowest-ranked adjacent pair until none applies."""
    word = list(mapped)
    while len(word) > 1:
        pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, (a, b) = min(ranked)
        out, i = [], 0
        while i < len(word):
            if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(word[i])
                i += 1
        word = out
    return word


def piece_ids(merges: list[tuple[str, str]]) -> dict[str, int]:
    """byte tokens = byte value; merge k = 256 + k (engine-defined —
    the reference's ids come from its shipped vocab file)."""
    u2b = {c: b for b, c in byte_to_unicode().items()}
    ids = {c: b for c, b in u2b.items()}
    for k, (a, b) in enumerate(merges):
        ids[a + b] = 256 + k
    return ids


def encode_text(text: str, ranks: dict[tuple[str, str], int],
                ids: dict[str, int]) -> list[tuple[str, int, int, int]]:
    """(piece, token_id, char_start, char_end) over a full text.

    Offsets: each mapped char is one UTF-8 byte, so a piece covers a
    byte range of the pre-token; byte endpoints snap to the enclosing
    character (multi-byte chars can be split across pieces — same
    enclosing-char rounding HF's offset_mapping applies).
    """
    out = []
    for raw, s, _ in pretokenize(text):
        # char index of every byte of the pre-token
        char_of_byte = []
        for ci, ch in enumerate(raw):
            char_of_byte.extend([ci] * len(ch.encode("utf-8")))
        b0 = 0
        for piece in encode_word(map_word(raw), ranks):
            b1 = b0 + len(piece)
            out.append((piece, ids[piece],
                        s + char_of_byte[b0],
                        s + char_of_byte[b1 - 1] + 1))
            b0 = b1
    return out


# --------------------------------------------------------------------------
# rank-order replay — INDEPENDENT second implementation used for goldens
# --------------------------------------------------------------------------

def encode_word_rank_replay(mapped: str,
                            merges: list[tuple[str, str]]) -> list[str]:
    """Apply merges strictly in rank order, each exhaustively left to
    right — the original BPE formulation. Provably equivalent to the
    greedy min-rank loop (a merge's operands are built only from
    earlier-ranked pieces, so later merges never create earlier pairs),
    but a disjoint code path: used at fixture-gen time to produce the
    golden the Spark UDF is checked against."""
    word = list(mapped)
    for a, b in merges:
        out, i = [], 0
        while i < len(word):
            if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(word[i])
                i += 1
        word = out
    return word


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------

TOKEN_SCHEMA = ArrayType(StructType([
    StructField("piece", StringType()),
    StructField("token_id", IntegerType()),
    StructField("start", IntegerType()),
    StructField("end", IntegerType()),
]))

_ARTIFACT_CACHE: dict[str, tuple[dict, dict]] = {}


def load_merges(path: str) -> list[tuple[str, str]]:
    import pyarrow.parquet as pq

    t = pq.read_table(path).sort_by("rank")
    return list(zip(t["left"].to_pylist(), t["right"].to_pylist()))


def _ranks_ids(path: str) -> tuple[dict, dict]:
    """Per-executor-process artifact load (same pattern as the match
    dictionary: file read on first use, module-cache after)."""
    if path not in _ARTIFACT_CACHE:
        merges = load_merges(path)
        ranks = {p: k for k, p in enumerate(merges)}
        _ARTIFACT_CACHE[path] = (ranks, piece_ids(merges))
    return _ARTIFACT_CACHE[path]


def save_merges(path: str, merges: list[tuple[str, str]]) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "rank": pa.array(range(len(merges)), pa.int32()),
        "left": pa.array([a for a, _ in merges], pa.string()),
        "right": pa.array([b for _, b in merges], pa.string()),
    }), path)


def with_bpe_tokens(df: DataFrame, merges_path: str,
                    text_col: str = "text",
                    out_col: str = "tokens") -> DataFrame:
    """tokens ARRAY<STRUCT<piece, token_id, start, end>> via one Arrow
    crossing; merges artifact loaded executor-side from `merges_path`."""

    @F.pandas_udf(TOKEN_SCHEMA)
    def enc(texts: pd.Series) -> pd.Series:
        ranks, ids = _ranks_ids(merges_path)
        return texts.map(lambda t: encode_text(t or "", ranks, ids))

    return df.withColumn(out_col, enc(F.col(text_col)))

# --------------------------------------------------------------------------
# distributed training — the same algorithm as train_bpe, Spark-shaped
# --------------------------------------------------------------------------

def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the GPT-2 pre-tokenization + byte alphabet —
    the ONE corpus-scale step of BPE training (fastBPE/HF train from
    exactly this table). One Arrow crossing (pretokenize + map_word are
    the module's shared Python atoms, so the distributed trainer cannot
    drift from the sequential one at the word level), then one
    map-side-combining count aggregation; the exchange carries
    (word, partial-count) Zipf-vocabulary rows, never text."""

    def gen(batches):
        for pdf in batches:
            words: list[str] = []
            for text in pdf[text_col]:
                for raw, _, _ in pretokenize(text or ""):
                    w = map_word(raw)
                    if w:
                        words.append(w)
            yield pd.DataFrame({"word": words})

    return (docs.select(text_col).mapInPandas(gen, "word string")
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def train_bpe_spark(docs: DataFrame, n_merges: int,
                    text_col: str = "text",
                    vocab_partitions: int = 1,
                    checkpoint_every: int = 8,
                    driver_vocab_limit: int = 5_000_000,
                    ) -> list[tuple[str, str]]:
    """Distributed BPE training, bit-identical to :func:`train_bpe`
    (pytest pins equality across all three paths; the `bpe_train` gate
    replays the fixture artifact): same overlapping-pair counts, same
    (-freq, pair) tie-break (Spark UTF8_BINARY string order == Python
    code-point order: UTF-8 byte order is code-point-preserving), same
    greedy left-to-right rewrite.

    The corpus-scale work IS :func:`word_frequencies` — one Arrow pass
    + one map-side-combining count agg; everything after runs over the
    Zipf (word, freq) table. Two merge-loop strategies:

    - **Driver fast path (default)**: when the distinct-word table has
      at most ``driver_vocab_limit`` rows, collect it and run the
      sequential :func:`_merge_loop` in-process — zero scheduled Spark
      jobs per merge round. This is how fastBPE/HF train: a real web
      corpus has ~10^6-10^7 distinct pre-tokens (tens of MB), and a
      production 32k-100k-merge build through the distributed loop
      would pay ~10^4-10^5 driver round-trips of pure scheduling
      latency (measured: see BASELINE.md r5 — ~0.18 s/merge
      distributed vs ~1 ms/merge collected at 1k merges on the
      fixture vocabulary). The probe is ``limit(n+1).collect()`` on
      the aggregated frame — one job, no separate count.
    - **Distributed fallback** (``driver_vocab_limit=0`` or a
      beyond-limit vocabulary): the merge loop over the vocab-scale
      frame — per round one pair-count aggregation (explode of
      adjacent `arrays_zip` pairs, map-side combining), one 1-row
      argmax collect (the algorithm's inherent sequential dependency —
      each merge depends on the last), and one JVM fold rewrite.
      `localCheckpoint` every ``checkpoint_every`` rounds truncates
      the iterative lineage (the classic iterative-plan blowup
      otherwise re-analyzes k nested HOFs at round k). Distinct words
      stay distinct under merging (the symbol concatenation is
      invariant), so the sequential algorithm's re-key step is a
      provable no-op and is skipped. ``vocab_partitions`` sizes the
      loop frame — 1 for fixture/test vocabularies, O(cores) when the
      distinct-word table is genuinely large."""
    wf = word_frequencies(docs, text_col)
    if driver_vocab_limit:
        # materialize the vocab table ONCE before probing: the probe's
        # limit() runs the full corpus aggregation anyway, and without
        # a barrier the fallback path would re-run that corpus pass —
        # the job's dominant cost in exactly the too-big-vocab regime —
        # a second time. track() (persist), not localCheckpoint: the
        # cached vocab-scale blocks are then reclaimable via
        # release_caches() instead of stranding per call (caching.py's
        # stranded-cache class, r5 review).
        wf = track(wf)
        # Arrow transfer, not row collect: at the production vocabulary
        # shape (10^6-10^7 distinct words) toPandas moves the table 4x
        # faster than the py4j row path (measured: 1.6s vs 6.5s at 2M
        # rows), and the probe stays one job either way.
        pdf = wf.limit(driver_vocab_limit + 1).toPandas()
        if len(pdf) <= driver_vocab_limit:
            word_freq = {tuple(w): int(f)
                         for w, f in zip(pdf["word"], pdf["freq"])}
            return _merge_loop(word_freq, n_merges)
        _LOG.warning(
            "train_bpe_spark: > %d distinct words — falling back to "
            "the distributed merge loop", driver_vocab_limit)
    cur = (wf
           .select(F.regexp_extract_all("word", F.lit("."), 0)
                   .alias("syms"), "freq")
           .coalesce(vocab_partitions)
           .localCheckpoint())
    last_ckpt = cur
    merges: list[tuple[str, str]] = []
    since_ckpt = 0
    for _ in range(n_merges):
        z = F.arrays_zip(
            F.slice("syms", 1, F.size("syms") - 1).alias("l"),
            F.slice("syms", 2, F.size("syms") - 1).alias("r"))
        best = (cur.where(F.size("syms") > 1)
                .select(F.explode(z).alias("p"), "freq")
                .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.sum("freq").alias("c"))
                .orderBy(F.desc("c"), "l", "r").limit(1).collect())
        if not best:
            break
        a, b = best[0].l, best[0].r
        merges.append((a, b))
        merged = a + b
        rewrite = F.aggregate(
            "syms", F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.try_element_at(acc, F.lit(-1)) == a) & (s == b),
                F.concat(F.slice(acc, 1, F.size(acc) - 1),
                         F.array(F.lit(merged))))
            .otherwise(F.concat(acc, F.array(s))))
        nxt = cur.withColumn("syms", rewrite)
        since_ckpt += 1
        if since_ckpt >= checkpoint_every:
            nxt = nxt.localCheckpoint()
            last_ckpt.unpersist()
            last_ckpt = nxt
            since_ckpt = 0
        cur = nxt
    last_ckpt.unpersist()
    return merges
