"""Sequence packing: the training-example assembly step.

After curation, LLM pipelines do not feed variable-length documents to
the trainer — they CONCATENATE documents into a stream and slice it
into fixed-length sequences of ``seq_len`` tokens (GPT-2/3 data prep;
Megatron-LM's indexed-dataset build; T5 calls it "packing"). What the
build step actually materializes is not the token tensor but the
MANIFEST: for every training sequence, which (document, token-offset,
length) slices compose it. Reference role: none (ReFinED consumes
curated dumps); this is the §2.6-style training-data tail alongside
dedup / lm_quality / pii — the terminal step after
:mod:`refined_spark.operators.curation`.

A single global concatenation would serialize the corpus through one
task, so the distributed form shards first (every published pipeline
does — each data-loader worker owns an independent stream):

1. **Shard** — ``shard = hex16(md5(salt || id)) % n_shards``, where
   ``hex16`` reads the first 4 hex chars via ``instr`` arithmetic that
   both engines evaluate identically (:func:`shard_sql` emits the
   DuckDB replay from the same construction). Hashing decorrelates the
   stream from crawl/id order; ``n_shards`` is the parallelism knob —
   at cluster scale set it to O(data-loader workers).
2. **Offsets** — within a shard, documents order by id (unique → the
   order is total) and a running-sum window assigns each doc its start
   offset in the shard's token stream. This per-shard sort is the one
   corpus-scale wide operation in the job — it IS the published
   semantics (a stream is an order) — and it carries (id, shard,
   n_tokens) key-width rows only, never text. Sorts spill; shards
   stream through their reducer.
3. **Chunk fan-out** — a doc covering token interval [start, end)
   intersects sequences floor(start/L) .. floor((end-1)/L); the range
   explodes scan-locally via ``sequence()`` (a doc longer than L spans
   several sequences; zero-token docs vanish before the window).
4. **Tail drop** — each shard's final incomplete sequence is dropped
   (``drop_partial=False`` keeps it). Shard totals come from an
   unbounded-frame window over the SAME partitioning as the offset
   window — one exchange, one sort, and critically ONE corpus scan: a
   separate groupBy-totals frame would re-run the tokenizer regex (the
   job's dominant work) over the entire corpus a second time.

Token counts reuse the textstats convention (words + punct runs —
``[A-Za-z0-9]+|[^\\sA-Za-z0-9]``) so "token" means the same thing
across the engine; pass ``n_tokens_col`` to pack on real tokenizer
counts (e.g. :mod:`refined_spark.operators.bpe` output sizes).

The manifest is integer-only, so the DuckDB replay
(:func:`token_count_sql` / :func:`shard_sql` — emitted from the same
constants) is hash-exact, not approximate. :func:`materialize_sequences`
turns the manifest plus a token-array column into actual per-sequence
arrays (slice → ordered flatten), pytest-gated by the exactness
property that each shard's sequences concatenate back to exactly its
documents' token streams truncated at the tail drop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Must match textstats.with_token_count (and its oracle SQL) exactly.
TOKEN_PATTERN = r"[A-Za-z0-9]+|[^\sA-Za-z0-9]"
_HEX = "0123456789abcdef"
_SHARD_HEX_CHARS = 4  # 16 bits -> mod bias < n_shards/65536, negligible


def token_count(text: Column) -> Column:
    """Token count under the engine-wide textstats convention."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0))


def token_count_sql(expr: str) -> str:
    """DuckDB replay of :func:`token_count` (regex double-escaped per
    the SQL-literal convention)."""
    return (f"cast(len(regexp_extract_all({expr}, "
            f"'[A-Za-z0-9]+|[^\\sA-Za-z0-9]')) as int)")


def shard_of(key: Column, n_shards: int, salt: str = "") -> Column:
    """Deterministic cross-engine shard: the first 4 hex chars of
    md5(salt || key) read as an int via instr arithmetic (both engines
    index ``'0123456789abcdef'`` identically — no engine-specific
    hex-to-int builtin is portable), mod ``n_shards``."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    val = F.lit(0)
    for i in range(1, _SHARD_HEX_CHARS + 1):
        val = val * 16 + (F.instr(F.lit(_HEX), F.substring(h, i, 1)) - 1)
    return (val % n_shards).cast("int")


def shard_sql(key_expr: str, n_shards: int, salt: str = "") -> str:
    """DuckDB replay of :func:`shard_of`, emitted from the same
    construction (same hex alphabet, same char count, same fold)."""
    salt_lit = salt.replace("'", "''")
    h = f"md5('{salt_lit}' || cast({key_expr} as varchar))"
    val = "0"
    for i in range(1, _SHARD_HEX_CHARS + 1):
        val = (f"({val} * 16 + instr('{_HEX}', "
               f"substr({h}, {i}, 1)) - 1)")
    return f"cast({val} % {n_shards} as int)"


def pack_manifest(docs: DataFrame, seq_len: int, n_shards: int = 4,
                  id_col: str = "doc_id", text_col: str = "text",
                  n_tokens_col: str | None = None, salt: str = "",
                  drop_partial: bool = True) -> DataFrame:
    """Build the packed-sequence manifest.

    Returns one row per (sequence, document-slice):
    ``(shard, seq_id, pos_in_seq, doc_id, doc_offset, n_slice_tokens)``
    — sequence ``(shard, seq_id)`` is filled, in ``pos_in_seq`` order,
    by ``n_slice_tokens`` tokens of ``doc_id`` starting at that doc's
    ``doc_offset``. Every kept sequence holds exactly ``seq_len``
    tokens; a document longer than ``seq_len`` spans several
    sequences (the published semantics: no padding, documents cross
    sequence boundaries).

    Only (id, shard, n_tokens) rows enter the window and everything
    after it — document text never crosses an exchange.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    ident = F.col(id_col)
    n_tok = (F.col(n_tokens_col) if n_tokens_col
             else token_count(F.col(text_col)))
    base = (docs.select(ident.alias(id_col), n_tok.alias("_n_tok"),
                        shard_of(ident, n_shards, salt).alias("shard"))
            .where(F.col("_n_tok") > 0))

    # Both window specs share the partitioning, so Spark plans them
    # over ONE exchange + sort: a second groupBy for the shard totals
    # would re-scan the corpus and re-run the tokenizer regex — the
    # single most expensive work in the job — a second time.
    w = Window.partitionBy("shard").orderBy(id_col)
    w_all = (Window.partitionBy("shard")
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    offs = base.withColumn(
        "_start", F.sum("_n_tok").over(w) - F.col("_n_tok")).withColumn(
        "_n_full", F.floor(F.sum("_n_tok").over(w_all) / seq_len))

    first = F.floor(F.col("_start") / seq_len)
    last = F.floor((F.col("_start") + F.col("_n_tok") - 1) / seq_len)
    fan = offs.withColumn("seq_id", F.explode(F.sequence(first, last)))

    if drop_partial:
        fan = fan.where(F.col("seq_id") < F.col("_n_full"))

    g0 = F.greatest(F.col("seq_id") * seq_len, F.col("_start"))
    g1 = F.least((F.col("seq_id") + 1) * seq_len,
                 F.col("_start") + F.col("_n_tok"))
    return (fan.select(
        "shard",
        F.col("seq_id").cast("long").alias("seq_id"),
        (g0 - F.col("seq_id") * seq_len).cast("int").alias("pos_in_seq"),
        id_col,
        (g0 - F.col("_start")).cast("long").alias("doc_offset"),
        (g1 - g0).cast("int").alias("n_slice_tokens")))


def materialize_sequences(manifest: DataFrame, tokens: DataFrame,
                          id_col: str = "doc_id",
                          tokens_col: str = "tokens") -> DataFrame:
    """(shard, seq_id, tokens) — the actual training sequences. The
    manifest joins the token-array table on the doc id (the one
    exchange token arrays cross; broadcast-eligible when the manifest's
    doc slice list fits), each slice cuts JVM-side via ``F.slice``, and
    slices flatten in ``pos_in_seq`` order through a sorted
    collect_list (bounded: a sequence holds <= seq_len tokens)."""
    sliced = (manifest.join(tokens.select(id_col, tokens_col), id_col)
              .select("shard", "seq_id", "pos_in_seq",
                      F.slice(F.col(tokens_col),
                              F.col("doc_offset").cast("int") + 1,
                              F.col("n_slice_tokens")).alias("_part")))
    return (sliced.groupBy("shard", "seq_id")
            .agg(F.flatten(F.array_sort(F.collect_list(
                F.struct("pos_in_seq", "_part")))
                .getField("_part")).alias("tokens")))
