"""Benchmark decontamination — n-gram overlap vs an eval set.

Every published LLM training pipeline removes documents that overlap
the evaluation benchmarks (GPT-3 appendix C's 13-gram rule; PaLM,
Llama, FineWeb all ship a variant): a training document is
CONTAMINATED if any word n-gram of its normalized text also occurs in
any benchmark text. This module is that rule with the 100-TB dataflow:

1. :func:`benchmark_ngrams` — the benchmark side (eval suites are
   10^4-10^6 rows — model-config scale, NOT corpus scale) normalizes,
   tokenizes and explodes to a DISTINCT n-gram key set.
2. :func:`contaminated_ids` — the corpus side explodes its n-grams
   SCAN-LOCALLY (rows stay in their scan partition; the ``when(...)``
   fold below makes short docs explode to zero rows instead of feeding
   a pushdown-vulnerable filter — the spans.py codegen lesson), then
   LEFT-SEMI joins the BROADCAST benchmark set: corpus text never
   crosses an exchange, and the only shuffle is the per-doc hit
   aggregation over MATCHED (id, gram) pairs — contamination-scale,
   not corpus-scale. ``broadcast_bench=False`` is the escape hatch for
   beyond-broadcast benchmark sets (shuffle join keyed on the gram).
3. :func:`drop_contaminated` — corpus minus hits via a key-width
   anti join (anti joins never expand hot keys).

Normalization is the pipeline's shared convention — lowercase
``[a-z0-9]+`` token runs (lm_quality.TOKEN_RE), n-grams joined by a
single space — and the DuckDB oracle replays it with the IDENTICAL
regex over ``regexp_extract_all`` + list slices, so the gate compares
exact string keys, not statistics.

Reference role: none (the reference consumes curated dumps); this is
the §2.6-style training-data tail alongside dedup/lm_quality/pii.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lm_quality import TOKEN_RE


def _ngrams(text_col: str, n: int) -> Column:
    """Array of space-joined word n-grams of the normalized text; NULL
    (not empty-array) when the doc has < n tokens, so it can sit
    directly in an ``explode`` input and drop short docs without a
    ``where()`` (Generate inputs are not subject to filter pushdown —
    keeps the tokenize chain one step per Project, codegen-safe)."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit(TOKEN_RE), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, grams)


def benchmark_ngrams(bench: DataFrame, n: int = 8,
                     text_col: str = "text") -> DataFrame:
    """DISTINCT (gram) key set of the benchmark suite — the broadcast
    side. The distinct is map-side-combining and its exchange carries
    gram strings only."""
    return (bench.select(F.explode(_ngrams(text_col, n)).alias("gram"))
            .distinct())


def contaminated_ids(docs: DataFrame, bench_grams: DataFrame, n: int = 8,
                     id_col: str = "doc_id", text_col: str = "text",
                     broadcast_bench: bool = True) -> DataFrame:
    """(id, n_hit_grams) per contaminated document — n_hit_grams =
    DISTINCT benchmark n-grams the doc shares (the audit number GPT-3's
    appendix reports). Clean docs do not appear."""
    grams = docs.select(F.col(id_col),
                        F.explode(_ngrams(text_col, n)).alias("gram"))
    side = bench_grams
    if broadcast_bench:
        side = F.broadcast(side)
    hits = grams.join(side, "gram", "left_semi")
    return (hits.groupBy(id_col)
            .agg(F.count_distinct("gram").alias("n_hit_grams")))


def drop_contaminated(docs: DataFrame, bench: DataFrame, n: int = 8,
                      id_col: str = "doc_id", text_col: str = "text",
                      bench_text_col: str = "text",
                      broadcast_bench: bool = True) -> DataFrame:
    """The corpus minus contaminated documents, schema preserved (the
    re-select restores the input column ORDER — a by-name join hoists
    the key column to the front)."""
    bad = contaminated_ids(
        docs, benchmark_ngrams(bench, n, bench_text_col), n,
        id_col, text_col, broadcast_bench).select(id_col)
    return docs.join(bad, id_col, "left_anti").select(*docs.columns)


# -- shared DuckDB replay emitter (oracle cannot drift) --

def ngram_sql(rel: str, id_expr: str, n: int,
              text_col: str = "text") -> str:
    """SELECT emitting (id, gram) word n-gram rows of ``rel`` under the
    identical normalization (regex verbatim from TOKEN_RE; same
    space-join; docs with < n tokens emit zero rows)."""
    return f"""
        with _w as (select {id_expr} as id,
                           regexp_extract_all(lower({text_col}),
                                              '{TOKEN_RE}') as ws
                    from {rel})
        select id, array_to_string(ws[i:i+{n - 1}], ' ') as gram
        from _w, unnest(generate_series(1, len(ws) - {n - 1})) as t(i)
        where len(ws) >= {n}
    """
