"""Paragraph/line-level exact dedup + boilerplate-line removal.

CCNet (Wenzek et al. 2019 §4.1) deduplicates web text at PARAGRAPH
granularity before anything model-based: normalize each paragraph
(lowercase, digits folded to a single symbol, punctuation stripped),
hash it, and keep only the FIRST occurrence corpus-wide. C4 ships the
three-sentence-span variant and RefinedWeb the line-level one, plus the
boilerplate cut both describe: lines repeated across many documents
(cookie banners, nav menus, copyright footers) are dropped from EVERY
document. Reference role: none (ReFinED consumes curated dumps); this
is the §2.6-style training-data tail alongside dedup/lm_quality/pii —
it is the step that runs BETWEEN crawl-snapshot collapse and
document-level near-dup on a real web pipeline.

Dataflow (the 100-TB shape):

1. :func:`doc_lines` — posexplode the separator-split text
   SCAN-LOCALLY (rows stay in their scan partition); each line gets a
   ``key`` = ``md5`` of its CCNet normalization, or NULL when the
   normalization is empty. Empty-normalization lines (blank lines,
   separators, punctuation-only decorations) are NEVER dedup keys — a
   blank line occurs in essentially every document, so keying it would
   recreate the LSH zero-signature mega-bucket (the r3-verdict scale
   defect, here excluded at design time): they pass through untouched.
2. :func:`line_dedup_keep_first` — winner per key = ``min(struct(id,
   pos))``, a map-side-combining aggregation whose exchange carries
   (md5-key, id, pos) ONLY — line text never enters the election.
   128-bit keys, not 64: at 10^12 lines a 64-bit space yields ~10^4
   birthday collisions (CCNet itself uses 64 bits of SHA1 and accepts
   them; md5 here costs the same one scan-side hash and keeps the
   driver gate exact).
3. :func:`boilerplate_line_keys` / :func:`drop_boilerplate_lines` —
   the frequency cut: keys seen in >= ``min_docs`` DISTINCT documents
   (one key-width count-distinct agg; the condemned set is
   boilerplate-scale, far smaller than the line dimension) are removed
   from every document via a broadcast anti join on key-width rows
   (``broadcast_keys=False`` is the beyond-broadcast escape hatch — an
   anti join never expands hot keys).
4. :func:`_reassemble` (shared) — surviving positions fold to ONE
   sorted int-array row per doc, then join the corpus by its id: the
   single exchange document text crosses (same accepted class as
   crawl.latest_snapshot's collapse; with doc-id-bucketed storage it is
   exchange-free), and the rebuild maps the kept-position array with
   O(1) ``element_at`` + ``array_join`` — linear in kept lines, no UDF
   anywhere in the module.

``sep`` is a LITERAL separator on both engines: the Spark side quotes
it (``\\Q…\\E``) before handing it to the regex-based ``split``, so a
separator like ``"|"`` or ``"."`` splits on that character, not on
every character; the DuckDB replay's ``string_split`` is literal by
definition. Separators containing the ``\\E`` quoting terminator are
refused loudly.

Both engines share the normalization verbatim: the Spark Column chain
and :func:`norm_line_sql` (the DuckDB replay emitter) are generated
from the same ordered (pattern, replacement) list, so the oracle cannot
drift rule-by-rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LINE_SEP = "\n"


def _sep_pattern(sep: str) -> str:
    """Regex-quote the literal separator for Spark's regex ``split``
    (the DuckDB replay's string_split is literal already)."""
    if r"\E" in sep:
        raise ValueError(
            r"separator must not contain the regex quoting terminator \E")
    return "\\Q" + sep + "\\E"

# CCNet normalization as an ordered (regex, replacement) list — the
# single source of truth for BOTH engines (Spark compiles it below,
# norm_line_sql emits the DuckDB replay). Order is load-bearing:
# digits fold BEFORE the charset strip (so '0' survives via the
# [a-z0 ] class), whitespace collapses last.
_NORM_RULES: tuple[tuple[str, str], ...] = (
    ("[0-9]", "0"),        # fold digits: '© 2019' == '© 2024'
    ("[^a-z0 ]", ""),      # strip punctuation/markup/non-ascii
    (" +", " "),           # collapse runs of spaces
)


def norm_line(line: Column) -> Column:
    """CCNet line normalization as a pure-codegen Column chain."""
    x = F.lower(line)
    for pat, rep in _NORM_RULES:
        x = F.regexp_replace(x, pat, rep)
    return F.trim(x)


def norm_line_sql(expr: str) -> str:
    """DuckDB replay of :func:`norm_line` over ``expr`` — emitted from
    the SAME rule list (DuckDB needs the explicit 'g' flag Spark
    implies)."""
    x = f"lower({expr})"
    for pat, rep in _NORM_RULES:
        x = f"regexp_replace({x}, '{pat}', '{rep}', 'g')"
    return f"trim({x})"


def doc_lines(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", sep: str = LINE_SEP) -> DataFrame:
    """(id, pos, line, key) — scan-local posexplode of the split text.
    ``key`` is md5(normalized line), NULL when the normalization is
    empty (such lines are pass-through: never deduped, never counted
    as boilerplate)."""
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _sep_pattern(sep), -1))
        .alias("pos", "line"))
    norm = norm_line(F.col("line"))
    return lines.withColumn("key", F.when(norm != "", F.md5(norm)))


def _reassemble(docs: DataFrame, kept: DataFrame, id_col: str,
                text_col: str, sep: str, drop_empty: bool) -> DataFrame:
    """Rebuild each document from its surviving line positions.

    ``kept`` is (id, pos) — key-width. It folds to one sorted int-array
    row per doc (map-side-combining collect over ints), then joins the
    corpus on its id — the one exchange document text crosses — and the
    text rebuilds JVM-side by mapping the kept positions with O(1)
    ``element_at`` (linear in kept lines). Docs with NO surviving
    lines are dropped when ``drop_empty`` (a fully-duplicate page IS a
    duplicate), else kept with empty text."""
    # chaining the two line stages is the documented curation order:
    # a prior stage's audit columns are REPLACED (dropped here, re-
    # attached below), never duplicated — duplicate names break any
    # downstream write ('Found duplicate column(s)')
    docs = docs.drop("n_lines_kept", "n_lines_dropped")
    kept_arr = (kept.groupBy(id_col)
                .agg(F.sort_array(F.collect_list("pos")).alias("_kept")))
    joined = docs.join(kept_arr, id_col, "left")
    parts = F.split(F.col(text_col), _sep_pattern(sep), -1)
    # map over the KEPT positions and index into parts — O(kept) with
    # O(1) element_at, vs the O(lines x kept) per-document cost of a
    # filter-by-index + array_contains scan (quadratic on long pages).
    # Positions come from posexplode of the SAME split, so indexing is
    # in-bounds by construction; element_at stays loud (ANSI) if that
    # contract is ever violated.
    rebuilt = F.array_join(
        F.transform("_kept", lambda i: F.element_at(parts, i + 1)), sep)
    out = (joined
           .withColumn("n_lines_kept",
                       F.coalesce(F.size("_kept"), F.lit(0)))
           .withColumn("n_lines_dropped",
                       F.size(parts) - F.col("n_lines_kept"))
           .withColumn(text_col,
                       F.when(F.col("_kept").isNotNull(), rebuilt)
                       .otherwise(F.lit(""))))
    if drop_empty:
        out = out.where(F.col("n_lines_kept") > 0)
    # input columns in input ORDER (the by-name join hoists the id to
    # the front), audit columns appended
    return out.select(*docs.columns, "n_lines_kept", "n_lines_dropped")


def line_dedup_keep_first(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", sep: str = LINE_SEP,
                          drop_empty: bool = True) -> DataFrame:
    """CCNet paragraph dedup: corpus-wide, each distinct normalized
    line survives only at its FIRST occurrence — the minimum (id, pos)
    under the column's total order (deterministic: ids are unique, so
    ties cannot arise across docs; within a doc, pos orders). Within
    one document a repeated line is likewise kept once.

    Returns the corpus with ``text`` rebuilt from surviving lines plus
    ``n_lines_kept`` / ``n_lines_dropped`` audit columns; documents
    whose every line already occurred earlier are dropped (see
    ``drop_empty``). Pass-through (empty-normalization) lines always
    survive with their document."""
    lines = doc_lines(docs, id_col, text_col, sep)
    winners = (lines.where(F.col("key").isNotNull())
               .groupBy("key")
               .agg(F.min(F.struct(id_col, "pos")).alias("w"))
               .select(F.col(f"w.{id_col}").alias(id_col),
                       F.col("w.pos").alias("pos")))
    passthrough = (lines.where(F.col("key").isNull())
                   .select(id_col, "pos"))
    kept = winners.unionByName(passthrough)
    return _reassemble(docs, kept, id_col, text_col, sep, drop_empty)


def boilerplate_line_keys(docs: DataFrame, min_docs: int = 3,
                          id_col: str = "doc_id",
                          text_col: str = "text",
                          sep: str = LINE_SEP) -> DataFrame:
    """(key, n_docs) for every normalized line occurring in >=
    ``min_docs`` DISTINCT documents — one map-side-combining
    count-distinct over key-width rows. The result is
    boilerplate-scale (the repeated tail of the line dimension)."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs} "
                         "(1 would condemn every line in the corpus)")
    return (doc_lines(docs, id_col, text_col, sep)
            .where(F.col("key").isNotNull())
            .groupBy("key")
            .agg(F.count_distinct(id_col).alias("n_docs"))
            .where(F.col("n_docs") >= min_docs))


def drop_boilerplate_lines(docs: DataFrame, min_docs: int = 3,
                           id_col: str = "doc_id",
                           text_col: str = "text", sep: str = LINE_SEP,
                           drop_empty: bool = True,
                           broadcast_keys: bool = True) -> DataFrame:
    """Remove every line whose key sits in the boilerplate set from
    EVERY document (both published variants keep no copy: a cookie
    banner is noise in its first document too). Survivor positions
    come from a key-width anti join — broadcast by default (the
    condemned set is the repeated tail, far smaller than the line
    dimension); ``broadcast_keys=False`` shuffles the anti join for
    beyond-broadcast sets. Document text still crosses only the one
    reassembly exchange."""
    bad = boilerplate_line_keys(docs, min_docs, id_col, text_col,
                                sep).select("key")
    if broadcast_keys:
        bad = F.broadcast(bad)
    lines = doc_lines(docs, id_col, text_col, sep)
    kept = (lines.select(id_col, "pos", "key")
            .join(bad, "key", "left_anti")
            .select(id_col, "pos"))
    return _reassemble(docs, kept, id_col, text_col, sep, drop_empty)
