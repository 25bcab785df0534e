"""Public EL evaluation-dataset readers (AIDA + "standard" jsonl).

Re-creates the reference's dataset factory declaratively
(/root/reference/src/refined/dataset_reading/entity_linking/
dataset_factory.py:22-115 ``get_aida_docs``, :117-185
``_read_standard_format``) so the reference's own eval files (AIDA,
MSNBC, ACE2004, AQUAINT, ClueWeb, WebQSP — all one of these two shapes)
run through the engine unchanged:

- AIDA jsonl: one ``{"text", "spans": [{"start","length","uris"}]}``
  object per line; a span's gold title is the FIRST uri carrying the
  ``http://en.wikipedia.org/wiki/`` marker (prefix stripped, other uris
  ignored), and spans with no such uri stay mention-only.
- standard jsonl: ``{"text", "mentions": [{"start","length",
  "wiki_name"}]}``; ``wiki_name`` NULL/"NIL" stays mention-only, else
  spaces become underscores before mapping.

Title→qcode mapping follows the reference's ``WikidataMapper``
(doc_preprocessing/wikidata_mapper.py:16-31) exactly: HTML-entity
unescape of &lt;/&gt;/&le;/&ge; ONLY (note: not &amp; — that list is
the contract), empty→no match, first character uppercased, ONE redirect
hop, then the title→qcode dimension; ``filter_not_in_kb=True`` drops
unmapped titles and disambiguation-class qcodes from the GOLD set
(mention rows always survive — the reference's
``include_mentions_for_nil`` default), ``False`` keeps unmapped gold as
the reference's ``Q0`` sentinel.

Document keys: the reference enumerates file lines (``line_idx``) — a
driver-side notion that does not distribute. The reader honors an
``id`` field when a line carries one, else content-addresses the doc as
``doc:<md5(text)>`` (deterministic across runs/partitionings; identical
lines collide by design — they are the same document).

Scale: the jsonl scan is splittable and map-only; span explosion stays
in the scan partition; redirects/title→qcode/disambiguation joins are
dimension joins (broadcast by default, ``broadcast_titles=False`` is
the 33M-title shuffle escape hatch, same as operators/anchors.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WIKI_PREFIX = "http://en.wikipedia.org/wiki/"

AIDA_SCHEMA = ("id string, text string, "
               "spans array<struct<start:int,length:int,"
               "uris:array<string>>>")
STANDARD_SCHEMA = ("id string, text string, "
                   "mentions array<struct<start:int,length:int,"
                   "wiki_name:string>>")

# the mapper's EXACT unescape list (wikidata_mapper.py:17-19) — &amp;
# is deliberately absent (that is the anchor-ETL cleanup's concern,
# operators/anchors.py, not the dataset mapper's)
_MAPPER_ENTITIES = [("&lt;", "<"), ("&gt;", ">"),
                    ("&le;", "≤"), ("&ge;", "≥")]


def _doc_key() -> F.Column:
    return F.coalesce(
        F.col("id"), F.concat(F.lit("doc:"), F.md5(F.col("text"))))


def normalize_dataset_title(col: F.Column) -> F.Column:
    """The mapper's title normalization (wikidata_mapper.py:17-22):
    entity unescape, empty → NULL, first char uppercased."""
    t = col
    for ent, rep in _MAPPER_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.when(F.length(t) == 0, F.lit(None)).otherwise(
        F.concat(F.upper(F.substring(t, 1, 1)),
                 F.substring(t, 2, 1 << 30)))


def map_titles_to_qcodes(spans: DataFrame, redirects: DataFrame,
                         title_qcode: DataFrame,
                         title_col: str = "wiki_title",
                         broadcast_titles: bool = True) -> DataFrame:
    """Attach ``gold_qcode`` (NULL when unmapped) to a frame carrying a
    raw title column — normalize, follow ONE redirect hop, look the
    title up (wikidata_mapper.py:16-28). ``title_col`` is replaced by
    its post-redirect canonical form (the reference keeps the followed
    title as ``wikipedia_entity_title``)."""
    normed = spans.withColumn(title_col,
                              normalize_dataset_title(F.col(title_col)))
    # The reference's mapper is a DICT — exactly one target per title.
    # Real wiki titles are unique, but a non-functional dimension (the
    # anchor ETL tolerates one; this mapper must not) would silently
    # fan spans out through the joins, so both lookups are made
    # functional with a deterministic min() winner per key.
    red = redirects.groupBy(
        F.col("src_title").alias(title_col)).agg(
        F.min("dst_title").alias("_redir"))
    if broadcast_titles:
        # the escape hatch gates BOTH dimensions: at full-KB scale the
        # redirects table (~10M rows) is the same class of
        # too-big-to-broadcast as the 33M-title map
        red = F.broadcast(red)
    followed = (normed.join(red, title_col, "left")
                .withColumn(title_col,
                            F.coalesce("_redir", title_col))
                .drop("_redir"))
    tq = title_qcode.groupBy(
        F.col("wiki_title").alias(title_col)).agg(
        F.min("qcode").alias("gold_qcode"))
    if broadcast_titles:
        tq = F.broadcast(tq)
    return followed.join(tq, title_col, "left")


def read_aida_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """AIDA-shape jsonl → one row per document:
    (url, text, spans ARRAY<STRUCT<start,length,uris>>)."""
    return (spark.read.schema(AIDA_SCHEMA).json(path)
            .select(_doc_key().alias("url"), "text", "spans"))


def read_standard_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Standard-shape jsonl (MSNBC/ACE2004/AQUAINT/...) → one row per
    document: (url, text, mentions ARRAY<STRUCT<start,length,
    wiki_name>>)."""
    return (spark.read.schema(STANDARD_SCHEMA).json(path)
            .select(_doc_key().alias("url"), "text", "mentions"))


def _md_and_slices(docs: DataFrame, span_col: str) -> DataFrame:
    """Explode spans and slice the mention text out of the document
    (the reference's ``text[start:start+length]`` — codepoint-addressed
    in Python, Spark ``substring`` and DuckDB ``substr`` alike)."""
    return (docs.select("url", "text",
                        F.explode(span_col).alias("s"))
            .select("url",
                    F.col("s.start").alias("start"),
                    F.col("s.length").alias("length"),
                    F.substring(F.col("text"), F.col("s.start") + 1,
                                F.col("s.length")).alias("mention_text"),
                    F.col("s")))


def aida_spans(aida: DataFrame, redirects: DataFrame,
               title_qcode: DataFrame, disambig_qcodes: DataFrame,
               filter_not_in_kb: bool = True,
               broadcast_titles: bool = True
               ) -> tuple[DataFrame, DataFrame]:
    """AIDA docs → (md_spans, gold_spans).

    md_spans = EVERY annotated span (url, start, length, mention_text)
    — ``include_mentions_for_nil=True``, the reference default
    (dataset_factory.py:47-55). gold_spans additionally carry
    (wiki_title, gold_qcode) for spans whose first wikipedia uri maps
    into the KB (dataset_factory.py:57-96)."""
    base = _md_and_slices(aida, "spans")
    md = base.select("url", "start", "length", "mention_text")
    # first uri CONTAINING the wikipedia marker, marker stripped from
    # the whole string — the reference's `if prefix in uri` +
    # `uri.replace(prefix, "")` pair (dataset_factory.py:57-66)
    # try_element_at: NULL (not an ansi error) when no uri qualifies —
    # the reference's `if len(titles) == 0: continue`
    first_title = F.try_element_at(
        F.transform(
            F.filter(F.col("s.uris"),
                     lambda u: F.contains(u, F.lit(WIKI_PREFIX))),
            lambda u: F.replace(u, F.lit(WIKI_PREFIX), F.lit(""))),
        F.lit(1))
    titled = (base.withColumn("wiki_title", first_title)
              .where(F.col("wiki_title").isNotNull())
              .select("url", "start", "length", "mention_text",
                      "wiki_title"))
    gold = _finish_gold(titled, redirects, title_qcode, disambig_qcodes,
                        filter_not_in_kb, broadcast_titles)
    return md, gold


def standard_spans(docs: DataFrame, redirects: DataFrame,
                   title_qcode: DataFrame, disambig_qcodes: DataFrame,
                   filter_not_in_kb: bool = True,
                   broadcast_titles: bool = True
                   ) -> tuple[DataFrame, DataFrame]:
    """Standard-format docs → (md_spans, gold_spans)
    (dataset_factory.py:117-185): NULL/"NIL" wiki_name stays
    mention-only; otherwise spaces become underscores before the
    identical mapping flow."""
    base = _md_and_slices(docs, "mentions")
    md = base.select("url", "start", "length", "mention_text")
    titled = (base.where(F.col("s.wiki_name").isNotNull()
                         & (F.col("s.wiki_name") != "NIL"))
              .withColumn("wiki_title",
                          F.replace(F.col("s.wiki_name"),
                                    F.lit(" "), F.lit("_")))
              .select("url", "start", "length", "mention_text",
                      "wiki_title"))
    gold = _finish_gold(titled, redirects, title_qcode, disambig_qcodes,
                        filter_not_in_kb, broadcast_titles)
    return md, gold


def _finish_gold(titled: DataFrame, redirects: DataFrame,
                 title_qcode: DataFrame, disambig_qcodes: DataFrame,
                 filter_not_in_kb: bool,
                 broadcast_titles: bool) -> DataFrame:
    mapped = map_titles_to_qcodes(titled, redirects, title_qcode,
                                  broadcast_titles=broadcast_titles)
    if filter_not_in_kb:
        # unmapped or disambiguation-class → not a gold label
        # (dataset_factory.py:69-72)
        gold = (mapped.where(F.col("gold_qcode").isNotNull())
                .join(F.broadcast(disambig_qcodes.select(
                    F.col("qcode").alias("gold_qcode"))),
                    "gold_qcode", "left_anti"))
    else:
        # keep the span, Q0-sentinel the missing qcode
        # (dataset_factory.py:74-75)
        gold = mapped.withColumn(
            "gold_qcode", F.coalesce("gold_qcode", F.lit("Q0")))
    return gold.select("url", "start", "length", "mention_text",
                       "wiki_title", "gold_qcode")


def aida_documents(aida: DataFrame) -> DataFrame:
    """The document frame for the pipeline's pre-extracted path
    (``run_pipeline(..., pre_extracted=True)``) — the reference's
    ``Doc.from_text`` analog: dataset text IS the document text, no
    HTML extraction stage."""
    return aida.select("url", "text")
