"""S3/E10 — raw-anchor link extraction: the upstream half of the PEM
flagship group-by.

Re-creates the reference's wikipedia-anchor ETL declaratively
(/root/reference/src/refined/offline_data_generation/
merge_files_and_extract_links.py:52-115 `process_line` +
generate_pem.py:25-43 `title_to_qcode`):

    anchor scan (regexp, in-scan codegen)
    → URI cleanup (percent-space decode, underscore form, HTML entity
      unescape, first-char uppercase)
    → redirect-following broadcast join
    → title→qcode mapping join
    → deny-class anti-join (list/disambiguation/internal pages)
    → per-(surface, qcode) counts — the `link_counts` shape A1 consumes.

Scale: pages never shuffle — anchors explode map-side and only the small
(surface, title) pairs move. Redirects are dimension-sized (broadcast);
title→qcode is 33M rows at reference scale, so that join defaults to a
hash shuffle on the cleaned title (`broadcast_titles=False`) with AQE
picking the strategy; the deny set is tiny (broadcast anti-join).

Documented subset: percent-decoding handles %20 (the space escape the
reference's unquote round-trips through underscore form anyway); other
escapes pass through opaquely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ANCHOR_RE = r'<a href="([^"]+)">([^>]+)</a>'


def clean_wiki_title(col: F.Column) -> F.Column:
    """URI → canonical wiki title: %20 decode, space→underscore, HTML
    entity unescape, first character uppercased
    (merge_files_and_extract_links.py:74-77 + generate_pem.py:31-37)."""
    t = F.regexp_replace(col, "%20", " ")
    t = F.regexp_replace(t, " ", "_")
    for ent, rep in [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                     ("&le;", "≤"), ("&ge;", "≥")]:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.concat(F.upper(F.substring(t, 1, 1)), F.substring(t, 2, 1 << 30))


def extract_anchors(pages: DataFrame,
                    text_col: str = "text") -> DataFrame:
    """(page_title, text) → one row per anchor: (page_title, uri,
    surface_form_raw). Map-only: the regexp scan fuses into the page
    scan; no shuffle."""
    anchors = F.expr(f"regexp_extract_all({text_col}, '{ANCHOR_RE}', 0)")
    e = pages.select("page_title", F.explode(anchors).alias("a"))
    return e.select(
        "page_title",
        F.regexp_extract("a", ANCHOR_RE, 1).alias("uri"),
        F.regexp_extract("a", ANCHOR_RE, 2).alias("surface_form_raw"),
    )


def anchor_link_counts(pages: DataFrame, redirects: DataFrame,
                       title_qcode: DataFrame, deny_qcodes: DataFrame,
                       broadcast_titles: bool = False) -> DataFrame:
    """Full S3/E10 flow → (surface_form_raw, qcode, source, cnt): the
    exact input shape of :func:`pem_build.build_pem` (A1). The default
    matches the module contract above — title→qcode is 33M rows at
    reference scale, so it shuffles unless the caller opts a small
    dimension into ``broadcast_titles=True`` (the r5 review found code
    and docstring stating OPPOSITE defaults for the one join the
    module calls out as scale-critical)."""
    raw = extract_anchors(pages)
    cleaned = raw.withColumn("wiki_title", clean_wiki_title(F.col("uri")))
    red = F.broadcast(redirects.select(
        F.col("src_title").alias("wiki_title"),
        F.col("dst_title").alias("_redir")))
    followed = (cleaned.join(red, "wiki_title", "left")
                .withColumn("wiki_title",
                            F.coalesce("_redir", "wiki_title"))
                .drop("_redir"))
    tq = title_qcode.select("wiki_title", "qcode")
    if broadcast_titles:
        tq = F.broadcast(tq)
    mapped = followed.join(tq, "wiki_title")  # unmapped titles drop (inner)
    kept = mapped.join(F.broadcast(deny_qcodes.select("qcode")), "qcode",
                       "left_anti")
    return (
        kept.groupBy("surface_form_raw", "qcode")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("source", F.lit("hyperlinks"))
        .select("surface_form_raw", "qcode", "source", "cnt")
    )
