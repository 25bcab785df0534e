"""EL dataset readers (sources/datasets.py) — span-offset math against
Python's codepoint slicing, doc keying, and the mapper's branch
semantics on a hand-built corpus (the fixture-scale oracle gates are
aida_read / standard_read / aida_metrics)."""

import hashlib
import json
import os

import pyspark.sql.functions as F
import pytest

from refined_spark.sources.datasets import (
    WIKI_PREFIX,
    aida_documents,
    aida_spans,
    read_aida_jsonl,
    read_standard_jsonl,
    standard_spans,
)


@pytest.fixture(scope="module")
def dims(spark):
    redirects = spark.createDataFrame(
        [("Old_Title", "Real_Title")], "src_title string, dst_title string")
    title_qcode = spark.createDataFrame(
        [("Real_Title", "Q1"), ("Café_Münster", "Q2"),
         ("X≤Y", "Q3"), ("Disambig_Page", "Q9")],
        "wiki_title string, qcode string")
    disambig = spark.createDataFrame([("Q9",)], "qcode string")
    return redirects, title_qcode, disambig


def _write_jsonl(path, lines):
    with open(path, "w") as f:
        for line in lines:
            f.write(json.dumps(line) + "\n")
    return path


def test_aida_span_offsets_are_codepoints(spark, tmp_path, dims):
    """Offsets address CODEPOINTS (the reference slices a Python str) —
    multibyte chars before the span must not shift the slice."""
    text = "Vor München: Café Münster née Φοίνιξ."
    spans = [
        {"start": 4, "length": 7,
         "uris": [WIKI_PREFIX + "old_Title"]},         # "München", case bump + redirect
        {"start": 13, "length": 12,
         "uris": ["http://other.org/x", WIKI_PREFIX + "Café_Münster"]},
        {"start": 30, "length": 6, "uris": [WIKI_PREFIX + "X&le;Y"]},
        {"start": 0, "length": 3, "uris": []},          # md-only
        {"start": 4, "length": 7, "uris": [WIKI_PREFIX + "Disambig_Page"]},
        {"start": 4, "length": 7, "uris": [WIKI_PREFIX + "Never_Mapped"]},
    ]
    path = _write_jsonl(str(tmp_path / "a.jsonl"),
                        [{"id": "d0", "text": text, "spans": spans}])
    aida = read_aida_jsonl(spark, path)
    md, gold = aida_spans(aida, *dims)
    md_rows = {(r["start"], r["mention_text"]) for r in md.collect()}
    # every span is a mention row, sliced exactly like text[s:s+ln]
    for s in spans:
        assert (s["start"],
                text[s["start"]:s["start"] + s["length"]]) in md_rows
    g = {r["start"]: r for r in gold.collect()}
    # disambig (Q9), unmapped, and no-uri spans are NOT gold
    assert set(g) == {4, 13, 30}
    assert g[4]["mention_text"] == "München"
    assert g[4]["wiki_title"] == "Real_Title"   # case bump + redirect hop
    assert g[4]["gold_qcode"] == "Q1"
    assert g[13]["mention_text"] == "Café Münster"
    assert g[13]["gold_qcode"] == "Q2"          # leading non-wiki uri skipped
    assert g[30]["gold_qcode"] == "Q3"          # &le; unescape
    assert aida_documents(aida).collect()[0]["url"] == "d0"


def test_keep_not_in_kb_q0_sentinel(spark, tmp_path, dims):
    path = _write_jsonl(str(tmp_path / "b.jsonl"), [{
        "id": "d0", "text": "abcdef",
        "spans": [{"start": 0, "length": 3,
                   "uris": [WIKI_PREFIX + "Never_Mapped"]}]}])
    _md, gold = aida_spans(read_aida_jsonl(spark, path), *dims,
                           filter_not_in_kb=False)
    row = gold.collect()[0]
    assert row["gold_qcode"] == "Q0" and row["wiki_title"] == "Never_Mapped"


def test_standard_reader_md5_keying_and_nil(spark, tmp_path, dims):
    """No id field → content-addressed doc:<md5(text)>; NULL/'NIL'
    wiki_name stays mention-only; spaces re-underscore before mapping."""
    text = "Real Title and more"
    path = _write_jsonl(str(tmp_path / "c.jsonl"), [{
        "text": text,
        "mentions": [
            {"start": 0, "length": 10, "wiki_name": "Real Title"},
            {"start": 5, "length": 5, "wiki_name": "NIL"},
            {"start": 11, "length": 3, "wiki_name": None},
        ]}])
    docs = read_standard_jsonl(spark, path)
    md, gold = standard_spans(docs, *dims)
    key = "doc:" + hashlib.md5(text.encode()).hexdigest()
    assert docs.collect()[0]["url"] == key
    assert md.count() == 3
    g = gold.collect()
    assert len(g) == 1 and g[0]["gold_qcode"] == "Q1"
    assert g[0]["url"] == key and g[0]["mention_text"] == "Real Title"


def test_mapper_dimension_made_functional(spark, tmp_path, dims):
    """A duplicate-title dimension must NOT fan spans out — the
    reference's mapper is a dict; the reader picks the deterministic
    min() winner per key."""
    _redirects, _tq, disambig = dims
    dup_tq = spark.createDataFrame(
        [("Real_Title", "Q7"), ("Real_Title", "Q1")],
        "wiki_title string, qcode string")
    no_red = spark.createDataFrame([], "src_title string, dst_title string")
    path = _write_jsonl(str(tmp_path / "d.jsonl"), [{
        "id": "d0", "text": "Real Title",
        "spans": [{"start": 0, "length": 10,
                   "uris": [WIKI_PREFIX + "Real_Title"]}]}])
    _md, gold = aida_spans(read_aida_jsonl(spark, path), no_red, dup_tq,
                           disambig)
    rows = gold.collect()
    assert len(rows) == 1 and rows[0]["gold_qcode"] == "Q1"


def test_dataset_pipeline_reproduces_fixture_links(spark, fx_t2):
    """The jsonl fixture encodes the fixture corpus's own documents and
    spans — running the EL pipeline over the READ-BACK corpus
    (pre-extracted text, provided spans) must reproduce the
    expected_links golden row-for-row on those urls."""
    from refined_spark.pipeline import run_pipeline

    aida = read_aida_jsonl(spark, os.path.join(fx_t2, "aida_docs.jsonl"))
    reds = spark.read.parquet(os.path.join(fx_t2, "redirects.parquet"))
    tq = spark.read.parquet(os.path.join(fx_t2, "title_qcode.parquet"))
    deny = spark.read.parquet(os.path.join(fx_t2, "deny_qcodes.parquet"))
    md, _gold = aida_spans(aida, reds, tq, deny)
    res = run_pipeline(spark, fx_t2, mode="spans",
                       documents=aida_documents(aida), gold_spans=md,
                       pre_extracted=True)
    got = {(r["url"], r["start"]): r["pred_qcode"]
           for r in res["links"].collect()}
    exp_all = spark.read.parquet(
        os.path.join(fx_t2, "expected_links.parquet"))
    exp = {(r["url"], r["start"]): r["pred_qcode"]
           for r in exp_all.join(aida.select("url"), "url", "left_semi")
           .collect()}
    assert exp and got == exp
    res["unpersist"]()
    # the subset is 1/5 of the corpus — the golden restriction is real
    assert len(exp) < exp_all.count()


def test_aida_mentions_even_distribution(spark, fx_t2):
    """Reader plumbing sanity on the fixture file: every line parsed,
    no span lost (md count == the file's span count)."""
    aida = read_aida_jsonl(spark, os.path.join(fx_t2, "aida_docs.jsonl"))
    n_lines = sum(1 for _ in open(os.path.join(fx_t2, "aida_docs.jsonl")))
    n_spans = sum(len(json.loads(line)["spans"]) for line in
                  open(os.path.join(fx_t2, "aida_docs.jsonl")))
    assert aida.count() == n_lines
    assert aida.select(F.explode("spans")).count() == n_spans
