"""A1 PEM build, A2 entity index, class closure / minimal-set pruning."""

import pyspark.sql.functions as F

from refined_spark.operators.closure import class_closure, minimal_classes
from refined_spark.operators.pem_build import build_entity_index, build_pem


def test_build_pem_math(spark):
    rows = [
        ("Jaguar", "Q1", "labels", 30),
        ("JAGUAR", "Q1", "hyperlinks", 30),
        ("The Jaguar", "Q2", "aliases", 30),
        ("Jaguar.", "Q3", "redirects", 10),
    ]
    lc = spark.createDataFrame(
        rows, "surface_form_raw: string, qcode: string, source: string,"
              " cnt: long")
    out = {(r["qcode"]): (r["prob"], r["rank"])
           for r in build_pem(lc).collect()}
    assert out["Q1"] == (0.6, 1)
    assert out["Q2"] == (0.3, 2)
    assert out["Q3"] == (0.1, 3)


def test_build_pem_truncation(spark):
    rows = [("k", f"Q{i:03d}", "labels", 100 - i) for i in range(40)]
    lc = spark.createDataFrame(
        rows, "surface_form_raw: string, qcode: string, source: string,"
              " cnt: long")
    out = build_pem(lc).collect()
    assert len(out) == 30
    assert max(r["rank"] for r in out) == 30
    # rank 1 = highest count
    assert [r for r in out if r["rank"] == 1][0]["qcode"] == "Q000"


def test_entity_index_dense(spark):
    pem = spark.createDataFrame(
        [("a", "Q3"), ("b", "Q1"), ("c", "Q1"), ("d", "Q2")],
        "surface_form: string, qcode: string")
    out = {r["qcode"]: r["qcode_idx"]
           for r in build_entity_index(pem).collect()}
    assert out == {"Q1": 1, "Q2": 2, "Q3": 3}


def test_class_closure_diamond(spark, fx_t1):
    edges = spark.read.parquet(f"{fx_t1}/class_edges.parquet")
    cl = class_closure(edges)
    anc = {r["ancestor_class"] for r in
           cl.where("child_class = 'C_team'").collect()}
    # diamond: team -> {sports_org, company} -> org -> thing
    assert anc == {"C_team", "C_sports_org", "C_company", "C_org", "C_thing"}


def test_minimal_classes_prunes_implied(spark, fx_t1):
    edges = spark.read.parquet(f"{fx_t1}/class_edges.parquet")
    cl = class_closure(edges)
    labeled = spark.createDataFrame(
        [("m1", "C_carmaker"), ("m1", "C_company"), ("m1", "C_org"),
         ("m2", "C_city")],
        "key: string, class_name: string")
    out = {(r["key"], r["class_name"])
           for r in minimal_classes(cl, labeled).collect()}
    assert out == {("m1", "C_carmaker"), ("m2", "C_city")}


def test_split_sentences_offsets_consume_whitespace(spark):
    # round-2 advisor repro: the chunk regex must consume trailing
    # whitespace ('\s*' survived SQL-literal unescaping as plain 's*'),
    # otherwise every sentence after the first points at the preceding
    # space instead of its own first character
    from refined_spark.operators.spans import split_sentences

    d = spark.createDataFrame(
        [("u1", "One two. Three four! Five."),
         ("u2", "No terminators here")],
        "url string, text string")
    got = {(r["url"], r["sent_idx"]): (r["sent_start"], r["sentence"])
           for r in split_sentences(d).collect()}
    assert got[("u1", 0)] == (0, "One two.")
    assert got[("u1", 1)] == (9, "Three four!")
    assert got[("u1", 2)] == (21, "Five.")
    assert got[("u2", 0)] == (0, "No terminators here")


def test_quality_ignores_padding_and_sampling_keeps_null_keys(spark):
    """r5 review contracts: (1) whitespace padding must not change
    quality_score (trimmed word split); (2) NULL sampling keys hash a
    sentinel — rate 1.0 is the identity, rate 0.0 the empty set."""
    from refined_spark.operators.sampling import deterministic_sample
    from refined_spark.operators.textstats import with_quality

    q = with_quality(spark.createDataFrame(
        [(0, "the cat"), (1, "  the cat  ")],
        "doc_id long, text string")).select("doc_id",
                                            "quality_score").collect()
    scores = {r.doc_id: r.quality_score for r in q}
    assert scores[0] == scores[1]

    df = spark.createDataFrame([(None,), ("k1",)], "k string")
    assert deterministic_sample(df, 1.0, "k").count() == 2
    assert deterministic_sample(df, 0.0, "k").count() == 0


def test_pii_and_lm_null_text_contracts(spark):
    """NULL text: pii counts are 0 / has_pii False-able (the row keeps
    a boolean value path — here counts 0 => has_pii False); lm scoring
    returns the row as (id, 0, NULL) instead of dropping it."""
    from refined_spark.operators.lm_quality import (unigram_lm,
                                                    with_lm_score)
    from refined_spark.operators.pii import with_pii

    docs = spark.createDataFrame(
        [(0, "mail me a@b.org"), (1, None), (2, "")],
        "doc_id long, text string")
    p = {r.doc_id: r for r in with_pii(docs).collect()}
    assert p[1].n_email == 0 and p[1].has_pii is False
    assert p[0].n_email == 1 and p[0].has_pii is True

    lm = unigram_lm(docs.where("text is not null"))
    s = {r.doc_id: r for r in with_lm_score(docs, lm).collect()}
    assert set(s) == {0, 1, 2}
    assert s[1].n_tokens == 0 and s[1].lm_score is None
    assert s[2].n_tokens == 0 and s[2].lm_score is None
    assert s[0].lm_score is not None


def test_line_stages_chain_without_duplicate_audit_columns(spark):
    """drop_boilerplate_lines -> line_dedup_keep_first (the documented
    curation order) must not duplicate the audit columns; the second
    stage REPLACES them."""
    from refined_spark.operators.lines import (drop_boilerplate_lines,
                                               line_dedup_keep_first)

    docs = spark.createDataFrame(
        [(i, "banner 123\ncontent %d\nbanner 123" % i)
         for i in range(4)], "doc_id long, text string")
    chained = line_dedup_keep_first(drop_boilerplate_lines(docs, 3))
    assert chained.columns == ["doc_id", "text", "n_lines_kept",
                               "n_lines_dropped"]
    chained.write.format("noop").mode("overwrite").save()  # writable
