"""operators/lines.py — CCNet paragraph/line dedup + boilerplate cut.

Pins the semantics the DuckDB gate can't see in isolation: keep-first
total order, pass-through (empty-normalization) lines never being keys,
normalization folding (digits, case, punctuation), within-doc repeats,
the drop_empty contract, the min_docs guard, and broadcast/shuffle-path
parity of the boilerplate cut.
"""

import pytest
from pyspark.sql import functions as F

from refined_spark.operators.lines import (boilerplate_line_keys,
                                           doc_lines,
                                           drop_boilerplate_lines,
                                           line_dedup_keep_first,
                                           norm_line, norm_line_sql)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _texts(df):
    return {r.doc_id: r.text for r in df.collect()}


def test_keep_first_across_docs(spark):
    docs = _docs(spark, [(1, "alpha one\nshared line"),
                         (2, "shared line\nbeta two")])
    out = _texts(line_dedup_keep_first(docs))
    # doc 1 is earlier: keeps both lines; doc 2 loses the shared one
    assert out == {1: "alpha one\nshared line", 2: "beta two"}


def test_keep_first_within_doc_and_pos_order(spark):
    docs = _docs(spark, [(5, "same line\nmiddle\nsame line")])
    out = _texts(line_dedup_keep_first(docs))
    assert out == {5: "same line\nmiddle"}


def test_normalization_folds_digits_case_punct(spark):
    docs = _docs(spark, [(1, "Copyright 2019 Example Corp!"),
                         (2, "copyright 2024 example corp"),
                         (3, "COPYRIGHT 1999 EXAMPLE CORP.")])
    out = line_dedup_keep_first(docs)
    # all three normalize identically -> only the first doc survives
    assert _texts(out) == {1: "Copyright 2019 Example Corp!"}


def test_passthrough_lines_never_keys(spark):
    # blanks / punctuation-only / whitespace-only normalize to '' and
    # must pass through in EVERY doc, never deduped across docs
    docs = _docs(spark, [(1, "unique a\n\n* * *\n   "),
                         (2, "unique b\n\n* * *")])
    keyed = doc_lines(docs).where(F.col("key").isNotNull())
    assert keyed.count() == 2  # only the two unique content lines
    out = _texts(line_dedup_keep_first(docs))
    assert out == {1: "unique a\n\n* * *\n   ",
                   2: "unique b\n\n* * *"}


def test_fully_duplicate_doc_dropped_or_kept_empty(spark):
    docs = _docs(spark, [(1, "line x\nline y"), (2, "line y\nline x")])
    dropped = line_dedup_keep_first(docs)
    assert _texts(dropped) == {1: "line x\nline y"}
    kept = line_dedup_keep_first(docs, drop_empty=False)
    out = {r.doc_id: (r.text, r.n_lines_kept, r.n_lines_dropped)
           for r in kept.collect()}
    assert out[2] == ("", 0, 2)
    assert out[1] == ("line x\nline y", 2, 0)


def test_audit_columns(spark):
    docs = _docs(spark, [(1, "a b c\ndup line"),
                         (2, "dup line\nkeep me\ndup line")])
    out = {r.doc_id: (r.n_lines_kept, r.n_lines_dropped)
           for r in line_dedup_keep_first(docs).collect()}
    assert out == {1: (2, 0), 2: (1, 2)}


def test_boilerplate_threshold_and_protection(spark):
    docs = _docs(spark, [
        (1, "banner line\npage one body"),
        (2, "banner line\npage two body\ntwice line"),
        (3, "banner line\ntwice line\npage three body"),
    ])
    keys = boilerplate_line_keys(docs, min_docs=3)
    assert keys.count() == 1  # only 'banner line' (3 docs); 2-doc protected
    out = _texts(drop_boilerplate_lines(docs, min_docs=3))
    assert out == {1: "page one body",
                   2: "page two body\ntwice line",
                   3: "twice line\npage three body"}


def test_boilerplate_drops_from_every_doc_including_first(spark):
    docs = _docs(spark, [(i, "cookie banner\nbody " + w)
                         for i, w in enumerate(["aa", "bb", "cc"])])
    out = _texts(drop_boilerplate_lines(docs, min_docs=3))
    assert out == {0: "body aa", 1: "body bb", 2: "body cc"}


def test_boilerplate_min_docs_guard():
    with pytest.raises(ValueError, match="min_docs"):
        boilerplate_line_keys(None, min_docs=1)


def test_boilerplate_broadcast_shuffle_parity(spark):
    docs = _docs(spark, [
        (i, f"shared banner\nbody {chr(97 + i)} text") for i in range(6)
    ])
    a = drop_boilerplate_lines(docs, min_docs=3, broadcast_keys=True)
    b = drop_boilerplate_lines(docs, min_docs=3, broadcast_keys=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple,
                                                         b.collect()))


def test_norm_sql_replay_matches_spark(spark):
    import duckdb

    samples = ["  Mixed CASE 42 line!  ", "* * *", "2024", "",
               "tab\tand unicode — dash", "a  b   c"]
    df = spark.createDataFrame([(s,) for s in samples], "line string")
    got = [r.n for r in
           df.select(norm_line(F.col("line")).alias("n")).collect()]
    want = [duckdb.sql(
        f"select {norm_line_sql('?')}".replace("?", f"'{s}'")
    ).fetchone()[0] for s in samples]
    assert got == want


def test_reassembly_preserves_untouched_doc_bytes(spark):
    text = "First Line!\n\nSecond 42 line\n* * *\ntail"
    docs = _docs(spark, [(1, text)])
    assert _texts(line_dedup_keep_first(docs)) == {1: text}
