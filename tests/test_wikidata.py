"""S1 dump scan → lookup fan-out and A3 class-array build.

Hand-computed goldens over an inline dump in the real shipping shape
(JSON array: '['/']' bracket lines, per-entity line with trailing
comma; ref process_wikidata_dump.py:51-211,
generate_qcode_to_type_indices.py:22-95).
"""

import json

import pytest

from refined_spark.operators.wikidata import (
    build_class_arrays,
    lookup_fanout,
    read_wikidata_dump,
    wikidata_lookups,
)

ITEMS = [
    # class DAG: C1 -> C2 -> C3 (P279 chains)
    {"id": "C1", "claims": {"P279": [
        {"mainsnak": {"datavalue": {"value": {"id": "C2"}}}}]}},
    {"id": "C2", "claims": {"P279": [
        {"mainsnak": {"datavalue": {"value": {"id": "C3"}}}}]}},
    # entity with every lookup kind populated
    {"id": "Q1",
     "labels": {"en": {"value": "Alpha"}, "de": {"value": "Alfa"}},
     "descriptions": {"en": {"value": "first"}},
     "aliases": {"en": [{"value": "alpha"}, {"value": "al"}]},
     "sitelinks": {"enwiki": {"title": "Alpha"},
                   "dewiki": {"title": "Alfa"}},
     "claims": {"P31": [
         {"mainsnak": {"datavalue": {"value": {"id": "C1"}}}},
         {"mainsnak": {"datavalue": {"value": {"id": "Q5"}}}}]}},
    # entity with only non-en/a different site — must not leak into en
    {"id": "Q2",
     "labels": {"fr": {"value": "Beta"}},
     "claims": {"P106": [
         {"mainsnak": {"datavalue": {"value": {"id": "C2"}}}}]}},
]


@pytest.fixture(scope="module")
def dump_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("wd") / "dump.json"
    with open(p, "w") as f:
        f.write("[\n")
        for i, it in enumerate(ITEMS):
            tail = ",\n" if i < len(ITEMS) - 1 else "\n"
            f.write(json.dumps(it) + tail)
        f.write("]\n")
    return str(p)


def test_bracket_and_comma_lines_dropped(spark, dump_path):
    parsed = read_wikidata_dump(spark, dump_path)
    assert sorted(r.id for r in parsed.select("id").collect()) == [
        "C1", "C2", "Q1", "Q2"]


def test_fanout_kinds(spark, dump_path):
    parsed = read_wikidata_dump(spark, dump_path)
    rows = {(r.qcode, r.kind, r.value)
            for r in lookup_fanout(parsed).collect()}
    assert ("Q1", "label", "Alpha") in rows
    assert ("Q1", "description", "first") in rows
    assert ("Q1", "alias", "alpha") in rows and ("Q1", "alias", "al") in rows
    assert ("Q1", "sitelink", "Alpha") in rows
    assert ("Q1", "p31", "C1") in rows and ("Q1", "p31", "Q5") in rows
    assert ("Q2", "p106", "C2") in rows
    assert ("C1", "p279", "C2") in rows
    # language scoping: fr label / dewiki sitelink must not appear
    assert not any(q == "Q2" and k == "label" for q, k, _ in rows)
    assert ("Q1", "sitelink", "Alfa") not in rows


def test_human_lookup(spark, dump_path):
    parsed = read_wikidata_dump(spark, dump_path)
    lk = wikidata_lookups(parsed)
    assert [r.qcode for r in lk["human"].collect()] == ["Q1"]


def test_class_arrays_closure_and_vocab(spark, dump_path):
    parsed = read_wikidata_dump(spark, dump_path)
    lk = wikidata_lookups(parsed)
    from pyspark.sql import functions as F

    rel = (lk["p31"].unionByName(lk["p106"])
           .select("qcode", F.col("value_id").alias("class_name")))
    edges = lk["p279"].select(
        F.col("qcode").alias("child_class"),
        F.col("value_id").alias("parent_class"))
    out = {r.qcode: r.class_idx
           for r in build_class_arrays(rel, edges).collect()}
    # vocab: sorted distinct DAG nodes -> C1=0, C2=1, C3=2 (Q5 not in DAG,
    # so it contributes no index — closure join drops it)
    assert out["Q1"] == [0, 1, 2]  # C1 + its ancestors C2, C3
    assert out["Q2"] == [1, 2]     # C2 + ancestor C3
