"""Numeric special-span handlers (operators/numbers.py) — the registry
slots the reference's NER tag set names (CARDINAL/ORDINAL/MONEY/PERCENT/
TIME/QUANTITY, ref model_components/config.py:7-25) implemented as the
same deterministic grammar stand-in the engine uses for DATE."""

import pytest

from refined_spark.operators.numbers import resolve_numbers


@pytest.fixture(scope="module")
def resolved(spark):
    docs = spark.createDataFrame([
        ("u1", "sales hit $3.5 million while costs fell 12.5% in the "
               "3rd quarter"),
        ("u2", "the 5:30 pm train covered 120 km with forty passengers "
               "paying 99 euros"),
        ("u3", "twelve thousand is not parsed as one span but twelve is; "
               "meeting at 9 am"),
        ("u4", "no numerics at all here"),
    ], "url string, text string")
    rows = resolve_numbers(docs).collect()
    return {(r["url"], r["start"]): r for r in rows}


def test_detection_and_typing(resolved):
    by_type = {}
    for r in resolved.values():
        by_type.setdefault(r["coarse_type"], set()).add(r["num_text"])
    assert "$3.5 million" in by_type["MONEY"]
    assert "99 euros" in by_type["MONEY"]
    assert "12.5%" in by_type["PERCENT"]
    assert "3rd" in by_type["ORDINAL"]
    assert "5:30 pm" in by_type["TIME"]
    assert "9 am" in by_type["TIME"]
    assert "120 km" in by_type["QUANTITY"]
    assert "forty" in by_type["CARDINAL"]


def test_values_and_units(resolved):
    vals = {r["num_text"]: (r["coarse_type"], r["value"], r["unit"])
            for r in resolved.values()}
    assert vals["$3.5 million"] == ("MONEY", 3.5e6, "$")
    assert vals["12.5%"] == ("PERCENT", 12.5, "%")
    assert vals["3rd"] == ("ORDINAL", 3.0, None)
    assert vals["5:30 pm"] == ("TIME", 17 * 3600 + 30 * 60.0, "s")
    assert vals["9 am"] == ("TIME", 9 * 3600.0, "s")
    assert vals["120 km"] == ("QUANTITY", 120.0, "km")
    assert vals["forty"] == ("CARDINAL", 40.0, None)
    assert vals["99 euros"] == ("MONEY", 99.0, "euros")


def test_offsets_and_empty_doc(resolved):
    text = ("sales hit $3.5 million while costs fell 12.5% in the "
            "3rd quarter")
    # offsets index the span's exact slice of the original text
    for (u, start), r in resolved.items():
        if u == "u1":
            assert text[start:start + len(r["num_text"])] == r["num_text"]
    assert not [u for (u, _s) in resolved if u == "u4"]
