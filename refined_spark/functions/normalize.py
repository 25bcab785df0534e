"""E5 — surface-form normalization (the blocking-key function).

Re-implements the reference's ``normalize_surface_form``
(/root/reference/src/refined/resource_management/loaders.py:137-148)
with identical operation ORDER, which matters byte-for-byte:

    1. lower()
    2. strip leading "the " (once, only if remove_the)
    3. ascii-fold (reference: unidecode)
    4. remove "."        (replace, anywhere)
    5. strip spaces      (strip(" ") — only spaces, not all whitespace)
    6. remove '"'
    7. remove "'s"
    8. remove "'"
    9. remove "`"

The container has no ``unidecode``; :func:`ascii_fold` is a deterministic
stand-in (explicit Latin table + NFKD fallback) that agrees with unidecode
on the character classes the corpus uses (Latin letters with diacritics).
This is the primary blocking key, so both the fixture generator and the
pipeline call the SAME function — parity is structural, and pinned by
golden tests in tests/test_normalize.py.

Exposed three ways:
- :func:`normalize_surface_form` — plain Python (fixture gen, numpy oracle)
- :func:`normalize_udf` — vectorized pandas UDF (Arrow-batched)
- :func:`normalize_col` — pure-Column expression for ASCII-only inputs
  (stays inside WholeStageCodegen; used where the input is known-ASCII,
  e.g. already-normalized pem keys)
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Latin fold table for chars where NFKD alone would differ from unidecode
# (unidecode maps these to multi-char ASCII; NFKD drops or keeps them).
_FOLD = {
    "ß": "ss", "æ": "ae", "Æ": "AE", "ø": "o", "Ø": "O", "đ": "d", "Đ": "D",
    "ð": "d", "Ð": "D", "þ": "th", "Þ": "Th", "ł": "l", "Ł": "L",
    "œ": "oe", "Œ": "OE", "ı": "i", "–": "-", "—": "-", "’": "'", "‘": "'",
    "“": '"', "”": '"',
}


def ascii_fold(s: str) -> str:
    """Deterministic ASCII transliteration (unidecode stand-in)."""
    s = "".join(_FOLD.get(ch, ch) for ch in s)
    return (
        unicodedata.normalize("NFKD", s)
        .encode("ascii", "ignore")
        .decode("ascii")
    )


def normalize_surface_form(surface_form: str, remove_the: bool = True) -> str:
    """Exact-order port of the reference normalization (loaders.py:137-148)."""
    surface_form = surface_form.lower()
    if remove_the and surface_form[:4] == "the ":
        surface_form = surface_form[4:]
    return (
        ascii_fold(surface_form)
        .replace(".", "")
        .strip(" ")
        .replace('"', "")
        .replace("'s", "")
        .replace("'", "")
        .replace("`", "")
    )


@pandas_udf(StringType())
def normalize_udf(s: pd.Series) -> pd.Series:
    """Arrow-batched vectorized normalization (blocking-key producer)."""
    return s.map(lambda x: normalize_surface_form(x) if x is not None else None)


def normalize_col(col: Column) -> Column:
    """Pure-Column normalization for ASCII-only input.

    Same steps minus the ascii-fold (identity on ASCII). Stays JVM-side /
    codegen'd — preferred in hot paths where the input is known-ASCII.
    """
    c = F.lower(col)
    c = F.when(F.substring(c, 1, 4) == "the ", F.substring(c, 5, 2_000_000)).otherwise(c)
    c = F.replace(c, F.lit("."), F.lit(""))
    c = F.btrim(c, F.lit(" "))
    c = F.replace(c, F.lit('"'), F.lit(""))
    c = F.replace(c, F.lit("'s"), F.lit(""))
    c = F.replace(c, F.lit("'"), F.lit(""))
    c = F.replace(c, F.lit("`"), F.lit(""))
    return c
