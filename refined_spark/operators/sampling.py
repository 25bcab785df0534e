"""Deterministic corpus sampling — reproducible subsets without a
shuffle, the way web-scale pipelines actually sample.

``rand()``-based sampling is useless at 100 TB: it is irreproducible
across retries (a recomputed partition draws different rows, breaking
exactly-once sinks and any downstream join against the sample), and
unstable across cluster sizes. The standard fix (CCNet, C4 and every
serious crawl pipeline) is HASH sampling: a row is in the sample iff
``hash(salt || key) < rate`` — a pure per-row predicate, so selection is

- map-only (no shuffle, no state, fuses into the scan),
- reproducible bit-for-bit across runs, retries, partitionings and
  cluster sizes,
- consistent across tables (the same key samples in or out everywhere —
  joinable subsets for free), and
- refinable: a rate-r sample is a SUPERSET of a rate-r' < r sample with
  the same salt (nested subsamples from one predicate).

Implementation detail that makes the DuckDB oracle exact: the hash is
``md5`` (identical lowercase-hex output in every engine) and the
threshold compare runs LEXICOGRAPHICALLY on the hex string — a uniform
hex string is below ``hex(rate * 16^32)`` with probability ``rate`` —
so no engine-specific integer conversion is ever involved.

Reference analog: none (M5's training-time sampling is model-internal,
SURVEY §2 marks it n/a); this is the corpus-assembly member of the
build brief's training-data-pipeline operator set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEX_WIDTH = 32  # full md5 width


def rate_to_hex_threshold(rate: float) -> str:
    """The 32-hex-digit threshold T such that
    P[md5_hex < T] = rate for a uniform hash. Exact for dyadic rates;
    floor-rounded to 1/16^32 otherwise (an error of < 1e-38)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    scaled = int(rate * (16 ** HEX_WIDTH))
    if scaled >= 16 ** HEX_WIDTH:
        return "g" * HEX_WIDTH  # 'g' > 'f': admits every hash
    return format(scaled, "032x")


_NULL_KEY = "\x00<null>"  # cannot collide with a real cast-to-string key


def sample_hash(key_col: F.Column, salt: str) -> F.Column:
    """The sampling hash — md5 of salt||key, lowercase hex. Changing
    ``salt`` draws an independent sample; reusing it across tables
    yields consistent (joinable) subsets. NULL keys hash a reserved
    sentinel: concat would otherwise yield NULL, the threshold
    comparison would three-value to NULL, and every NULL-key row would
    silently vanish from every sample — rate 1.0 would not be the
    identity, and 'consistent across tables' would fail on any
    nullable join key (r5 review, live-confirmed)."""
    key = F.coalesce(key_col.cast("string"), F.lit(_NULL_KEY))
    return F.md5(F.concat(F.lit(salt), key))


def deterministic_sample(df: DataFrame, rate: float, key_col: str,
                         salt: str = "s0") -> DataFrame:
    """The rate-``rate`` subset of ``df`` selected by hash(salt||key).
    Map-only; schema preserved."""
    return df.where(
        sample_hash(F.col(key_col), salt) < rate_to_hex_threshold(rate))


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      strata_col: str, key_col: str,
                      default_rate: float = 0.0,
                      salt: str = "s0") -> DataFrame:
    """Per-stratum rates (corpus mixing: e.g. keep 100% of rare
    languages, 10% of English). ``rates`` is a plain dict — model-config
    scale — compiled into a CASE chain, so the plan stays a map-only
    scan filter; strata missing from ``rates`` sample at
    ``default_rate``."""
    thr = F.lit(rate_to_hex_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == stratum,
                     F.lit(rate_to_hex_threshold(rate))).otherwise(thr)
    return df.where(sample_hash(F.col(key_col), salt) < thr)


def sample_sql(key_col: str, rate: float, salt: str = "s0") -> str:
    """The IDENTICAL predicate as ANSI/DuckDB SQL — md5 hex compares
    lexicographically in both engines. ``salt`` is interpolated into a
    single-quoted literal, so quotes are doubled (ANSI escaping) —
    a quoted salt must not break or inject into the generated SQL.
    NOTE the escaped salt is a DIFFERENT hash input than the raw salt
    only if it contained a quote; Spark's :func:`sample_hash` uses the
    raw salt, so quote-bearing salts are rejected outright to keep the
    two predicates provably identical."""
    if "'" in salt:
        raise ValueError(
            "sample_sql: salt must be quote-free (the SQL replay "
            f"interpolates it as a literal): {salt!r}")
    return (f"md5('{salt}' || coalesce(cast({key_col} as varchar), "
            f"chr(0) || '<null>')) "
            f"< '{rate_to_hex_threshold(rate)}'")
