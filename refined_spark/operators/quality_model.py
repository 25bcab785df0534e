"""Model-based quality filtering — the LEARNED complement to the
rule-based cuts (textstats heuristics, lm_quality perplexity, host
statistics). FineWeb-Edu / DCLM-style pipelines score every document
with a trained lightweight model and keep the top slice; this module
implements that component with the engine's engines-cannot-drift bar
intact.

Spark-first shape, one corpus pass per phase:

- **featurize**: pure codegen Column expressions (the textstats signal
  family — each feature is a (Column, DuckDB-SQL) PAIR emitted from
  one table in this module, so the oracle replays featurization
  exactly);
- **fit**: ridge regression via its normal equations. The distributed
  work is ONE map-side-combining aggregation of the sufficient
  statistics — every pairwise sum ``Σ z_i·z_j`` over the design vector
  ``z = [1, features…, label]`` — collected as a single wide row
  (d≈6 → 21 sums). That row IS the driver gate (plain SUMs, DuckDB
  replays them bit-for-bit at fixed rounding); the 6×6 solve is
  driver-side numpy (microseconds) and pytest-pinned by exact recovery
  of a planted linear relationship.
- **score**: the learned weights compile back into a LITERAL
  dot-product Column — zero UDF, zero shuffle, zero broadcast; it
  fuses into any downstream scan like every other curation predicate.

Why ridge and not logistic/fastText: the closed form keeps the whole
train deterministic and SQL-replayable, the property every operator
here gates on. A production pipeline swapping in a heavier scorer
keeps the identical plan shape (one featurize pass; weights as
literals or one tiny broadcast at score time). Reference role: none
(ReFinED consumes curated dumps); §2.6-style training-data tail.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- paired feature emitters (Spark Column, DuckDB SQL) ------------------
# one definition site per feature: both engines compile from this table,
# and the word-count atoms are IMPORTED from textstats (not re-typed) so
# the quality_fit gate's label (textstats' composite score) and these
# features can never desynchronize.

from .textstats import _LANG_MARKERS, _count_word  # noqa: E402

_STOPWORDS: tuple[str, ...] = tuple(_LANG_MARKERS["en"])


def _stop_count(t: Column) -> Column:
    return sum((_count_word(t, w) for w in _STOPWORDS), F.lit(0))


def _stop_count_sql(t: str) -> str:
    return " + ".join(
        f"len(regexp_extract_all(lower({t}), '\\b{w}\\b'))"
        for w in _STOPWORDS)


def feature_columns(text_col: str = "text") -> dict[str, Column]:
    """Ordered feature name → Column. Magnitudes are kept O(1)
    (n_chars in thousands) so the normal-equation matrix stays
    well-conditioned without per-feature standardization."""
    t = F.col(text_col)
    trimmed = F.trim(t)
    n_chars = F.length(trimmed)  # textstats trim rule (padding-blind)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    n_words = F.when(trimmed.isNull() | (trimmed == ""),
                     F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+")))  # textstats trim rule
    return {
        "n_kchars": (n_chars / F.lit(1000.0)),
        "alpha_ratio": F.when(n_chars > 0,
                              n_alpha / n_chars).otherwise(0.0),
        "punct_ratio": F.when(n_chars > 0,
                              n_punct / n_chars).otherwise(0.0),
        "stop_ratio": F.when(n_words > 0,
                             _stop_count(t) / n_words).otherwise(0.0),
    }


def feature_sql(text_col: str = "text") -> dict[str, str]:
    """The DuckDB replay of :func:`feature_columns`, same names, same
    order, same arithmetic."""
    t = text_col
    n_chars = f"length(trim({t}))"
    n_alpha = f"length(regexp_replace({t}, '[^A-Za-z]', '', 'g'))"
    n_punct = f"length(regexp_replace({t}, '[A-Za-z0-9\\s]', '', 'g'))"
    n_words = (f"(case when {t} is null or trim({t}) = '' then 0 "
               f"else len(regexp_split_to_array(trim({t}), '\\s+')) "
               f"end)")
    return {
        "n_kchars": f"({n_chars} / 1000.0)",
        "alpha_ratio": (f"(case when {n_chars} > 0 then "
                        f"cast({n_alpha} as double) / {n_chars} "
                        f"else 0.0 end)"),
        "punct_ratio": (f"(case when {n_chars} > 0 then "
                        f"cast({n_punct} as double) / {n_chars} "
                        f"else 0.0 end)"),
        "stop_ratio": (f"(case when {n_words} > 0 then "
                       f"cast({_stop_count_sql(t)} as double) / "
                       f"{n_words} else 0.0 end)"),
    }


# --- sufficient statistics (the one distributed pass) --------------------

def _design(features: dict[str, Column], label: Column
            ) -> tuple[list[str], list[Column]]:
    names = ["one", *features, "label"]
    cols = [F.lit(1.0).cast("double"), *features.values(),
            label.cast("double")]
    return names, cols


def sufficient_stats(docs: DataFrame, features: dict[str, Column],
                     label: Column,
                     round_to: int | None = 4) -> DataFrame:
    """ONE wide row of every pairwise sum ``Σ z_i·z_j`` (i ≤ j) over
    the design vector ``z = [1, features…, label]`` — the complete
    information ridge needs (X^TX in the feature block, X^Ty in the
    label column, n in ``s_one_one``). A single map-side-combining
    aggregation: the exchange carries d(d+1)/2 doubles per partition,
    nothing else. Rounded so the driver gate's value-hash is stable
    across engines' summation orders."""
    names, cols = _design(features, label)
    z = [c.alias(f"_z{i}") for i, c in enumerate(cols)]

    def agg(i, j):
        s = F.sum(F.col(f"_z{i}") * F.col(f"_z{j}"))
        # round_to=None: full precision for the solve path (the normal
        # equations can be ill-conditioned enough to amplify 1e-10
        # rounding to 1e-4 in the weights); the driver gate rounds for
        # cross-engine value-hash stability
        if round_to is not None:
            s = F.round(s, round_to)
        return s.alias(f"s_{names[i]}_{names[j]}")

    aggs = [agg(i, j)
            for i in range(len(names)) for j in range(i, len(names))]
    return docs.select(*z).agg(*aggs)


def sufficient_stats_sql(table_expr: str, feature_sqls: dict[str, str],
                         label_sql: str,
                         round_to: int | None = 4) -> str:
    """DuckDB replay of :func:`sufficient_stats`, emitted from the
    same name order and index pairing — engines cannot drift
    column-by-column. ``round_to=None`` mirrors the Spark twin's
    unrounded (solve-path) mode."""
    names = ["one", *feature_sqls, "label"]
    exprs = ["1.0", *(f"({s})" for s in feature_sqls.values()),
             f"({label_sql})"]

    def out(i, j):
        raw = f"sum({exprs[i]} * {exprs[j]})"
        if round_to is not None:
            raw = f"round({raw}, {round_to})"
        return f"{raw} as s_{names[i]}_{names[j]}"

    outs = [out(i, j)
            for i in range(len(names)) for j in range(i, len(names))]
    return "select " + ", ".join(outs) + f" from {table_expr}"


# --- driver-side solve + compiled scoring --------------------------------

def solve_ridge(stats_row: dict, feature_names: list[str],
                l2: float = 1e-6) -> dict[str, float]:
    """Weights (intercept keyed ``one``) from a collected sufficient-
    statistics row: solve (A + λI')w = b where A/b unpack from the
    pairwise sums and λ skips the intercept (standard ridge). Pure
    numpy on a (d+1)² matrix."""
    names = ["one", *feature_names]

    def s(a: str, b: str) -> float:
        v = stats_row.get(f"s_{a}_{b}", stats_row.get(f"s_{b}_{a}"))
        if v is None:
            # Spark's sum over ZERO rows is NULL — distinguish the
            # empty-corpus case from a misspelled feature name instead
            # of crashing in float(None)
            if f"s_{a}_{b}" in stats_row or f"s_{b}_{a}" in stats_row:
                raise ValueError(
                    "solve_ridge: sufficient statistics are NULL — "
                    "the input had no rows to fit")
            raise KeyError(
                f"solve_ridge: no statistic for ({a!r}, {b!r}) — "
                f"feature names must match the sufficient_stats run")
        return float(v)

    d = len(names)
    A = np.array([[s(names[i], names[j]) for j in range(d)]
                  for i in range(d)])
    b = np.array([s(names[i], "label") for i in range(d)])
    reg = np.eye(d) * l2
    reg[0, 0] = 0.0
    w = np.linalg.solve(A + reg, b)
    return dict(zip(names, map(float, w)))


def fit_quality_model(docs: DataFrame, label: Column,
                      features: dict[str, Column] | None = None,
                      l2: float = 1e-6,
                      round_to: int | None = None) -> dict[str, float]:
    """End-to-end fit: one distributed pass (:func:`sufficient_stats`,
    unrounded by default — the gate's rounding is for cross-engine
    hashing, not for the solve) + the driver solve."""
    features = features if features is not None else feature_columns()
    row = sufficient_stats(docs, features, label,
                           round_to=round_to).first().asDict()
    return solve_ridge(row, list(features), l2=l2)


def model_score(weights: dict[str, float],
                features: dict[str, Column] | None = None) -> Column:
    """The fitted model as a literal dot-product Column — compiles into
    whole-stage codegen wherever it is used; no UDF, no join."""
    features = features if features is not None else feature_columns()
    score = F.lit(weights["one"])
    for name, col in features.items():
        score = score + F.lit(weights[name]) * col
    return score


def model_score_sql(weights: dict[str, float],
                    feature_sqls: dict[str, str] | None = None,
                    round_to: int | None = 6) -> str:
    """DuckDB replay of :func:`model_score` (same literal weights).
    ``round_to=None`` emits the raw expression — what a replayed
    FILTER must compare (the Spark filter sees the unrounded score;
    rounding is only for hashed output columns)."""
    feature_sqls = (feature_sqls if feature_sqls is not None
                    else feature_sql())
    terms = [repr(weights["one"])]
    terms += [f"{weights[n]!r} * ({s})" for n, s in feature_sqls.items()]
    raw = " + ".join(terms)
    return raw if round_to is None else f"round({raw}, {round_to})"


def drop_low_model_score(docs: DataFrame, weights: dict[str, float],
                         tau: float,
                         features: dict[str, Column] | None = None,
                         ) -> DataFrame:
    """The corpus minus documents scoring below ``tau`` — a pure
    codegen filter that fuses into the scan, schema and column order
    preserved."""
    return docs.where(model_score(weights, features) >= tau)
