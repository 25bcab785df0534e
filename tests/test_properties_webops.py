"""Property-based tests (hypothesis) for the round-4 web-pipeline
operators: invariants that must hold for ARBITRARY corpora, not just
the designed fixtures.

Spark-backed properties keep ``max_examples`` small (each example is a
real job on the shared session); the registered-domain property runs
engine-free against an independent Python replay of the closed rule,
checked through DuckDB on the EMITTED oracle SQL — so a drift in the
emitter itself (not just the Spark side) is caught.
"""

import re

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from refined_spark.operators.packing import pack_manifest
from refined_spark.operators.psl import (EXCEPTIONS_2, EXCEPTIONS_3,
                                         SUFFIXES_2, SUFFIXES_3,
                                         WILDCARD_1, WILDCARD_2)
from refined_spark.operators.urlfilter import registered_domain_sql

# ---------------------------------------------------------------- urlfilter

_LABEL = st.from_regex(r"[a-z][a-z0-9-]{0,6}", fullmatch=True).filter(
    lambda s: not s.endswith("-"))
_HOSTS = st.one_of(
    st.lists(_LABEL, min_size=1, max_size=4).map(".".join),
    st.lists(_LABEL, min_size=1, max_size=2).map(
        lambda ls: ".".join(ls + ["co", "uk"])),
    st.lists(_LABEL, min_size=1, max_size=2).map(
        lambda ls: ".".join(ls + ["com", "sg"])),
    st.lists(_LABEL, min_size=0, max_size=2).map(
        lambda ls: ".".join(ls + ["k12", "ca", "us"])),
    # wildcard registries and their exceptions
    st.lists(_LABEL, min_size=1, max_size=3).map(
        lambda ls: ".".join(ls + ["ck"])),
    st.lists(_LABEL, min_size=0, max_size=2).map(
        lambda ls: ".".join(ls + ["www", "ck"])),
    st.lists(_LABEL, min_size=1, max_size=2).map(
        lambda ls: ".".join(ls + ["kawasaki", "jp"])),
    st.lists(_LABEL, min_size=0, max_size=2).map(
        lambda ls: ".".join(ls + ["city", "kawasaki", "jp"])),
    st.lists(_LABEL, min_size=1, max_size=2).map(
        lambda ls: ".".join(ls + ["sch", "uk"])),
    st.lists(_LABEL, min_size=1, max_size=2).map(
        lambda ls: ".".join(ls + ["kh"])),
    st.tuples(st.integers(0, 255), st.integers(0, 255),
              st.integers(0, 255), st.integers(0, 255)).map(
        lambda t: ".".join(map(str, t))),
)

_S2, _S3 = set(SUFFIXES_2), set(SUFFIXES_3)
_W1, _W2 = set(WILDCARD_1), set(WILDCARD_2)
_X2, _X3 = set(EXCEPTIONS_2), set(EXCEPTIONS_3)


def _registered_domain_py(host: str) -> str:
    """Independent Python replay of the prevailing-rule cascade (module
    docstring of operators/urlfilter.py): exception > wildcard/exact
    at each depth, longest first — deliberately NOT sharing code with
    the implementation."""
    host = re.sub(r"^www\.", "", host)  # crawl.py rule 2 (host atom)
    if re.fullmatch(r"[0-9.]+", host):
        return host
    parts = host.split(".")
    if len(parts) <= 2:
        return host
    if ".".join(parts[-3:]) in _X3:
        return ".".join(parts[-3:])
    if ".".join(parts[-2:]) in _X2:
        return ".".join(parts[-2:])
    if ".".join(parts[-2:]) in _W2 or ".".join(parts[-3:]) in _S3:
        return ".".join(parts[-4:])
    if parts[-1] in _W1 or ".".join(parts[-2:]) in _S2:
        return ".".join(parts[-3:])
    return ".".join(parts[-2:])


@given(st.lists(_HOSTS, min_size=1, max_size=20))
@settings(max_examples=60, deadline=None)
def test_registered_domain_sql_matches_python_rule(hosts):
    con = duckdb.connect()
    con.execute("create table t(url varchar)")
    con.executemany("insert into t values (?)",
                    [(f"https://{h}/p",) for h in hosts])
    got = [r[0] for r in con.execute(
        f"select {registered_domain_sql('url')} from t").fetchall()]
    assert got == [_registered_domain_py(h) for h in hosts]


# ------------------------------------------------------------------ packing

_CORPUS = st.lists(st.integers(0, 40), min_size=1, max_size=25)


@given(_CORPUS, st.integers(1, 9), st.integers(1, 3))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pack_manifest_invariants(spark, n_toks, seq_len, n_shards):
    """For any doc-length profile: every kept sequence holds exactly
    seq_len tokens tiling contiguously from 0; token conservation
    (manifest total == sum of per-shard floor-truncated stream
    lengths); no doc contributes beyond its own length."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}x{j}" for j in range(n))) for i, n
         in enumerate(n_toks)], "doc_id long, text string")
    pre = docs.withColumn("n_tokens", F.size(F.split("text", " ", -1)))
    pre = pre.withColumn("n_tokens", F.when(
        F.col("text") == "", 0).otherwise(F.col("n_tokens")))
    m = pack_manifest(pre, seq_len=seq_len, n_shards=n_shards,
                      n_tokens_col="n_tokens").collect()
    by_seq = {}
    for r in m:
        by_seq.setdefault((r.shard, r.seq_id), []).append(r)
    for rows in by_seq.values():
        rows.sort(key=lambda r: r.pos_in_seq)
        at = 0
        for r in rows:
            assert r.pos_in_seq == at
            at += r.n_slice_tokens
        assert at == seq_len
    # per-doc contributions cover a prefix-free partition of the doc
    per_doc = {}
    for r in m:
        per_doc.setdefault(r.doc_id, []).append(
            (r.doc_offset, r.n_slice_tokens))
    for d, slices in per_doc.items():
        slices.sort()
        end = slices[-1][0] + slices[-1][1]
        assert end <= n_toks[d]
        # slices are contiguous from 0 (a doc enters the stream whole;
        # only its TAIL can be cut, by the shard's partial-seq drop)
        at = 0
        for off, ln in slices:
            assert off == at
            at += ln


# -------------------------------------------------------------------- lines

_LINE = st.text(alphabet="ab A.2-", min_size=0, max_size=8)


@given(st.lists(st.lists(_LINE, min_size=1, max_size=5),
                min_size=1, max_size=8))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_line_dedup_idempotent_and_monotone(spark, corpora):
    """Keep-first line dedup is idempotent (a deduped corpus has no
    cross-doc duplicate keys left) and never grows a document."""
    from refined_spark.operators.lines import line_dedup_keep_first

    docs = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(corpora)],
        "doc_id long, text string")
    once = line_dedup_keep_first(docs)
    twice = line_dedup_keep_first(
        once.select("doc_id", "text"))
    a = {(r.doc_id, r.text) for r in once.select("doc_id", "text")
         .collect()}
    b = {(r.doc_id, r.text) for r in twice.select("doc_id", "text")
         .collect()}
    assert a == b
    kept = {r.doc_id: r.n_lines_kept for r in once.collect()}
    for i, lines in enumerate(corpora):
        if i in kept:
            assert kept[i] <= len(lines)


# -------------------------------------------------------------- incremental

_TEXTS = st.lists(
    st.one_of(st.none(),
              st.text(alphabet=" abcdef\t", min_size=0, max_size=20)),
    min_size=1, max_size=12)


@given(_TEXTS, _TEXTS)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_incremental_dedup_invariants(spark, hist_texts, incr_texts):
    """For ARBITRARY history/increment corpora (incl. NULLs, empties,
    whitespace variants): (1) the kept increment never shares a
    non-null canonical text with history; (2) non-null canonical texts
    are unique within the kept increment (keep-first); (3) every NULL
    text survives; (4) replaying the increment against the
    rolled-forward manifest leaves exactly the NULL rows — the
    snapshot-ingest idempotence contract."""
    import re as _re

    from refined_spark.operators.incremental import (advance_manifest,
                                                     corpus_manifest,
                                                     dedup_increment)

    def canon(t):
        # collapse-then-strip — the module's trim-after-collapse rule
        # (this replay originally stripped FIRST with python's
        # all-whitespace strip while the engines' trim was space-only:
        # hypothesis found the divergence on a leading tab, and the
        # module rule was tightened to match full canonicalization)
        return None if t is None else _re.sub(r"\s+", " ", t).strip()

    hist = spark.createDataFrame(
        list(enumerate(hist_texts)), "doc_id long, text string")
    incr = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(incr_texts)],
        "doc_id long, text string")
    m0 = corpus_manifest(hist)
    kept = dedup_increment(incr, m0).collect()
    hist_canon = {canon(t) for t in hist_texts if t is not None}
    kept_canon = [canon(r.text) for r in kept if r.text is not None]
    assert not (set(kept_canon) & hist_canon)
    assert len(kept_canon) == len(set(kept_canon))
    n_null = sum(1 for t in incr_texts if t is None)
    assert sum(1 for r in kept if r.text is None) == n_null
    kept_df = spark.createDataFrame(
        [(r.doc_id, r.text) for r in kept] or [(0, "x")],
        "doc_id long, text string")
    again = dedup_increment(incr, advance_manifest(m0, kept_df))
    # every non-null increment row's canon is in hist (dropped by m0)
    # or in kept (added by the roll-forward) — the replay must drop
    # them ALL, unconditionally
    assert again.where("text is not null").count() == 0


# ------------------------------------------------------------ quality_model

_QM_TEXTS = st.lists(
    st.text(alphabet=" abcdefgh.,!", min_size=1, max_size=40),
    min_size=2, max_size=10)


@given(_QM_TEXTS)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_sufficient_stats_gram_matrix_is_psd(spark, texts):
    """For ANY corpus the unrounded sufficient-statistics matrix over
    [1, features..., label] is a Gram matrix Z^T Z — symmetric PSD by
    construction. A negative eigenvalue beyond fp noise would mean the
    pairwise sums do not come from one consistent design matrix (the
    class of bug a wrong index pairing or a per-column NULL asymmetry
    would introduce)."""
    import numpy as np

    from refined_spark.operators.quality_model import (feature_columns,
                                                       sufficient_stats)

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    row = sufficient_stats(docs, feature_columns(),
                           F.length("text").cast("double"),
                           round_to=None).first().asDict()
    names = ["one", *feature_columns(), "label"]
    G = np.array([[row.get(f"s_{a}_{b}", row.get(f"s_{b}_{a}"))
                   for b in names] for a in names])
    assert np.allclose(G, G.T)
    assert np.linalg.eigvalsh(G).min() > -1e-8 * max(1.0, abs(G).max())
