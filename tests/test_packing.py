"""operators/packing.py — sequence packing (training-example manifest).

Pins the semantics the DuckDB gate can't isolate: exact-boundary docs,
multi-sequence spans, zero-token drop, the partial-tail contract, the
salt/shard function, the n_tokens_col path, materialization exactness
(each shard's sequences concatenate back to its truncated doc stream),
and the key-width-only shuffle plan property.
"""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from refined_spark.operators.packing import (TOKEN_PATTERN,
                                             materialize_sequences,
                                             pack_manifest, shard_of,
                                             token_count)

PAT = re.compile(TOKEN_PATTERN)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(i, n):
    return " ".join(f"w{i}x{j}" for j in range(n))


def _shard_py(key, n_shards, salt=""):
    h = hashlib.md5((salt + str(key)).encode()).hexdigest()
    return int(h[:4], 16) % n_shards


def test_manifest_basic_invariants(spark):
    docs = _docs(spark, [(i, _words(i, 3 + (i * 7) % 40))
                         for i in range(30)])
    m = pack_manifest(docs, seq_len=16, n_shards=3).collect()
    # every kept sequence holds exactly seq_len tokens
    by_seq = {}
    for r in m:
        by_seq.setdefault((r.shard, r.seq_id), []).append(r)
    for rows in by_seq.values():
        assert sum(r.n_slice_tokens for r in rows) == 16
        rows.sort(key=lambda r: r.pos_in_seq)
        # slices tile the sequence contiguously from 0
        at = 0
        for r in rows:
            assert r.pos_in_seq == at
            at += r.n_slice_tokens
    # seq_ids per shard are dense from 0
    for s in {r.shard for r in m}:
        ids = sorted({r.seq_id for r in m if r.shard == s})
        assert ids == list(range(len(ids)))


def test_exact_boundary_and_multi_span(spark):
    # one shard so the stream order is just doc_id
    docs = _docs(spark, [(1, _words(1, 8)),    # fills seq 0 exactly
                         (2, _words(2, 20)),   # spans seqs 1,2,3
                         (3, _words(3, 13))])  # 41 total: seq 5 partial
    m = sorted(pack_manifest(docs, seq_len=8, n_shards=1).collect(),
               key=lambda r: (r.seq_id, r.pos_in_seq))
    got = [(r.seq_id, r.pos_in_seq, r.doc_id, r.doc_offset,
            r.n_slice_tokens) for r in m]
    assert got == [(0, 0, 1, 0, 8),
                   (1, 0, 2, 0, 8), (2, 0, 2, 8, 8),
                   (3, 0, 2, 16, 4), (3, 4, 3, 0, 4),
                   (4, 0, 3, 4, 8)]
    # doc 3's final token (offset 12) falls in the dropped partial tail


def test_zero_token_docs_vanish(spark):
    docs = _docs(spark, [(1, _words(1, 8)), (2, ""), (3, "   ")])
    m = pack_manifest(docs, seq_len=4, n_shards=1).collect()
    assert {r.doc_id for r in m} == {1}


def test_drop_partial_contract(spark):
    docs = _docs(spark, [(1, _words(1, 10))])
    kept = pack_manifest(docs, seq_len=8, n_shards=1,
                         drop_partial=False).collect()
    assert sorted((r.seq_id, r.n_slice_tokens) for r in kept) == \
        [(0, 8), (1, 2)]
    dropped = pack_manifest(docs, seq_len=8, n_shards=1).collect()
    assert sorted((r.seq_id, r.n_slice_tokens) for r in dropped) == \
        [(0, 8)]


def test_shard_function_matches_python_replay(spark):
    docs = _docs(spark, [(i, "x") for i in range(50)])
    for salt in ("", "s1"):
        got = {r.doc_id: r.s for r in docs.select(
            "doc_id", shard_of(F.col("doc_id"), 5, salt).alias("s"))
            .collect()}
        assert got == {i: _shard_py(i, 5, salt) for i in range(50)}
    # salt actually moves assignments
    a = {i: _shard_py(i, 5, "") for i in range(50)}
    b = {i: _shard_py(i, 5, "s1") for i in range(50)}
    assert a != b


def test_n_tokens_col_path(spark):
    docs = _docs(spark, [(i, _words(i, 5 + i)) for i in range(10)])
    pre = docs.withColumn("n_tokens", token_count(F.col("text")))
    a = pack_manifest(docs, seq_len=8, n_shards=2).collect()
    b = pack_manifest(pre, seq_len=8, n_shards=2,
                      n_tokens_col="n_tokens").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_materialization_exactness(spark):
    """Each shard's sequences, concatenated in seq_id order, equal the
    shard's doc-ordered token stream truncated at the tail drop — the
    defining property of concatenate-and-chunk."""
    rows = [(i, _words(i, 3 + (i * 7) % 40)) for i in range(40)]
    docs = _docs(spark, rows)
    L, n_shards = 16, 3
    m = pack_manifest(docs, seq_len=L, n_shards=n_shards)
    toks = docs.select("doc_id", F.regexp_extract_all(
        "text", F.lit(TOKEN_PATTERN), F.lit(0)).alias("tokens"))
    seqs = {(r.shard, r.seq_id): r.tokens
            for r in materialize_sequences(m, toks).collect()}
    streams = {s: [] for s in range(n_shards)}
    for i, text in sorted(rows):
        streams[_shard_py(i, n_shards)].extend(PAT.findall(text))
    expected = {}
    for s, stream in streams.items():
        for k in range(len(stream) // L):
            expected[(s, k)] = stream[k * L:(k + 1) * L]
    assert seqs == expected
    assert all(len(v) == L for v in seqs.values())


def test_no_text_past_any_exchange(spark):
    docs = _docs(spark, [(i, _words(i, 20)) for i in range(20)])
    plan = (pack_manifest(docs, seq_len=8, n_shards=2)
            ._jdf.queryExecution().executedPlan().toString())
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line


def test_validation(spark):
    docs = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="seq_len"):
        pack_manifest(docs, seq_len=0)
    with pytest.raises(ValueError, match="n_shards"):
        pack_manifest(docs, seq_len=8, n_shards=0)
