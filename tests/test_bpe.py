"""E2 byte-level BPE: hand-computed goldens, offset contract (incl.
multi-byte chars), greedy-vs-rank-replay equivalence, Spark UDF parity.
"""

import pytest

from refined_spark.operators.bpe import (
    byte_to_unicode,
    encode_text,
    encode_word,
    encode_word_rank_replay,
    map_word,
    piece_ids,
    pretokenize,
    train_bpe,
)


def test_pretokenize_gpt2_shapes():
    toks = [t for t, _, _ in pretokenize("He isn't here, it's 1987!")]
    # contractions split off; leading space glued to the next word
    assert toks == ["He", " isn", "'t", " here", ",", " it", "'s",
                    " 1987", "!"]


def test_pretokenize_offsets_cover_text():
    text = "a  b\tc\n"
    spans = pretokenize(text)
    assert "".join(t for t, _, _ in spans) == text
    assert all(text[s:e] == t for t, s, e in spans)


def test_byte_alphabet_reversible():
    b2u = byte_to_unicode()
    assert len(b2u) == 256 and len(set(b2u.values())) == 256


def test_train_and_encode_tiny():
    # corpus where ("l","o") is the most frequent pair
    merges = train_bpe(["lo lo lo low lower"], 2)
    assert merges[0] == ("l", "o")
    ranks = {p: k for k, p in enumerate(merges)}
    assert encode_word(map_word("lo"), ranks) == ["lo"]


def test_greedy_equals_rank_replay():
    texts = ["the cat sat on the mat", "the catalog, the category",
             "caté naïve — №9 isn't low"]
    merges = train_bpe(texts, 60)
    ranks = {p: k for k, p in enumerate(merges)}
    for t in texts:
        for raw, _, _ in pretokenize(t):
            m = map_word(raw)
            assert encode_word(m, ranks) == \
                encode_word_rank_replay(m, merges)


def test_encode_text_offsets_multibyte():
    merges = train_bpe(["naïve naïve naïve"], 0)  # no merges: byte tokens
    ranks = {p: k for k, p in enumerate(merges)}
    toks = encode_text("naïve", ranks, piece_ids(merges))
    # 'ï' is 2 UTF-8 bytes -> two byte tokens, both snapping to the same
    # enclosing char [2,3)
    spans = [(s, e) for _, _, s, e in toks]
    assert len(toks) == 6
    assert spans == [(0, 1), (1, 2), (2, 3), (2, 3), (3, 4), (4, 5)]
    # ids: merged none, so every id < 256 and round-trips to the byte
    assert all(i < 256 for _, i, _, _ in toks)


def test_token_ids_engine_contract():
    merges = train_bpe(["ab ab ab"], 1)
    ids = piece_ids(merges)
    assert ids["ab"] == 256  # first merge
    assert ids["a"] == ord("a") and ids["b"] == ord("b")


@pytest.mark.usefixtures("spark")
def test_spark_udf_matches_sequential(spark, tmp_path):
    from refined_spark.operators.bpe import save_merges, with_bpe_tokens

    texts = ["Paris isn't small — №1 café!", "low lower lowest 42",
             "", "the the the"]
    merges = train_bpe(texts, 40)
    path = str(tmp_path / "merges.parquet")
    save_merges(path, merges)
    ranks = {p: k for k, p in enumerate(merges)}
    ids = piece_ids(merges)

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id int, text string")
    got = {r.doc_id: [(t.piece, t.token_id, t.start, t.end)
                      for t in r.tokens]
           for r in with_bpe_tokens(df, path).collect()}
    for i, t in enumerate(texts):
        assert got[i] == encode_text(t, ranks, ids), t


def test_roundtrip_property():
    """Pieces concatenate back to the mapped pre-tokens and offsets tile
    the text, for arbitrary unicode inputs (hypothesis)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    merges = train_bpe(["the cat sat on the mat isn't low"], 30)
    ranks = {p: k for k, p in enumerate(merges)}
    ids = piece_ids(merges)

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=80))
    def check(text):
        toks = encode_text(text, ranks, ids)
        # concatenated pieces = full mapped byte stream of all pre-tokens
        assert "".join(t[0] for t in toks) == "".join(
            map_word(raw) for raw, _, _ in pretokenize(text))
        # offsets: within bounds, end > start
        for _, _, s, e in toks:
            assert 0 <= s < e <= len(text)
        # ids round-trip through the vocab
        assert all(t[1] in set(ids.values()) for t in toks)

    check()


# --------------------------------------------------------------- distributed


TRAIN_CORPORA = [
    ["lo lo lo low lower"],
    ["the cat sat on the mat isn't low", "ab ab ab aaab"],
    ["naïve café rôle №7 — cost $84.50", "Łódź Œuvre straße"],
]


def test_train_bpe_spark_matches_sequential(spark):
    """BOTH trainer paths — the default driver fast path (collected
    Zipf word-frequency table, the fastBPE/HF shape) and the
    distributed merge loop (driver_vocab_limit=0) — are bit-identical
    to train_bpe: same overlapping-pair counts, same (-freq, pair)
    tie-break, same greedy rewrite — on corpora covering multi-byte
    chars and tie cases."""
    from refined_spark.operators.bpe import train_bpe_spark

    for texts in TRAIN_CORPORA:
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")
        expected = train_bpe(texts, 25)
        assert train_bpe_spark(docs, 25) == expected
        assert train_bpe_spark(docs, 25,
                               driver_vocab_limit=0) == expected


def test_train_bpe_spark_vocab_limit_fallback(spark):
    """A vocabulary larger than driver_vocab_limit falls back to the
    distributed loop — same artifact, one warning."""
    from refined_spark.operators.bpe import train_bpe_spark

    texts = TRAIN_CORPORA[0]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    # the corpus has far more than 2 distinct words -> forced fallback
    assert (train_bpe_spark(docs, 10, driver_vocab_limit=2)
            == train_bpe(texts, 10))


def test_train_bpe_spark_early_stop_and_checkpoint_cadence(spark):
    from refined_spark.operators.bpe import train_bpe_spark

    docs = spark.createDataFrame([(0, "ab ab")],
                                 "doc_id long, text string")
    # pairs exhaust after 2 merges; asking for 50 must stop, not spin
    # (both paths)
    assert train_bpe_spark(docs, 50) == train_bpe(["ab ab"], 50)
    assert (train_bpe_spark(docs, 50, driver_vocab_limit=0)
            == train_bpe(["ab ab"], 50))
    # the lineage-truncation cadence is an execution detail only
    docs2 = spark.createDataFrame(
        [(0, "the cat sat on the mat")], "doc_id long, text string")
    assert (train_bpe_spark(docs2, 12, driver_vocab_limit=0,
                            checkpoint_every=1)
            == train_bpe_spark(docs2, 12, driver_vocab_limit=0,
                               checkpoint_every=50))


def test_train_merge_prefix_stability():
    """Greedy merge selection does not depend on n_merges — the first
    k merges of a longer run equal a k-merge run. The bpe_train gate's
    oracle (the 240-merge artifact sliced to rank < 48) rests on
    exactly this property."""
    texts = ["the cat sat on the mat isn't low", "lo lo low lower"]
    assert train_bpe(texts, 60)[:20] == train_bpe(texts, 20)
