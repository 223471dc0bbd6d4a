"""Unigram-LM tokenizer (operators/unigram.py): Viterbi segmentation
pinned by hand, hard-EM behavior, and encode invariants."""

from __future__ import annotations

import math

from energy_consumption_forecasting_spark.operators.unigram import (
    candidate_pieces,
    learn_unigram,
    unigram_encode_words,
    viterbi_segment,
)


def test_viterbi_hand_computed():
    # pieces: a, b, ab; P(ab) > P(a)P(b)  ->  "abab" = [ab, ab]
    logp = {"a": math.log(0.3), "b": math.log(0.3), "ab": math.log(0.4)}
    assert viterbi_segment("abab", logp, max_len=2) == ["ab", "ab"]
    # make the pair unattractive: log P(ab) < log P(a) + log P(b)
    logp2 = {"a": math.log(0.45), "b": math.log(0.45), "ab": math.log(0.10)}
    assert viterbi_segment("abab", logp2, max_len=2) == ["a", "b", "a", "b"]


def test_viterbi_tie_breaks_fewer_pieces():
    # P(ab) == P(a)P(b): equal likelihood -> prefer FEWER pieces
    p = math.log(0.25)
    logp = {"a": p, "b": p, "ab": 2 * p}
    assert viterbi_segment("ab", logp, max_len=2) == ["ab"]


def test_candidates_keep_single_chars(spark):
    words = spark.createDataFrame(
        [("hello", 10), ("help", 5), ("zq", 1)], "w string, cnt long"
    )
    got = candidate_pieces(words, max_len=3, top_v=8).collect()
    pieces = {r.piece for r in got}
    # single chars always survive the top-V cut
    for ch in "helopzq":
        assert ch in pieces
    by = {r.piece: r.weighted_count for r in got}
    assert by["hel"] == 15  # hello(10) + help(5)


def test_learn_and_encode_invariants(spark):
    words = spark.createDataFrame(
        [("spark", 8), ("sparks", 4), ("park", 6), ("bark", 3), ("spar", 2)],
        "w string, cnt long",
    )
    logp = learn_unigram(words, rounds=2, max_len=4, top_v=12)
    # all probabilities normalized and negative
    assert all(lp < 0 for lp in logp.values())
    enc = {
        r.w: list(r.pieces)
        for r in unigram_encode_words(words, logp, max_len=4).collect()
    }
    assert set(enc) == {"spark", "sparks", "park", "bark", "spar"}
    for w, pieces in enc.items():
        assert "".join(pieces) == w  # concatenation identity
        assert all(p in logp for p in pieces)  # closed vocabulary


def test_em_does_not_decrease_viterbi_likelihood(spark):
    rows = [("abab", 6), ("abba", 3), ("baba", 4), ("aabb", 2)]
    words = spark.createDataFrame(rows, "w string, cnt long")

    def corpus_ll(logp):
        return sum(
            c * sum(logp[p] for p in viterbi_segment(w, logp, 3))
            for w, c in rows
        )

    l0 = learn_unigram(words, rounds=0, max_len=3, top_v=8)
    l2 = learn_unigram(words, rounds=2, max_len=3, top_v=8)
    assert corpus_ll(l2) >= corpus_ll(l0) - 1e-9
