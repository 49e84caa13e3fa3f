"""Semantic edge cases for the repetition/diversity signals — hand-computed
expectations on tiny frames (parity with DuckDB is test_oracle_parity's job).
"""

from __future__ import annotations

import math

from pandemic_knowledge_spark.operators.repetition import repetition_signals


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = repetition_signals(df, "doc_id", "text").collect()
    assert len(rows) == 1
    return rows[0]


def test_uniform_doc_has_max_entropy_and_low_repetition(spark):
    r = _one(spark, "a b c d")
    assert r.n_tokens == 4 and r.n_distinct_tokens == 4
    assert r.top_token_frac == 0.25
    assert r.dup_2gram_frac == 0.0  # 'a b','b c','c d' all distinct
    assert r.token_entropy == round(math.log(4), 6)


def test_degenerate_loop_is_flagged(spark):
    r = _one(spark, "spam spam spam spam")
    assert r.top_token_frac == 1.0
    # 3 bigrams, all 'spam spam' -> 1 - 1/3
    assert r.dup_2gram_frac == round(1 - 1 / 3, 6)
    assert r.token_entropy == 0.0  # single-token distribution


def test_single_token_doc_has_null_gram_frac(spark):
    r = _one(spark, "hello")
    assert r.n_tokens == 1
    assert r.dup_2gram_frac is None  # too short to 2-gram: null, not 0
    assert r.token_entropy == 0.0


def test_empty_doc_produces_no_row(spark):
    df = spark.createDataFrame([(1, ""), (2, "a b")], ["doc_id", "text"])
    out = repetition_signals(df, "doc_id", "text")
    assert [r.doc_id for r in out.collect()] == [2]


def test_mixed_distribution_matches_hand_entropy(spark):
    # counts: the=2, cat=1, sat=1 -> H = ln(4) - (2 ln 2)/4
    r = _one(spark, "the cat the sat")
    assert r.n_tokens == 4 and r.n_distinct_tokens == 3
    assert r.top_token_frac == 0.5
    assert r.token_entropy == round(math.log(4) - 2 * math.log(2) / 4, 6)
