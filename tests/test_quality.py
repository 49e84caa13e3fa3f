"""Hashed linear quality classifier: Python-reference equality, weight
sensitivity, degenerate docs, and the zero-shuffle/zero-Python plan gate."""

from __future__ import annotations

import hashlib
import re

import pytest

from pandemic_knowledge_spark.operators.quality import (
    hash_weights,
    quality_scores,
)

TOKEN_RE = re.compile("[a-z0-9]+")


def md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_score(text: str, weights: list[int], bias: int, salt: str):
    toks = TOKEN_RE.findall(text.lower())
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    if not feats:
        return None
    s = bias + sum(weights[md5_int(f"{salt}:{f}") % len(weights)] for f in feats)
    return (len(feats), s, round(s / (1000.0 * len(feats)), 6), s >= 0)


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "spam spam spam spam spam"),
    (2, ""),
    (3, "!!!"),
    (4, "a"),
    (5, " ".join(f"tok{i % 13}" for i in range(80))),
]


def test_matches_python_reference(spark):
    w = hash_weights()
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_features, r.score_milli, r.quality_score, r.keep)
        for r in quality_scores(df, "doc_id", "text", w, bias_milli=7).collect()
    }
    expect = {
        doc_id: py_score(text, w, 7, "qclf")
        for doc_id, text in DOCS
        if py_score(text, w, 7, "qclf") is not None
    }
    assert got == expect


def test_empty_docs_dropped(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    ids = {r.doc_id for r in quality_scores(df, "doc_id", "text", hash_weights()).collect()}
    assert ids == {0, 1, 4, 5}


def test_bias_shifts_threshold(spark):
    df = spark.createDataFrame([(0, "hello world")], "doc_id long, text string")
    w = hash_weights()
    base = quality_scores(df, "doc_id", "text", w).collect()[0]
    shifted = quality_scores(
        df, "doc_id", "text", w, bias_milli=-base.score_milli
    ).collect()[0]
    assert shifted.score_milli == 0 and shifted.keep


def test_weights_change_scores(spark):
    df = spark.createDataFrame([(0, "hello world")], "doc_id long, text string")
    a = quality_scores(df, "doc_id", "text", hash_weights(seed=1)).collect()[0]
    b = quality_scores(df, "doc_id", "text", hash_weights(seed=2)).collect()[0]
    assert a.score_milli != b.score_milli


def test_no_shuffle_no_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        quality_scores(df, "doc_id", "text", hash_weights())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
