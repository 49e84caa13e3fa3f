"""Feature-hashing embeddings (operators.embedding): structural and
determinism properties the downstream ANN/dedup operators rely on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandemic_knowledge_spark.operators.embedding import DIM, hash_embeddings


def _emb(spark, rows, **kw):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r.emb for r in hash_embeddings(docs, **kw).collect()}


def test_shape_and_zero_doc(spark):
    out = _emb(spark, [(0, "some words here"), (1, "...!!!")])
    assert len(out[0]) == DIM and len(out[1]) == DIM
    assert out[1] == [0] * DIM          # token-free doc -> zero vector
    assert sum(abs(v) for v in out[0]) == 3   # 3 tokens, each ±1 somewhere


def test_identical_docs_identical_embeddings(spark):
    out = _emb(spark, [(0, "Alpha beta GAMMA"), (1, "alpha BETA gamma")])
    assert out[0] == out[1]             # case-insensitive tokenizer


def test_token_order_invariant_and_additive(spark):
    out = _emb(spark, [(0, "x y z"), (1, "z y x"), (2, "x y z x y z")])
    assert out[0] == out[1]
    assert out[2] == [2 * v for v in out[0]]  # counts, not presence


def test_disjoint_vocab_low_overlap(spark):
    a = "apple banana cherry date elderberry fig grape"
    b = "umber violet walnut xenon yarrow zinc quartz"
    out = _emb(spark, [(0, a), (1, b)])
    dot = sum(x * y for x, y in zip(out[0], out[1]))
    norm = sum(x * x for x in out[0]) ** 0.5 * sum(y * y for y in out[1]) ** 0.5
    assert abs(dot) / norm < 0.5        # hashed disjoint vocab ~ orthogonal


def test_non_power_of_two_dim_rejected(spark):
    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        hash_embeddings(docs, dim=48)
