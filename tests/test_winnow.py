"""Winnowing fingerprints (operators/dedup.py::winnow*): the SIGMOD'03
local-match guarantee, short-document conventions, and determinism under
repartitioning."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from pandemic_knowledge_spark.operators.dedup import winnow_fingerprints

K, W = 3, 4
GUARANTEE = W + K - 1  # any shared token run this long shares a fingerprint


def _fps(spark, docs: list[tuple[int, str]], k: int = K, w: int = W) -> dict:
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = winnow_fingerprints(df, "doc_id", "text", k=k, w=w).collect()
    return {r.doc_id: set(r.fingerprints) for r in out}


def test_local_match_guarantee(spark):
    """Randomized adversary: plant one shared GUARANTEE-token run inside
    otherwise-disjoint documents; a fingerprint must always be shared."""
    rng = random.Random(7)
    docs = []
    for i in range(10):
        shared = " ".join(f"common{j}" for j in range(GUARANTEE))
        left = " ".join(f"a{i}x{j}" for j in range(rng.randint(0, 12)))
        right = " ".join(f"b{i}y{j}" for j in range(rng.randint(0, 12)))
        docs.append((2 * i, f"{left} {shared} {right}".strip()))
        docs.append((2 * i + 1, f"{shared} tail{i}".strip()))
    fps = _fps(spark, docs)
    for i in range(10):
        assert fps[2 * i] & fps[2 * i + 1], f"pair {i} shares no fingerprint"


def test_disjoint_docs_share_nothing(spark):
    fps = _fps(
        spark,
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "one two three four five six")],
    )
    assert not fps[1] & fps[2]


def test_short_document_conventions(spark):
    docs = [
        (1, "a b"),          # < k tokens: dropped entirely
        (2, "a b c"),        # exactly one gram (< w): its hash is the fingerprint
        (3, "a b c d"),      # two grams (< w): single global min
    ]
    fps = _fps(spark, docs)
    assert 1 not in fps
    assert len(fps[2]) == 1
    assert len(fps[3]) == 1


def test_fingerprints_are_subset_and_compressed(spark):
    text = " ".join(f"tok{i % 17}" for i in range(200))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    row = winnow_fingerprints(df, "doc_id", "text", k=K, w=W).collect()[0]
    # Winnowing compresses: far fewer fingerprints than grams.
    assert 0 < len(row.fingerprints) < row.n_grams
    assert row.fingerprints == sorted(set(row.fingerprints))


def test_partitioning_invariance(spark):
    docs = [(i, f"the quick brown fox {i} jumps over the lazy dog") for i in range(20)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    a = winnow_fingerprints(df.repartition(1), "doc_id", "text")
    b = winnow_fingerprints(df.repartition(7, "doc_id"), "doc_id", "text")
    key = lambda r: (r.doc_id, r.n_grams, tuple(r.fingerprints))
    assert {key(r) for r in a.collect()} == {key(r) for r in b.collect()}
