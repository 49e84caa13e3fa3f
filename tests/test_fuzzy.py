"""Fuzzy trigram matching (operators/fuzzy.py): normalization, best-match
selection, threshold rejection, hot-trigram capping, and the broadcast plan
shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandemic_knowledge_spark.operators.fuzzy import (
    char_trigrams,
    fuzzy_best_match,
    normalize_name,
)


def _dim(spark, names):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], ["key", "name"]
    )


def _match(spark, queries, names, **kw):
    q = spark.createDataFrame([(s,) for s in queries], ["q"])
    out = fuzzy_best_match(q, _dim(spark, names), "q", "name", "key", **kw)
    return {r.q: (r.name, r.jaccard) for r in out.collect()}


def test_exact_after_normalization_scores_one(spark):
    got = _match(spark, ["United-States!"], ["united states", "germany"])
    assert got["United-States!"][0] == "united states"
    assert got["United-States!"][1] == 1.0


def test_typo_matches_best_and_garbage_drops(spark):
    got = _match(
        spark,
        ["untied states", "zzzqqq"],
        ["united states", "united kingdom", "germany"],
    )
    assert got["untied states"][0] == "united states"
    assert "zzzqqq" not in got


def test_tie_breaks_to_smallest_key(spark):
    # two identical dim names: the smaller key must win deterministically
    got = _match(spark, ["france"], ["france", "france"])
    q = spark.createDataFrame([("france",)], ["q"])
    out = fuzzy_best_match(
        q, _dim(spark, ["france", "france"]), "q", "name", "key"
    ).collect()
    assert len(out) == 1 and out[0].key == 0
    assert got["france"][1] == 1.0


def test_trigrams_and_normalize(spark):
    row = spark.range(1).select(
        char_trigrams(normalize_name(F.lit("A-bC d"))).alias("g"),
        char_trigrams(normalize_name(F.lit("ab"))).alias("short"),
    ).first()
    assert sorted(row.g) == ["abc", "bcd"]
    assert row.short == []


def test_hot_trigram_cap_drops_uninformative(spark):
    # every dim name shares 'xxx...' prefix trigrams; cap at 1 removes them,
    # so only the distinctive tails score.
    names = ["xxxxalpha", "xxxxbeta", "xxxxgamma"]
    got = _match(spark, ["xxxxalpha"], names, max_posting=1, threshold=0.05)
    assert got["xxxxalpha"][0] == "xxxxalpha"


def test_dim_postings_broadcast(spark):
    q = spark.createDataFrame([("abcde",)], ["q"])
    plan = (
        fuzzy_best_match(q, _dim(spark, ["abcdef", "ghijk"]), "q", "name", "key")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
