"""Skew operators: salted plans must produce exactly the unsalted results
(salting only changes WHERE rows meet, never WHAT they aggregate to)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandemic_knowledge_spark.operators.skew import salted_agg, salted_join
from pandemic_knowledge_spark.tables import load


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_agg_equals_plain_groupby(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    plain = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    salted = salted_agg(
        ev,
        "user_id",
        partials={
            "n_part": F.count(F.lit(1)),
            "cents_part": F.sum(F.round(F.col("value") * 100).cast("long")),
        },
        finals={"n": F.sum("n_part"), "cents": F.sum("cents_part")},
        n_salts=8,
    )
    assert _rowset(salted.select("user_id", "n", "cents")) == _rowset(plain)


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(cust, "c_custkey")
    salted = salted_join(orders, cust, "c_custkey", n_salts=4)
    assert sorted(plain.columns) == sorted(salted.columns)
    cols = sorted(plain.columns)
    assert _rowset(salted.select(*cols)) == _rowset(plain.select(*cols))


def test_salted_join_left_keeps_unmatched(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey"), "event_id"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = ev.join(cust, "c_custkey", "left")
    salted = salted_join(ev, cust, "c_custkey", n_salts=4, how="left")
    cols = sorted(plain.columns)
    assert _rowset(salted.select(*cols)) == _rowset(plain.select(*cols))


def test_salted_join_rejects_right_full(spark):
    import pytest

    from pandemic_knowledge_spark.operators.skew import salted_join

    a = spark.createDataFrame([(1, "x")], "c_custkey long, v string")
    b = spark.createDataFrame([(1, "y")], "c_custkey long, w string")
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            salted_join(a, b, "c_custkey", n_salts=4, how=how)
