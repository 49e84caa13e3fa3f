"""asof_join row-consistency: the matched right row must be ONE row even
when right payload columns contain nulls (round-2 advice regression)."""

from __future__ import annotations

from pandemic_knowledge_spark.operators.joins import asof_join


def test_asof_payload_comes_from_single_right_row(spark):
    # Right history for key k: at t=1 (price=10, qty=NULL), at t=2
    # (price=NULL, qty=7). A per-column carry would hand a left row at t=3
    # (price=10, qty=7) — a blend of both rows. The correct as-of match is
    # the t=2 row: (price=NULL, qty=7).
    left = spark.createDataFrame([("k", 3)], "key string, t long")
    right = spark.createDataFrame(
        [("k", 1, 10, None), ("k", 2, None, 7)],
        "key string, t long, price int, qty int",
    )
    out = asof_join(
        left, right, on=["key"], left_time="t", right_time="t",
        right_payload=["price", "qty"], strict=True,
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row.price_asof is None and row.qty_asof == 7


def test_asof_strict_excludes_same_timestamp(spark):
    left = spark.createDataFrame([("k", 2)], "key string, t long")
    right = spark.createDataFrame(
        [("k", 2, 99)], "key string, t long, price int"
    )
    strict = asof_join(
        left, right, ["key"], "t", "t", ["price"], strict=True
    ).collect()[0]
    inclusive = asof_join(
        left, right, ["key"], "t", "t", ["price"], strict=False
    ).collect()[0]
    assert strict.price_asof is None
    assert inclusive.price_asof == 99


def test_asof_no_match_yields_nulls(spark):
    left = spark.createDataFrame([("k", 1)], "key string, t long")
    right = spark.createDataFrame(
        [("other", 0, 5)], "key string, t long, price int"
    )
    out = asof_join(
        left, right, ["key"], "t", "t", ["price"], strict=True
    ).collect()
    assert len(out) == 1 and out[0].price_asof is None
