"""asof_join row-consistency: the matched right row must be ONE row even
when right payload columns contain nulls (round-2 advice regression)."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_asof_tolerance_discards_stale_matches(spark):
    """pandas merge_asof tolerance semantics: a match older than the
    tolerance comes back NULL, a fresh one survives — per left row, on
    the same run."""
    left = spark.createDataFrame(
        [("k", 10), ("k", 100)], "key string, t long"
    )
    right = spark.createDataFrame(
        [("k", 8, 5)], "key string, t long, price int"
    )
    out = {
        r.t: r.price_asof
        for r in asof_join(
            left, right, ["key"], "t", "t", ["price"],
            strict=True, tolerance=10.0,
        ).collect()
    }
    assert out[10] == 5        # gap 2 <= 10: fresh
    assert out[100] is None    # gap 92 > 10: stale, nulled out
    # tolerance=None keeps the unbounded behavior
    unbounded = {
        r.t: r.price_asof
        for r in asof_join(
            left, right, ["key"], "t", "t", ["price"], strict=True
        ).collect()
    }
    assert unbounded == {10: 5, 100: 5}


def test_banded_range_join_matches_theta_join(spark):
    """Banded equi-join + recheck must reproduce the naive theta-join exactly,
    including boundary semantics (lo inclusive, hi exclusive) and intervals
    spanning multiple bands."""
    from pandemic_knowledge_spark.operators.joins import banded_range_join, range_join

    pts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 24.9, 25.0, 49.9, 50.0, 99.9, 100.0, 250.0, 499.9, 500.0])],
        "pid long, v double",
    )
    ivs = spark.createDataFrame(
        [("a", 0.0, 50.0), ("b", 25.0, 100.0), ("c", 75.0, 500.0), ("d", 480.0, 520.0)],
        "iv string, lo double, hi double",
    )
    got = {
        (r.pid, r.iv)
        for r in banded_range_join(pts, ivs, "v", "lo", "hi", band_width=50.0).collect()
    }
    want = {
        (r.pid, r.iv)
        for r in range_join(
            pts, ivs, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))
        ).collect()
    }
    assert got == want and len(want) > 0


def test_asof_tolerance_on_date_axis_uses_day_units(spark):
    """DateType time columns can't cast to double — tolerance must work in
    DAY units on date axes (review finding: analysis error before)."""
    import datetime as dt

    left = spark.createDataFrame(
        [("k", dt.date(2024, 1, 10)), ("k", dt.date(2024, 3, 1))],
        "key string, d date",
    )
    right = spark.createDataFrame(
        [("k", dt.date(2024, 1, 8), 5)], "key string, d date, price int"
    )
    out = {
        r.d: r.price_asof
        for r in asof_join(
            left, right, ["key"], "d", "d", ["price"],
            strict=True, tolerance=10.0,
        ).collect()
    }
    assert out[dt.date(2024, 1, 10)] == 5     # 2 days <= 10
    assert out[dt.date(2024, 3, 1)] is None   # 53 days > 10
