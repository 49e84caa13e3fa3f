"""Gap-fill + forward-fill semantics (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pandemic_knowledge_spark.operators.timeseries import gapfill_hourly

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("ts", TimestampType()),
        StructField("v", DoubleType()),
    ]
)


def _t(hour: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, hour)


def _fill(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = gapfill_hourly(
        df,
        key_col="k",
        ts_col="ts",
        aggs={"n": F.count(F.lit(1)), "lvl": F.sum("v")},
        fill_zero=["n"],
        fill_forward=["lvl"],
    )
    return {(r.k, r.hour_start.hour): (r.n, r.lvl) for r in out.collect()}


def test_grid_complete_zero_fill_and_locf(spark):
    rows = [
        ("a", _t(0), 1.0),
        ("a", _t(3), 5.0),
        ("b", _t(2), 7.0),
    ]
    got = _fill(spark, rows)
    # full grid: 2 keys x hours 0..3
    assert len(got) == 8
    assert got[("a", 0)] == (1, 1.0)
    assert got[("a", 1)] == (0, 1.0)   # gap: count 0, level carried
    assert got[("a", 2)] == (0, 1.0)
    assert got[("a", 3)] == (1, 5.0)
    # key b: NULL level before its first observation, carried after
    assert got[("b", 0)] == (0, None)
    assert got[("b", 1)] == (0, None)
    assert got[("b", 2)] == (1, 7.0)
    assert got[("b", 3)] == (0, 7.0)


def test_keys_do_not_leak(spark):
    rows = [("a", _t(0), 2.0), ("b", _t(1), 9.0)]
    got = _fill(spark, rows)
    assert got[("b", 0)] == (0, None)      # a's level must not leak into b
    assert got[("a", 1)] == (0, 2.0)


def test_multiple_events_same_hour_aggregate(spark):
    rows = [("a", _t(1), 1.0), ("a", dt.datetime(2024, 1, 1, 1, 30), 2.0)]
    got = _fill(spark, rows)
    assert got[("a", 1)] == (2, 3.0)
