"""SCD2 history semantics (operators/history.py): change-compression,
null-safe attribute comparison, interval chaining, current-row flags,
point-in-time snapshots, and the one-shuffle plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pandemic_knowledge_spark.operators.history import build_scd2, snapshot_at

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("attr", StringType()),
        StructField("ts", TimestampType()),
        StructField("seq", LongType()),
    ]
)


def _t(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


def test_compression_intervals_and_current(spark):
    rows = [
        (1, "a", _t(1), 1),
        (1, "a", _t(2), 2),  # re-statement: compressed away
        (1, "b", _t(3), 3),  # change: new version
        (1, "a", _t(5), 4),  # change back: third version (not merged with v1)
        (2, "x", _t(2), 5),  # single-version key
    ]
    hist = build_scd2(
        spark.createDataFrame(rows, SCHEMA), ["k"], ["attr"], "ts", "seq"
    )
    got = {
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in hist.collect()
    }
    assert got == {
        (1, "a", _t(1), _t(3), False),
        (1, "b", _t(3), _t(5), False),
        (1, "a", _t(5), None, True),
        (2, "x", _t(2), None, True),
    }


def test_null_safe_attribute_changes(spark):
    rows = [
        (1, None, _t(1), 1),
        (1, None, _t(2), 2),  # NULL -> NULL: no change
        (1, "a", _t(3), 3),   # NULL -> 'a': change
        (1, None, _t(4), 4),  # 'a' -> NULL: change
    ]
    hist = build_scd2(
        spark.createDataFrame(rows, SCHEMA), ["k"], ["attr"], "ts", "seq"
    )
    assert hist.count() == 3
    assert hist.filter("is_current").collect()[0].attr is None


def test_same_timestamp_tiebreak(spark):
    # Two changes at one instant: seq fixes the order; both versions kept,
    # the earlier one's interval is empty [t, t).
    rows = [(1, "a", _t(1), 1), (1, "b", _t(1), 2)]
    hist = build_scd2(
        spark.createDataFrame(rows, SCHEMA), ["k"], ["attr"], "ts", "seq"
    )
    cur = hist.filter("is_current").collect()
    assert len(cur) == 1 and cur[0].attr == "b"


def test_snapshot_at(spark):
    rows = [(1, "a", _t(1), 1), (1, "b", _t(10), 2), (2, "x", _t(5), 3)]
    hist = build_scd2(
        spark.createDataFrame(rows, SCHEMA), ["k"], ["attr"], "ts", "seq"
    )
    snap = {r.k: r.attr for r in snapshot_at(hist, "2024-01-07 00:00:00").collect()}
    assert snap == {1: "a", 2: "x"}
    # Before key 2 existed:
    snap2 = {r.k: r.attr for r in snapshot_at(hist, "2024-01-02 00:00:00").collect()}
    assert snap2 == {1: "a"}


def test_single_exchange_plan(spark):
    rows = [(1, "a", _t(1), 1), (1, "b", _t(3), 2)]
    hist = build_scd2(
        spark.createDataFrame(rows, SCHEMA), ["k"], ["attr"], "ts", "seq"
    )
    plan = hist._jdf.queryExecution().executedPlan().toString()
    # lag (compression) and lead (interval close) must share one shuffle:
    # a second Exchange would mean the windows failed to reuse partitioning.
    assert plan.count("Exchange hashpartitioning") == 1, plan
