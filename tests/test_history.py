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
    # Two changes at one instant: seq fixes the order; only the LAST
    # survives — the earlier one's [t, t) interval is zero-length
    # (invisible to snapshots, unsafe to re-merge) and is dropped.
    rows = [(1, "a", _t(1), 1), (1, "b", _t(1), 2)]
    hist = build_scd2(
        spark.createDataFrame(rows, SCHEMA), ["k"], ["attr"], "ts", "seq"
    )
    assert hist.count() == 1
    cur = hist.filter("is_current").collect()
    assert len(cur) == 1 and cur[0].attr == "b"


def test_exact_ts_correction_remerge_deterministic(spark):
    """A batch correction at an existing change's exact timestamp REPLACES
    the superseded version; a further merge of the result stays
    deterministic (the degenerate-[t,t)-row re-merge hazard)."""
    from pandemic_knowledge_spark.operators.history import scd2_merge

    hist = build_scd2(
        spark.createDataFrame([(1, "a", _t(1), 1)], SCHEMA), ["k"], ["attr"], "ts", "seq"
    )
    corrected = scd2_merge(
        hist,
        spark.createDataFrame([(1, "b", _t(1), 2)], SCHEMA).drop("seq"),
        ["k"], ["attr"], "ts",
    )
    rows = corrected.collect()
    assert len(rows) == 1 and rows[0].attr == "b" and rows[0].is_current
    # re-merge an unrelated later change: the correction must survive
    again = scd2_merge(
        corrected,
        spark.createDataFrame([(1, "c", _t(5), 3)], SCHEMA).drop("seq"),
        ["k"], ["attr"], "ts",
    )
    snap = {r.k: r.attr for r in
            __import__("pandemic_knowledge_spark.operators.history", fromlist=["snapshot_at"]).snapshot_at(again, "2024-01-03 00:00:00").collect()}
    assert snap == {1: "b"}


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


def _build_events(spark, sf_dir):
    from pandemic_knowledge_spark.tables import load

    return load(spark, sf_dir, "events")


def test_incremental_merge_equals_full_rebuild(spark, sf_dir):
    """Split the change log at a pivot, build on the old half, merge the new
    half: must equal the full build row-for-row (real event data)."""
    from pandemic_knowledge_spark.operators.history import build_scd2, scd2_merge

    ev = _build_events(spark, sf_dir)
    pivot = "2024-02-01 00:00:00"
    old = ev.filter(F.col("ts") < pivot)
    new = ev.filter(F.col("ts") >= pivot)
    full = build_scd2(ev, ["user_id"], ["event_type"], "ts", "event_id")
    merged = scd2_merge(
        build_scd2(old, ["user_id"], ["event_type"], "ts", "event_id"),
        new,
        ["user_id"],
        ["event_type"],
        "ts",
    )
    key = lambda r: (r.user_id, r.event_type, r.valid_from, r.valid_to, r.is_current)
    assert {key(r) for r in merged.collect()} == {key(r) for r in full.collect()}


def test_merge_late_row_splices_history(spark):
    """An out-of-order batch row lands mid-history and re-chains intervals."""
    from pandemic_knowledge_spark.operators.history import build_scd2, scd2_merge

    rows = [(1, "a", _t(1), 1), (1, "c", _t(10), 2)]
    hist = build_scd2(
        spark.createDataFrame(rows, SCHEMA), ["k"], ["attr"], "ts", "seq"
    )
    late = spark.createDataFrame([(1, "b", _t(5), 3)], SCHEMA).select("k", "attr", "ts")
    merged = scd2_merge(hist, late, ["k"], ["attr"], "ts")
    got = {
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current) for r in merged.collect()
    }
    assert got == {
        (1, "a", _t(1), _t(5), False),
        (1, "b", _t(5), _t(10), False),
        (1, "c", _t(10), None, True),
    }


def test_merge_leaves_untouched_keys_alone(spark):
    from pandemic_knowledge_spark.operators.history import build_scd2, scd2_merge

    rows = [(1, "a", _t(1), 1), (2, "x", _t(1), 2), (2, "y", _t(3), 3)]
    hist = build_scd2(
        spark.createDataFrame(rows, SCHEMA), ["k"], ["attr"], "ts", "seq"
    )
    batch = spark.createDataFrame([(1, "b", _t(9), 4)], SCHEMA).select("k", "attr", "ts")
    merged = scd2_merge(hist, batch, ["k"], ["attr"], "ts")
    k2 = {
        (r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in merged.filter("k = 2").collect()
    }
    assert k2 == {("x", _t(1), _t(3), False), ("y", _t(3), None, True)}
    k1 = {(r.attr, r.is_current) for r in merged.filter("k = 1").collect()}
    assert k1 == {("a", False), ("b", True)}


def test_merge_equal_ts_batch_wins(spark):
    """A batch row at an existing change's exact ts is a correction: it
    becomes the surviving version at that instant."""
    from pandemic_knowledge_spark.operators.history import build_scd2, scd2_merge

    hist = build_scd2(
        spark.createDataFrame([(1, "a", _t(2), 1)], SCHEMA), ["k"], ["attr"], "ts", "seq"
    )
    fix = spark.createDataFrame([(1, "A", _t(2), 2)], SCHEMA).select("k", "attr", "ts")
    merged = scd2_merge(hist, fix, ["k"], ["attr"], "ts")
    cur = merged.filter("is_current").collect()
    assert len(cur) == 1 and cur[0].attr == "A"


def test_merge_equals_rebuild_random_logs(spark):
    """Property: for random change logs and ANY batch split, incremental
    merge equals the full rebuild — provided cross-split duplicate
    timestamps per key don't contradict (we generate unique ts per key).
    One Spark comparison over a batch of generated cases."""
    import random

    rng = random.Random(42)
    from pandemic_knowledge_spark.operators.history import build_scd2, scd2_merge

    rows = []
    for case in range(20):
        base = case * 1000  # namespace keys per case
        for k in range(rng.randint(1, 4)):
            n = rng.randint(1, 10)
            ts_points = rng.sample(range(1, 28), n)
            for seq, day in enumerate(sorted(ts_points)):
                attr = rng.choice(["a", "b", "c", None])
                rows.append((base + k, attr, _t(day), seq))
    df = spark.createDataFrame(rows, SCHEMA)
    # random pivot per run of the test data's range
    pivot = _t(rng.randint(5, 25))
    full = build_scd2(df, ["k"], ["attr"], "ts", "seq")
    merged = scd2_merge(
        build_scd2(df.filter(F.col("ts") < pivot), ["k"], ["attr"], "ts", "seq"),
        df.filter(F.col("ts") >= pivot),
        ["k"],
        ["attr"],
        "ts",
    )
    key = lambda r: (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
    assert {key(r) for r in merged.collect()} == {key(r) for r in full.collect()}
