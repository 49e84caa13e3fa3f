"""Funnel / cohort-retention semantics (operators/funnel.py): ordering
constraints, same-instant non-chaining, out-of-order robustness, and the
monotone funnel invariant."""

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

from pandemic_knowledge_spark.operators.funnel import (
    cohort_retention,
    funnel_counts,
    funnel_stages,
)

SCHEMA = StructType(
    [
        StructField("u", LongType()),
        StructField("ts", TimestampType()),
        StructField("et", StringType()),
    ]
)

STAGES = ["signup", "view", "purchase"]


def _t(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def _stages(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r.user: (r.max_stage, r.stage_ts)
        for r in funnel_stages(df, "u", "ts", "et", STAGES).collect()
    }


def test_order_matters(spark):
    rows = [
        # completes all three in order
        (1, _t(1), "signup"), (1, _t(2), "view"), (1, _t(3), "purchase"),
        # purchase BEFORE view: stops at signup+view? no — view never after
        # signup... here view precedes signup entirely: stops at stage 1
        (2, _t(2), "view"), (2, _t(3), "signup"), (2, _t(1), "purchase"),
        # view after signup, purchase before view: stage 2
        (3, _t(1), "signup"), (3, _t(4), "view"), (3, _t(2), "purchase"),
    ]
    got = _stages(spark, rows)
    assert got[1] == (3, _t(3))
    assert got[2] == (1, _t(3))
    assert got[3] == (2, _t(4))


def test_same_instant_does_not_chain(spark):
    rows = [(1, _t(1), "signup"), (1, _t(1), "view"), (1, _t(2), "purchase")]
    got = _stages(spark, rows)
    # view at the signup instant does not advance; purchase can't fire at
    # stage 1 — the user stalls after signup.
    assert got[1][0] == 1


def test_later_qualifying_event_rescues(spark):
    rows = [
        (1, _t(1), "signup"),
        (1, _t(1), "view"),   # too early (same instant)
        (1, _t(5), "view"),   # this one chains
        (1, _t(6), "purchase"),
    ]
    got = _stages(spark, rows)
    assert got[1] == (3, _t(6))


def test_funnel_counts_monotone(spark, sf_dir):
    from pandemic_knowledge_spark.tables import load

    ev = load(spark, sf_dir, "events")
    counts = {
        r.stage: r.n_users
        for r in funnel_counts(ev, "user_id", "ts", "event_type", STAGES).collect()
    }
    vals = [counts.get(s, 0) for s in (1, 2, 3)]
    assert vals[0] >= vals[1] >= vals[2]
    assert vals[0] > 0


def test_retention_offset_zero_includes_cohort_event(spark):
    rows = [
        (1, _t(1, 1), "signup"),         # Monday week 1
        (1, _t(10), "view"),             # week 2 (offset 1)
        (2, _t(3), "signup"),            # same cohort week
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (str(r.cohort_week), r.week_n): r.n_active
        for r in cohort_retention(df, "u", "ts", F.col("et") == "signup").collect()
    }
    assert got[("2024-01-01", 0)] == 2  # both users active in cohort week
    assert got[("2024-01-01", 1)] == 1  # only user 1 returned


def test_retention_ignores_pre_cohort_activity(spark):
    rows = [
        (1, _t(1), "view"),              # activity BEFORE signup
        (1, _t(10, 1), "signup"),        # cohort = week of Jan 8
        (1, _t(11), "view"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = cohort_retention(df, "u", "ts", F.col("et") == "signup").collect()
    offsets = {r.week_n for r in out}
    assert offsets == {0}  # the pre-cohort week must not appear (no negatives)


def test_null_timestamp_events_ignored(spark):
    """Untimed events can't advance or unlock stages: a NULL-ts stage-0
    event followed by an earlier-than-nothing stage-1 event must leave the
    user at stage 0 progress (only timed events fold)."""
    import datetime as dt

    from pandemic_knowledge_spark.operators.funnel import funnel_stages

    rows = [
        (1, None, "signup"),
        (1, dt.datetime(2024, 1, 2), "view"),
        (2, dt.datetime(2024, 1, 1), "signup"),
        (2, dt.datetime(2024, 1, 2), "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r.user: r.max_stage for r in
           funnel_stages(ev, "user_id", "ts", "event_type", ["signup", "view"]).collect()}
    assert out[2] == 2          # timed pair chains normally
    assert out.get(1, 0) == 0   # null-ts signup never counted
