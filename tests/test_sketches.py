"""HLL sketch rollups (operators/sketches.py): merge-exactness (rollup ≡
direct), estimate accuracy vs exact distinct, and incremental-append
equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandemic_knowledge_spark.operators.sketches import (
    daily_sketch_rollup,
    distinct_over_range,
    whole_range_estimate,
)
from pandemic_knowledge_spark.tables import load


def test_rollup_merge_equals_direct_sketch(spark, sf_dir):
    """estimate(union of daily sketches) must be BIT-IDENTICAL to
    estimate(one sketch over the range) — the property that makes the
    rollup table a valid substitute for rescanning facts."""
    ev = load(spark, sf_dir, "events")
    rollup = daily_sketch_rollup(ev, "user_id", "ts")
    lo, hi = "2024-01-05", "2024-01-20"
    via_rollup = distinct_over_range(rollup, lo, hi).first().n_distinct_est
    direct = whole_range_estimate(ev, "user_id", "ts", lo, hi).first().n_distinct_est
    assert via_rollup == direct


def test_estimate_close_to_exact(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    rollup = daily_sketch_rollup(ev, "user_id", "ts")
    lo, hi = "2024-01-01", "2024-12-31"
    est = distinct_over_range(rollup, lo, hi).first().n_distinct_est
    day = F.date_trunc("day", F.col("ts")).cast("date")
    exact = (
        ev.filter(day.between(lo, hi))
        .select("user_id").distinct().count()
    )
    assert abs(est - exact) / max(exact, 1) < 0.05


def test_incremental_append_equivalence(spark, sf_dir):
    """A rollup built day-by-day (union of two partial rollups) answers
    identically to one built in a single pass — no read-modify of history
    when a new day lands."""
    ev = load(spark, sf_dir, "events")
    pivot = F.lit("2024-01-15 00:00:00").cast("timestamp")
    r_old = daily_sketch_rollup(ev.filter(F.col("ts") < pivot), "user_id", "ts")
    r_new = daily_sketch_rollup(ev.filter(F.col("ts") >= pivot), "user_id", "ts")
    combined = r_old.unionByName(r_new)
    one_pass = daily_sketch_rollup(ev, "user_id", "ts")
    lo, hi = "2024-01-10", "2024-01-20"
    a = distinct_over_range(combined, lo, hi).first().n_distinct_est
    b = distinct_over_range(one_pass, lo, hi).first().n_distinct_est
    assert a == b
