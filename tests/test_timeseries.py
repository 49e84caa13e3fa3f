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


def test_correlation_matches_numpy_dense(spark):
    """r from sparse sums must equal numpy's Pearson on the zero-filled
    dense vectors."""
    import numpy as np

    from pandemic_knowledge_spark.operators.timeseries import correlation_pairs_topk

    rows = []
    series = {
        1: {0: 3, 1: 1, 3: 2},          # sparse day -> count
        2: {0: 6, 1: 2, 3: 4},          # exactly 2x user 1 -> r = 1
        3: {0: 1, 2: 5, 3: 1},
    }
    for u, days in series.items():
        for d, cnt in days.items():
            for i in range(cnt):
                rows.append((str(u), dt.datetime(2024, 1, 1 + d, 8, i), 0.0))
    df = spark.createDataFrame(rows, SCHEMA).withColumnRenamed("k", "u")
    got = {
        (int(r.key_a), int(r.key_b)): r.r
        for r in correlation_pairs_topk(df, "u", "ts", k=10).collect()
    }
    # numpy reference over the dense 4-day grid
    dense = {u: np.array([d.get(i, 0) for i in range(4)], dtype=float)
             for u, d in series.items()}
    for (ua, ub), r in got.items():
        expect = np.corrcoef(dense[ua], dense[ub])[0, 1]
        assert abs(r - expect) < 1e-12, (ua, ub, r, expect)
    assert got[(1, 2)] == 1.0


def test_correlation_excludes_constant_series(spark):
    from pandemic_knowledge_spark.operators.timeseries import correlation_pairs_topk

    rows = [
        ("a", dt.datetime(2024, 1, 1), 0.0),
        ("a", dt.datetime(2024, 1, 2), 0.0),   # constant 1/day over grid
        ("b", dt.datetime(2024, 1, 1), 0.0),
        ("b", dt.datetime(2024, 1, 2), 0.0),
        ("b", dt.datetime(2024, 1, 2, 1), 0.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA).withColumnRenamed("k", "u")
    out = correlation_pairs_topk(df, "u", "ts").collect()
    assert out == []  # "a" is constant -> zero variance -> no pair


def test_rolling_active_window_semantics(spark):
    from pandemic_knowledge_spark.operators.timeseries import rolling_active_keys

    rows = [
        ("a", dt.datetime(2024, 1, 1), 0.0),
        ("b", dt.datetime(2024, 1, 3), 0.0),
        ("a", dt.datetime(2024, 1, 10), 0.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA).withColumnRenamed("k", "u")
    got = {
        r.report_day.isoformat(): r.active_7d
        for r in rolling_active_keys(df, "u", "ts", window_days=7).collect()
    }
    assert got["2024-01-01"] == 1          # a
    assert got["2024-01-03"] == 2          # a (jan1 still in window) + b
    assert got["2024-01-07"] == 2          # last day a's jan1 counts
    assert got["2024-01-08"] == 1          # a fell out, b (jan3) remains
    assert got["2024-01-10"] == 1          # only a's second visit
    # report days bounded to the observed [min, max] range
    assert min(got) == "2024-01-01" and max(got) == "2024-01-10"


def test_rolling_active_dedups_within_window(spark):
    from pandemic_knowledge_spark.operators.timeseries import rolling_active_keys

    rows = [
        ("a", dt.datetime(2024, 1, 1), 0.0),
        ("a", dt.datetime(2024, 1, 2), 0.0),  # same user twice in window
    ]
    df = spark.createDataFrame(rows, SCHEMA).withColumnRenamed("k", "u")
    got = {
        r.report_day.isoformat(): r.active_7d
        for r in rolling_active_keys(df, "u", "ts").collect()
    }
    assert got["2024-01-02"] == 1


def test_ses_forecast_matches_python_reference(spark):
    """Fixed-point SES fold equals the integer reference recursion, series
    order is respected, and a constant series forecasts itself."""
    import datetime as dt
    import random

    from pandemic_knowledge_spark.operators.timeseries import (
        SES_ALPHA_DEN,
        SES_ALPHA_NUM,
        SES_SCALE,
        ses_forecast,
    )

    def ref(xs):
        s = xs[0] * SES_SCALE
        for x in xs[1:]:
            s = (x * SES_SCALE * SES_ALPHA_NUM + s * (SES_ALPHA_DEN - SES_ALPHA_NUM)) // SES_ALPHA_DEN
        return s

    rng = random.Random(4)
    rows, expect = [], {}
    for k in range(6):
        xs = [rng.randint(0, 500) for _ in range(rng.randint(1, 25))]
        expect[f"k{k}"] = ref(xs)
        rows += [(f"k{k}", dt.date(2024, 1, 1 + i), v) for i, v in enumerate(xs)]
    daily = spark.createDataFrame(rows, "key string, day date, cases long")
    out = {r.key: r for r in ses_forecast(daily, ("key",)).collect()}
    assert {k: r.level_micro for k, r in out.items()} == expect
    const = spark.createDataFrame(
        [("c", dt.date(2024, 1, 1 + i), 7) for i in range(10)],
        "key string, day date, cases long",
    )
    r = ses_forecast(const, ("key",)).collect()[0]
    assert r.forecast == 7.0


def test_corr_pruned_matches_exact_on_strong_pairs(spark):
    """The sign-sketch tier must reproduce the exact top-k when the top-k
    is made of strongly-correlated pairs (its design contract): 6 groups of
    3 keys sharing a scaled pattern give 18 r=1 pairs — parallel centered
    vectors agree on EVERY projection sign, so candidate recall is certain,
    and the re-check shares the exact tier's formula bit-for-bit."""
    import random

    from pandemic_knowledge_spark.operators.timeseries import (
        correlation_pairs_topk,
        correlation_pairs_topk_pruned,
    )

    rng = random.Random(9)
    rows = []
    for g in range(6):
        pattern = [rng.randint(1, 4) for _ in range(8)]
        for m in range(3):  # 3 keys per group, scaled 1x/2x/3x
            u = f"g{g}m{m}"
            for d, base in enumerate(pattern):
                for i in range((m + 1) * base):
                    rows.append((u, dt.datetime(2024, 1, 1 + d, 6, i % 60), 0.0))
    for nkey in range(5):  # uncorrelated noise keys
        for d in rng.sample(range(8), 4):
            rows.append((f"n{nkey}", dt.datetime(2024, 1, 1 + d, 7), 0.0))
    df = spark.createDataFrame(rows, SCHEMA).withColumnRenamed("k", "u")
    exact = [tuple(r) for r in correlation_pairs_topk(df, "u", "ts", k=10).collect()]
    pruned = [
        tuple(r)
        for r in correlation_pairs_topk_pruned(df, "u", "ts", k=10).collect()
    ]
    assert pruned == exact
    assert all(abs(r - 1.0) < 1e-12 for _, _, r in exact)


def test_corr_pruned_degenerate_bucket_chain(spark):
    """Mass-duplicated series (every clone lands in ONE band bucket at any
    band width) must not go quadratic: with a bucket_cap below the clone
    count the tier chain-links the bucket instead of emitting C(c,2)
    pairs, and the top-k still comes back all-r=1 clone pairs (chain pairs
    of identical series ARE r=1 — interchangeable with the dropped ones).
    """
    from pandemic_knowledge_spark.operators.timeseries import (
        correlation_pairs_topk_pruned,
    )

    rows = []
    pattern = [3, 1, 4, 1, 5, 2, 6, 2]
    for m in range(30):  # 30 identical clones
        for d, cnt in enumerate(pattern):
            for i in range(cnt):
                rows.append((f"c{m:02d}", dt.datetime(2024, 1, 1 + d, 8, i), 0.0))
    df = spark.createDataFrame(rows, SCHEMA).withColumnRenamed("k", "u")
    out = correlation_pairs_topk_pruned(
        df, "u", "ts", k=10, bucket_cap=4
    ).collect()
    assert len(out) == 10
    assert all(abs(r.r - 1.0) < 1e-12 for r in out)
    # and the full-pair form below the cap agrees on the same data
    out_full = correlation_pairs_topk_pruned(
        df, "u", "ts", k=10, bucket_cap=1000
    ).collect()
    assert all(abs(r.r - 1.0) < 1e-12 for r in out_full)


def test_corr_auto_dispatch_scale_gate(spark, sf_dir):
    """Auto dispatcher: below the byte threshold → exact day-blocked pair
    join (no sign sketches, no checkpoints — pure parquet lineage); above
    → pruned (r14 tier marker: the signature checkpoint truncates the
    plan at a Scan ExistingRDD node, which the exact tier never has —
    the old shiftleft/md5 markers are either folded to literals or
    hidden behind that same checkpoint now)."""
    from pandemic_knowledge_spark.operators.timeseries import (
        CORR_THRESHOLD_CONF,
        correlation_pairs_topk_auto,
    )
    from pandemic_knowledge_spark.tables import load

    ev = load(spark, sf_dir, "events")
    spark.conf.set(CORR_THRESHOLD_CONF, "1")  # force scale path
    try:
        plan = (
            correlation_pairs_topk_auto(ev, "user_id", "ts")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "ExistingRDD" in plan
    finally:
        spark.conf.unset(CORR_THRESHOLD_CONF)
    plan_small = (
        correlation_pairs_topk_auto(ev, "user_id", "ts")  # default 4 MiB gate
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ExistingRDD" not in plan_small
