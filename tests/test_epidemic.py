"""Behavioral tests for epidemic surveillance analytics
(operators.epidemic): a synthetic outbreak must produce Rt > 1 during
exponential growth, Rt < 1 during decline, and a z-score spike on the
surge day; dense-spine zero-fill must keep lag windows honest across
reporting gaps."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pandemic_knowledge_spark.operators.epidemic import (
    W_DEN,
    W_NUM,
    daily_counts_dense,
    outbreak_zscore,
    rt_cori,
)


def _events(spark, day_counts, etype="error"):
    """day_counts: {date: n} -> one event row per case."""
    rows = []
    eid = 0
    for day, n in day_counts.items():
        for i in range(n):
            rows.append((eid, dt.datetime.combine(day, dt.time(12, 0, i % 60)), etype))
            eid += 1
    return spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")


def test_dense_spine_zero_fills_gaps(spark):
    d0 = dt.date(2024, 1, 1)
    ev = _events(spark, {d0: 2, d0 + dt.timedelta(days=3): 1})
    daily = daily_counts_dense(ev, "ts").orderBy("day").collect()
    assert [r.cases for r in daily] == [2, 0, 0, 1]
    assert [r.day for r in daily] == [d0 + dt.timedelta(days=i) for i in range(4)]


def test_rt_tracks_growth_and_decline(spark):
    d0 = dt.date(2024, 1, 1)
    # doubling for a week, then collapse to near-zero
    counts = {d0 + dt.timedelta(days=i): 2 ** i for i in range(8)}
    counts.update({d0 + dt.timedelta(days=8 + i): 1 for i in range(5)})
    ev = _events(spark, counts)
    rt = {r.day: r.rt for r in rt_cori(daily_counts_dense(ev, "ts")).collect()}
    assert rt[d0] is None  # no weighted history yet
    growth = rt[d0 + dt.timedelta(days=7)]
    decline = rt[d0 + dt.timedelta(days=10)]
    assert growth is not None and growth > 1.5
    assert decline is not None and decline < 0.5


def test_rt_exact_value_single_lag_pair(spark):
    d0 = dt.date(2024, 1, 1)
    ev = _events(spark, {d0: 13, d0 + dt.timedelta(days=1): 13})
    rt = {r.day: r for r in rt_cori(daily_counts_dense(ev, "ts")).collect()}
    r1 = rt[d0 + dt.timedelta(days=1)]
    # lambda = w_1 * 13; rt = 13 * W_DEN / (w_1 * 13) = W_DEN / w_1
    assert r1.lambda_num == W_NUM[0] * 13
    assert r1.rt == round(W_DEN / W_NUM[0], 6)


def test_zscore_flags_surge_only(spark):
    d0 = dt.date(2024, 1, 1)
    counts = {d0 + dt.timedelta(days=i): 5 + (i % 2) for i in range(20)}
    surge_day = d0 + dt.timedelta(days=20)
    counts[surge_day] = 60
    ev = _events(spark, counts)
    daily = daily_counts_dense(ev, "ts", key_col="event_type")
    out = {r.day: r for r in outbreak_zscore(daily, key_cols=("key",)).collect()}
    assert out[surge_day].spike is True and out[surge_day].z > 3
    assert all(not r.spike for d, r in out.items() if d != surge_day)


def test_zscore_null_without_baseline_and_zero_variance(spark):
    d0 = dt.date(2024, 1, 1)
    # constant series: variance 0 -> z stays NULL, never spikes
    counts = {d0 + dt.timedelta(days=i): 4 for i in range(15)}
    ev = _events(spark, counts)
    daily = daily_counts_dense(ev, "ts")
    rows = outbreak_zscore(daily).collect()
    assert all(r.z is None and r.spike is False for r in rows)


def test_min_cases_guard_suppresses_small_spikes(spark):
    d0 = dt.date(2024, 1, 1)
    # tiny series 0/1 alternating, then a "surge" to 5 — big z, small count
    counts = {d0 + dt.timedelta(days=i): i % 2 for i in range(20)}
    surge = d0 + dt.timedelta(days=20)
    counts[surge] = 5
    ev = _events(spark, counts)
    out = {r.day: r for r in outbreak_zscore(daily_counts_dense(ev, "ts")).collect()}
    assert out[surge].z is not None and out[surge].z > 3
    assert out[surge].spike is False  # < MIN_CASES


def test_spine_bounds_from_unfiltered_table(spark):
    d0 = dt.date(2024, 1, 1)
    ev = _events(spark, {d0: 3, d0 + dt.timedelta(days=5): 2}, etype="click").union(
        _events(spark, {d0 + dt.timedelta(days=2): 4}, etype="error")
    )
    daily = daily_counts_dense(ev, "ts", where=F.col("event_type") == "error")
    rows = daily.orderBy("day").collect()
    # spine spans the WHOLE table (6 days), not just the filtered signal
    assert len(rows) == 6
    assert [r.cases for r in rows] == [0, 0, 4, 0, 0, 0]


def test_streaming_incidence_rollup_matches_batch_surveillance(spark, tmp_path):
    """The live-maintained incidence rollup must drive identical R_t and
    z-score outputs to a from-scratch batch rebuild after every batch.
    Streamed counts are per-batch partial sums; the probe aggregates them
    onto the dense spine before the windows run."""
    from pandemic_knowledge_spark.streaming.jobs import incidence_stream_rollup
    from pandemic_knowledge_spark.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "event_type"
    )
    landing = str(tmp_path / "landing")
    rollup_dir = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    ev.filter(F.dayofmonth("ts") <= 12).write.mode("append").parquet(landing)
    incidence_stream_rollup(spark, landing, rollup_dir, ckpt).awaitTermination(120)
    ev.filter(F.dayofmonth("ts") > 12).write.mode("append").parquet(landing)
    incidence_stream_rollup(spark, landing, rollup_dir, ckpt).awaitTermination(120)

    streamed = (
        spark.read.parquet(rollup_dir)
        .groupBy("day", "key")
        .agg(F.sum("cases").cast("long").alias("cases"))
    )
    # densify streamed partial counts onto the full spine (streamed rollup
    # has no rows for zero days)
    batch_daily = daily_counts_dense(ev, "ts", key_col="event_type")
    spine = batch_daily.select("day", "key")
    streamed_dense = (
        spine.join(streamed, ["day", "key"], "left")
        .select("day", "key", F.coalesce("cases", F.lit(0)).cast("long").alias("cases"))
    )
    got = sorted(
        map(tuple, outbreak_zscore(streamed_dense, key_cols=("key",)).collect())
    )
    want = sorted(
        map(tuple, outbreak_zscore(batch_daily, key_cols=("key",)).collect())
    )
    assert got == want

    err_stream = streamed_dense.where(F.col("key") == "error").drop("key")
    err_batch = batch_daily.where(F.col("key") == "error").drop("key")
    assert sorted(map(tuple, rt_cori(err_stream).collect())) == sorted(
        map(tuple, rt_cori(err_batch).collect())
    )
