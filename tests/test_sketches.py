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


def test_sketch_stream_rollup_equals_batch(spark, tmp_path):
    """Two landed event batches stream through sketch_stream_rollup; range
    estimates over the streamed rollup equal the batch rollup AND the
    direct fact-scan estimate, and re-merging a duplicated sketch row
    leaves the estimate unchanged (register-max idempotence)."""
    from pandemic_knowledge_spark.streaming.jobs import sketch_stream_rollup
    from pandemic_knowledge_spark.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events").select("user_id", "ts")
    landing = str(tmp_path / "landing")
    rollup_dir = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    lo, hi = "2024-01-01", "2024-01-04"

    ev.filter(F.dayofmonth("ts") % 2 == 0).write.mode("append").parquet(landing)
    sketch_stream_rollup(spark, landing, rollup_dir, ckpt).awaitTermination(120)
    ev.filter(F.dayofmonth("ts") % 2 == 1).write.mode("append").parquet(landing)
    sketch_stream_rollup(spark, landing, rollup_dir, ckpt).awaitTermination(120)

    streamed = spark.read.parquet(rollup_dir)
    est_stream = distinct_over_range(streamed, lo, hi).collect()[0].n_distinct_est
    est_batch = distinct_over_range(
        daily_sketch_rollup(ev, "user_id", "ts"), lo, hi
    ).collect()[0].n_distinct_est
    est_direct = (
        whole_range_estimate(ev, "user_id", "ts", lo, hi).collect()[0].n_distinct_est
    )
    assert est_stream == est_batch == est_direct

    # duplicate-append idempotence: merging one day's sketch twice is a no-op
    dup = streamed.filter(F.col("day") == lo).limit(1)
    assert dup.count() == 1  # the replayed row really is inside the range
    est_dup = distinct_over_range(streamed.union(dup), lo, hi).collect()[0].n_distinct_est
    assert est_dup == est_stream


# --- decimal-DDSketch quantile rollup ---

from pandemic_knowledge_spark.operators.sketches import (  # noqa: E402
    Q_PROBES,
    bucket_estimate,
    daily_quantile_rollup,
    quantile_bucket,
    quantiles_over,
)


def test_quantile_estimates_within_relative_bound(spark, sf_dir):
    """Every probe estimate must land within the sketch's guaranteed
    relative error (0.5% + one cent of quantization) of an exact
    rank-quantile over the same rows."""
    ev = load(spark, sf_dir, "events")
    rollup = daily_quantile_rollup(ev, "value", "ts")
    lo, hi = "2024-01-05", "2024-01-25"
    got = {r.q: r.est for r in quantiles_over(rollup, lo, hi).collect()}
    day = F.date_trunc("day", F.col("ts")).cast("date")
    vals = sorted(
        r.value for r in ev.filter(day.between(lo, hi)).select("value").collect()
    )
    n = len(vals)
    for q in Q_PROBES:
        import math
        exact = vals[max(0, math.ceil(q * n) - 1)]
        assert abs(got[q] - exact) <= 0.005 * exact + 0.02, (q, got[q], exact)


def test_quantile_rollup_merge_equals_direct(spark, sf_dir):
    """Add-merging per-day bucket counts must equal bucketing the whole
    range in one pass (merge-exactness by construction)."""
    ev = load(spark, sf_dir, "events")
    lo, hi = "2024-01-03", "2024-01-27"
    rollup = daily_quantile_rollup(ev, "value", "ts")
    via_rollup = {(r.q, r.n): r.est for r in quantiles_over(rollup, lo, hi).collect()}
    day = F.date_trunc("day", F.col("ts")).cast("date")
    one_day_rollup = (
        ev.filter(day.between(lo, hi))
        .groupBy(F.lit("2024-01-03").cast("date").alias("day"),
                 quantile_bucket(F.col("value")).alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    direct = {(r.q, r.n): r.est for r in quantiles_over(one_day_rollup, lo, hi).collect()}
    assert via_rollup == direct


def test_small_cents_buckets_are_exact_singletons(spark):
    """Values with cents < 1000 sit in exact singleton buckets: the
    estimate IS the value."""
    df = spark.createDataFrame(
        [(v,) for v in (0.01, 0.5, 1.23, 9.99, 0.0, -3.0)], "value double"
    )
    out = df.select(
        "value", bucket_estimate(quantile_bucket(F.col("value"))).alias("est")
    ).collect()
    for r in out:
        assert r.est == max(r.value, 0.0), r


def test_quantile_stream_rollup_equals_batch_and_replay_safe(spark, tmp_path):
    """Streamed quantile rollup probes equal the batch rollup at every
    point; a replayed micro-batch overwrites its own partition (dynamic
    partition overwrite), leaving probes unchanged — exactly-once by write
    protocol where the HLL rollup relies on register-max algebra."""
    from pandemic_knowledge_spark.streaming.jobs import (
        _write_quantile_batch,
        quantile_stream_rollup,
    )

    ev = load(spark, "/root/testdata/sf0.001", "events").select("value", "ts")
    landing = str(tmp_path / "landing")
    rollup_dir = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    lo, hi = "2024-01-01", "2024-01-30"

    ev.filter(F.dayofmonth("ts") <= 10).write.mode("append").parquet(landing)
    quantile_stream_rollup(spark, landing, rollup_dir, ckpt).awaitTermination(120)
    ev.filter(F.dayofmonth("ts") > 10).write.mode("append").parquet(landing)
    quantile_stream_rollup(spark, landing, rollup_dir, ckpt).awaitTermination(120)

    streamed = spark.read.parquet(rollup_dir).select("day", "b", "cnt")
    got = {r.q: (r.n, r.est) for r in quantiles_over(streamed, lo, hi).collect()}
    batch = daily_quantile_rollup(ev, "value", "ts")
    want = {r.q: (r.n, r.est) for r in quantiles_over(batch, lo, hi).collect()}
    assert got == want

    # replay batch 0: same rollup rows, same batch_id -> overwrite, not append
    replay = (
        daily_quantile_rollup(
            ev.filter(F.dayofmonth("ts") <= 10), "value", "ts"
        )
    )
    _write_quantile_batch(replay, 0, rollup_dir)
    after = spark.read.parquet(rollup_dir).select("day", "b", "cnt")
    got2 = {r.q: (r.n, r.est) for r in quantiles_over(after, lo, hi).collect()}
    assert got2 == want


def test_tolerance_witness_column_states_exact_bound():
    """The witness column name must state the EXACT tolerance — never a
    rounded one (round(2.5%) -> 2% would attest a tighter bound than the
    one checked)."""
    from pandemic_knowledge_spark.operators.sketches import _tol_col

    assert _tol_col(0.05) == "within_5pct"
    assert _tol_col(0.10) == "within_10pct"
    assert _tol_col(0.025) == "within_2_5pct"
    assert _tol_col(0.035) == "within_3_5pct"
