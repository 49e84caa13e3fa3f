"""applyInPandasWithState operator tests: cross-batch cumulative state and
gap-based sessionization, verified against batch-computed truth.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandemic_knowledge_spark import tables
from pandemic_knowledge_spark.streaming import file_stream
from pandemic_knowledge_spark.streaming.stateful import (
    running_totals_stateful,
    sessionize_stateful,
)


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return tables.load(spark, sf_dir, "events").limit(2000).cache()


def test_running_totals_accumulate_across_batches(spark, events_batch, tmp_path):
    """State survives micro-batch boundaries: with the corpus split into two
    drops, the LAST update per user equals the batch groupBy total."""
    landing = str(tmp_path / "landing")
    events_batch.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(landing)
    events_batch.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(landing)

    sdf = file_stream(spark, landing, events_batch.schema, max_files_per_trigger=1)
    totals = running_totals_stateful(sdf)
    q = (
        totals.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    updates = spark.sql("SELECT * FROM running_totals").collect()
    # last (largest n_events) update per user == cumulative truth
    last = {}
    for r in updates:
        if r.user_id not in last or r.n_events > last[r.user_id].n_events:
            last[r.user_id] = r
    want = {
        r.user_id: r
        for r in events_batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(last) == set(want)
    for uid, r in last.items():
        assert r.n_events == want[uid].n
        assert r.sum_value == pytest.approx(want[uid].s)
    # at least one user was updated twice (state crossed a batch boundary)
    assert any(
        len([u for u in updates if u.user_id == uid]) >= 2 for uid in last
    )


def test_sessionize_stateful_matches_gaps(spark, events_batch, tmp_path):
    """Gap-closed sessions match the batch gaps-and-islands computation for
    every session the stream finalized."""
    landing = str(tmp_path / "s_landing")
    events_batch.coalesce(1).write.parquet(landing)

    sdf = file_stream(spark, landing, events_batch.schema)
    sessions = sessionize_stateful(sdf, gap_seconds=300)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sessions").collect()
    assert len(got) > 0

    # batch truth: session starts + sizes via lag-gap islands
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    islands = (
        events_batch.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_s",
            (
                F.col("prev").isNull()
                # µs precision, matching the stateful operator exactly
                | (F.unix_micros("ts") - F.unix_micros("prev") > 300 * 1_000_000)
            ).cast("int"),
        )
        .withColumn("sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("start"), F.count(F.lit(1)).alias("n"))
    )
    want = {
        (r.user_id, r.start.isoformat()): r.n for r in islands.collect()
    }
    for r in got:
        key = (r.user_id, r.session_start)
        assert key in want, f"stream emitted unknown session {key}"
        assert want[key] == r.n_events, f"size mismatch for {key}"


def test_streaming_funnel_matches_batch_fold(spark, events_batch, tmp_path):
    """Time-split drops (per-key event time non-decreasing across batches):
    the final streaming funnel state must equal the batch fold exactly."""
    from pandemic_knowledge_spark.operators.funnel import funnel_stages
    from pandemic_knowledge_spark.streaming.stateful import funnel_stateful

    stages = ["signup", "view", "purchase"]
    landing = str(tmp_path / "landing")
    pivot = F.lit("2024-01-15 00:00:00").cast("timestamp")
    events_batch.filter(F.col("ts") < pivot).coalesce(1).write.parquet(landing)
    events_batch.filter(F.col("ts") >= pivot).coalesce(1).write.mode(
        "append"
    ).parquet(landing)

    sdf = file_stream(spark, landing, events_batch.schema, max_files_per_trigger=1)
    out = funnel_stateful(sdf, stages)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_updates")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    updates = spark.sql("SELECT * FROM funnel_updates").collect()
    # stage is monotone per user: the max update is the final state
    last = {}
    for r in updates:
        if r.user_id not in last or r.max_stage > last[r.user_id]:
            last[r.user_id] = r.max_stage
    batch = {
        r.user: r.max_stage
        for r in funnel_stages(
            events_batch, "user_id", "ts", "event_type", stages
        ).collect()
        if r.max_stage > 0
    }
    assert last == batch
    # at least one user advanced in BOTH batches (state crossed the boundary)
    per_user_updates = {}
    for r in updates:
        per_user_updates.setdefault(r.user_id, []).append(r.max_stage)
    assert any(len(v) > 1 for v in per_user_updates.values())
