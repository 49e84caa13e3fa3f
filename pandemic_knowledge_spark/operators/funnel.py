"""Event-sequence analytics: ordered funnels and cohort retention.

The reference's dashboards chart per-day counts of a single event stream
(date_histogram panels over the news/case indices — SURVEY §2.7 A3). The
questions a product/analytics user asks next are *sequential*: "of the users
who signed up, how many then viewed, then purchased?" (funnel) and "how many
of each signup-week's users are still active n weeks later?" (retention).
Neither is a plain groupBy — the funnel's stage-k timestamp depends on the
stage-(k-1) timestamp — so engines grow bespoke operators for them
(ClickHouse ``windowFunnel``; ES ``eval``+sequence in EQL).

Spark-first shapes:

- Funnel: ONE shuffle (groupBy user, collect the (ts, type) events), sort
  each user's array, then a per-row ``F.aggregate`` fold walks the stages —
  greedy earliest-transition, which equals the min-join formulation by
  induction (first qualifying event IS the min among events after the prior
  stage). No iterative per-stage joins (k shuffles → 1), no Python: the fold
  is a static when-chain, codegen'd. Per-user arrays are bounded by per-user
  event counts — the same per-key bound every sessionizer assumes; a
  pathological key salts like any skewed agg.
- Retention: two keyed aggregates (signup week per user, active weeks per
  user-week) joined on user — broadcast when the cohort side is small,
  shuffle otherwise; week arithmetic stays in date functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
) -> DataFrame:
    """Per-user furthest funnel stage with strictly-increasing timestamps.

    Returns (user, max_stage, stage_ts) where max_stage ∈ [0, len(stages)]
    counts completed stages and stage_ts is the completion time of the last
    one reached. An event only advances the funnel if its timestamp is
    STRICTLY after the previous stage's completion (same-instant events
    do not chain)."""
    if not stages:
        raise ValueError("funnel_stages requires at least one stage")
    # Untimed events cannot participate in an ORDERED funnel: a NULL ts
    # would sort first, advance a stage with t=NULL, and then exempt every
    # later stage from the strictly-increasing check (the init state's
    # t-is-null branch would match mid-funnel). Drop them up front.
    events = events.where(F.col(ts_col).isNotNull())
    ev = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et")))
    )
    # Fold state: (stage reached so far, its completion ts).
    init = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast("timestamp").alias("t")
    )

    def step(acc: Column, e: Column) -> Column:
        advance = F.struct((acc["stage"] + 1).alias("stage"), e["ts"].alias("t"))
        # stage i advances on stages[i] if we've completed exactly i stages
        # and the event is strictly later than the stage-i entry time.
        out = acc
        for i, s in enumerate(stages):
            ok = (
                (acc["stage"] == i)
                & (e["et"] == s)
                & (acc["t"].isNull() | (e["ts"] > acc["t"]))
            )
            out = F.when(ok, advance).otherwise(out)
        return out

    agg = events.groupBy(F.col(user_col).alias("user")).agg(ev.alias("evs"))
    state = F.aggregate(F.col("evs"), init, step)
    return agg.select(
        "user",
        state["stage"].alias("max_stage"),
        state["t"].alias("stage_ts"),
    )


def funnel_counts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
) -> DataFrame:
    """Classic funnel report: for each stage k (1-based), how many users
    reached at least stage k. Monotone non-increasing by construction."""
    per_user = funnel_stages(events, user_col, ts_col, type_col, stages)
    stage_idx = F.explode(F.sequence(F.lit(1), F.lit(len(stages)))).alias("stage")
    return (
        per_user.select("user", "max_stage", stage_idx)
        .filter(F.col("max_stage") >= F.col("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    cohort_filter: Column,
    max_weeks: int = 8,
) -> DataFrame:
    """Weekly cohort retention: users bucketed by the week of their first
    ``cohort_filter`` event; for each later week offset, how many were
    active (any event). Offset 0 is the cohort week itself.

    Two keyed aggregates + one join on user — the join side carrying one
    row per user (the cohort table) broadcasts when small."""
    # date (not timestamp): a week bucket is a calendar concept, and the
    # DATE type is what DuckDB/most engines return for date_trunc('week').
    wk = lambda c: F.date_trunc("week", c).cast("date")
    cohorts = (
        events.filter(cohort_filter)
        .groupBy(F.col(user_col).alias("user"))
        .agg(wk(F.min(ts_col)).alias("cohort_week"))
    )
    active = events.select(
        F.col(user_col).alias("user"), wk(F.col(ts_col)).alias("active_week")
    ).distinct()
    joined = active.join(cohorts, "user")
    # floor, not cast-truncate: an active week BEFORE the cohort week gives
    # a negative day diff, and truncation toward zero would alias -6..-1
    # days onto week 0 instead of week -1 (then wrongly pass the >= 0 gate).
    week_n = F.floor(
        F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
    ).cast("long")
    return (
        joined.select("user", "cohort_week", week_n.alias("week_n"))
        .filter((F.col("week_n") >= 0) & (F.col("week_n") <= max_weeks))
        .groupBy("cohort_week", "week_n")
        .agg(F.count_distinct("user").alias("n_active"))
    )
