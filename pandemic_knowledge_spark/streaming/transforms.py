"""Streaming transforms: watermarked windows + dedup (SURVEY.md §2.10 W1/W2).

Every function here is DataFrame → DataFrame and works identically on a
batch frame (for oracle parity tests) and a streaming frame (watermark is a
no-op in batch). That one-definition-two-modes property is the core Spark
win over the reference's separate batch scripts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _window_agg(df: DataFrame, win: Column, extra_keys: list[str], aggs: list[Column]) -> DataFrame:
    agged = df.groupBy(win.alias("win"), *[F.col(k) for k in extra_keys]).agg(*aggs)
    # The aggregate columns are everything after the grouping keys — taken
    # POSITIONALLY from the aggregated frame's own schema. (Parsing the JVM
    # expression string on ' AS ' broke for unaliased aggs containing a
    # cast — 'sum(CAST(x AS DOUBLE))' — and Column._jc does not exist under
    # Spark Connect.)
    agg_cols = agged.columns[1 + len(extra_keys):]
    return agged.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *extra_keys,
        *[F.col(f"`{c}`") for c in agg_cols],
    )


def default_aggs() -> list[Column]:
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    ]


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    watermark: str | None = "2 hours",
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """W1 — the 24h-cadence refresh generalized to any tumbling window.
    Watermark bounds state for late data (W4 policy: rows later than the
    watermark are dropped, mirroring the reference's skip-and-log
    /root/reference/flow/scripts/insert_owid.py:196-198)."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return _window_agg(df, F.window(ts_col, width), keys or [], aggs or default_aggs())


def sliding_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = "2 hours",
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Sliding variant — the dashboards' "last 3 weeks, refreshed daily" view
    (/root/reference/README.md:26-27) is exactly a width=3w slide=1d window."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return _window_agg(df, F.window(ts_col, width, slide), keys or [], aggs or default_aggs())


def session_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "5 minutes",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Session windows per key — beyond the reference (it has none), the
    idiomatic superset for event feeds."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    keys = keys if keys is not None else ["user_id"]
    return _window_agg(df, F.session_window(ts_col, gap), keys, aggs or default_aggs())


def dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 day",
) -> DataFrame:
    """W2 — drop re-crawled duplicates.

    The reference crawls a 24h lookback daily with uuid4 doc ids, so every
    overlap double-indexes (/root/reference/flow/scripts/crawl_tweets.py:52,
    60) — a documented bug this engine fixes. Streaming: bounded-state dedup
    via dropDuplicatesWithinWatermark; batch: plain dropDuplicates on the
    natural key (e.g. source.url).
    """
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream⋈stream event-time interval join.

    Matches a right-side event to a left-side event with the same key when
    the right event happened within ``lookback`` BEFORE the left event
    (attribution shape: purchase joined to the click that preceded it).
    Both sides carry watermarks and the join condition bounds event time in
    both directions, so Spark can prune join state — without the time bound
    the state grows without limit at 100 TB/day. Column names must be
    disjoint across the two inputs (rename before calling).

    In batch mode the same condition runs as a plain inner join — one
    definition, two modes, like the rest of this module.
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    cond = (
        (left[left_key] == right[right_key])
        & (right[right_ts] >= left[left_ts] - F.expr(f"INTERVAL {lookback}"))
        & (right[right_ts] <= left[left_ts])
    )
    return left.join(right, cond, "inner")


def quarantine_split(df: DataFrame, valid_pred: Column) -> tuple[DataFrame, DataFrame]:
    """W4 — late/dirty-data policy: route invalid rows to a quarantine frame
    instead of silently dropping (reference logs-and-skips,
    /root/reference/flow/scripts/insert_owid.py:196-198). Returns
    (valid, quarantined)."""
    return df.filter(valid_pred), df.filter(~F.coalesce(valid_pred, F.lit(False)))
