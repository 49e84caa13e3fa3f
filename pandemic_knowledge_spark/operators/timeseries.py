"""Time-series completion: dense spine generation, zero-fill, forward-fill.

The reference's Kibana date_histogram silently draws empty buckets for
missing hours; an engine that hands the series to a consumer (alerting,
forecasting, a chart API) must materialize them — a count of zero and a
carried-forward level are data, not rendering. This is the classic
gap-fill + LOCF (last observation carried forward) pair.

Scale shape: the spine is (distinct keys) × (hour grid) — the key side is a
grouped aggregate and the grid is one `sequence()` row exploded, so the
spine build is a broadcast-sized cross join (keys × hours, never touching
the fact table). The fact side contributes one keyed aggregate; the
forward-fill is one window over the spine (partitioned by key, ordered by
hour) — O(spine) rows total, which is grid-bounded and typically orders of
magnitude smaller than the event table it summarizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gapfill_hourly(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    aggs: dict[str, Column],
    fill_zero: list[str] = (),
    fill_forward: list[str] = (),
) -> DataFrame:
    """Hourly series per key over the table's full [min, max] hour range,
    with every (key, hour) cell present: ``fill_zero`` columns default to 0
    in empty cells; ``fill_forward`` columns carry the last observed value
    (NULL until a key's first observation).

    ``aggs`` maps output column name → aggregate expression evaluated per
    (key, hour) group."""
    hour = F.date_trunc("hour", F.col(ts_col))
    base = (
        events.groupBy(F.col(key_col).alias("key"), hour.alias("hour_start"))
        .agg(*[e.alias(n) for n, e in aggs.items()])
    )
    bounds = events.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("lo"),
        F.date_trunc("hour", F.max(ts_col)).alias("hi"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start")
    )
    keys = events.select(F.col(key_col).alias("key")).distinct()
    spine = keys.crossJoin(grid)
    joined = spine.join(base, ["key", "hour_start"], "left")
    out_cols: list[Column] = [F.col("key").alias(key_col), F.col("hour_start")]
    w = (
        Window.partitionBy("key")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for n in aggs:
        c = F.col(n)
        if n in fill_zero:
            c = F.coalesce(c, F.lit(0))
        elif n in fill_forward:
            c = F.last(c, ignorenulls=True).over(w)
        out_cols.append(c.alias(n))
    return joined.select(*out_cols)
