"""Window-function operators (SURVEY.md §2.11).

The reference has zero window functions; the dashboards' "3-weeks live"
cumulative views (/root/reference/README.md:26-27) require running totals,
and paged top-k per group (Hits hitsPerPage=8,
/root/reference/news_app/app/app/src/SearchUI.js:51) requires ranking.
All built-in: WindowExec is a single shuffle on the partition keys.

Every order-by here carries a unique tiebreak column — without it, running
totals over equal timestamps are nondeterministic across partitionings (a
real 100 TB correctness hazard, not a style point).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def running_total(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    value: Column,
    out: str = "running_total",
) -> DataFrame:
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*[F.col(c) for c in order_by])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, F.sum(value).over(w))


def topk_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def lag_delta(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    value: str,
    out: str = "delta",
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(out, F.col(value) - F.lag(value, 1).over(w))
