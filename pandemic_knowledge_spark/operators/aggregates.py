"""Aggregation operators (SURVEY.md §2.6 A1-A6).

The reference delegates every aggregate to Elasticsearch (dashboards
/root/reference/README.md:22-28; `long` metrics typed for doc-values aggs
/root/reference/flow/scripts/mapping.py:17-21). Spark-first: groupBy + agg
compiles to partial+final HashAggregateExec — the same shard-partial →
coordinator-final shape ES runs, but codegen'd and spillable.

Cross-engine float determinism: money sums go through ``cents_sum`` —
round(x*100) → long — so Spark and the DuckDB oracle produce bit-identical
totals regardless of partial-aggregation order (double summation is
order-sensitive; int64 summation is not). This matters MORE at scale: more
partitions → more reorderings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cents(col: Column | str, scale: int = 100) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale).cast("long")


def cents_sum(col: Column | str, scale: int = 100) -> Column:
    """Order-insensitive exact sum of a fixed-point-in-double column."""
    return F.sum(cents(col, scale))


def sql_cents_sum(col_sql: str, scale: int = 100) -> str:
    """DuckDB fragment equivalent to :func:`cents_sum`."""
    return f"sum(CAST(round(({col_sql}) * {scale}, 0) AS BIGINT))"


def as_money(cents_col: Column, scale: int = 100) -> Column:
    """long cents → double currency; exact (int64→double→÷scale, IEEE)."""
    return cents_col.cast("double") / F.lit(float(scale))


def date_histogram(
    df: DataFrame, ts: str, grain: str = "day", metrics: dict[str, Column] | None = None
) -> DataFrame:
    """A3 — date-histogram: bucket rows by truncated event time."""
    bucket = F.date_trunc(grain, F.col(ts)).cast("date" if grain in ("day", "week", "month") else "timestamp")
    g = df.groupBy(bucket.alias(f"{grain}_bucket"))
    # dict KEYS are the output column names (same contract as salted_agg)
    m = metrics or {"n": F.count(F.lit(1))}
    return g.agg(*[c.alias(name) for name, c in m.items()])


def terms_topn(df: DataFrame, col: str, n: int = 10) -> DataFrame:
    """A4 — terms aggregation: top-N categories by count, deterministic
    tiebreak on the term itself."""
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.col(col))
        .limit(n)
    )
