"""Table profiling: per-column completeness/cardinality/range report.

The "analyze my table" primitive every ingest pipeline runs before trusting
a feed — the engine-side generalization of the reference's ad-hoc per-field
sanity checks scattered through its loaders (e.g. the manual
None/'' guards in /root/reference/flow/scripts/insert_owid.py:47-66).

One row per profiled column: row count, null count, exact distinct count,
and min/max rendered as strings (so heterogeneous column types stack in one
report frame).

Scale shape: one column-pruned scan per column, each a map-side-combined
aggregate, unioned — total I/O equals reading the table once, and every
per-column job parallelizes independently (Catalyst prunes the scan to the
single profiled column; at 100 TB each sub-aggregate is a 1-column columnar
scan, which is exactly what parquet is fastest at). Distinct counts are
exact (one shuffle per column, map-side partial); swap in
approx_count_distinct when a ±2% answer is worth 10× less shuffle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Profile ``cols`` (default: all columns) of ``df``.

    Returns (col_name, n_rows, n_null, n_distinct, min_str, max_str)."""
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_table requires at least one column")
    parts = []
    for c in cols:
        col = F.col(c)
        parts.append(
            df.select(col.alias("v")).agg(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count("v")).alias("n_null"),
                F.count_distinct("v").alias("n_distinct"),
                F.min("v").cast("string").alias("min_str"),
                F.max("v").cast("string").alias("max_str"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


from pandemic_knowledge_spark.operators.sketches import sql_quantile_bucket

# ------------------------------------------------ distribution drift (PSI)

PSI_MICRO = 1_000_000


def distribution_drift_psi(
    events: DataFrame,
    value_col: str,
    ts_col: str,
    period_a: tuple[str, str],
    period_b: tuple[str, str],
) -> DataFrame:
    """Population Stability Index between two periods' value
    distributions — the data-observability drift alarm (PSI > 0.25 is the
    conventional "population shifted" threshold).

    Binning reuses the decimal-DDSketch bucket grid
    (operators.sketches.quantile_bucket): deterministic integer buckets,
    ≤0.5% relative width, identical in the oracle. Both periods bin in ONE
    conditional-aggregation pass over the fact table; per-bucket shares are
    add-one smoothed over the union bucket set (PSI is undefined on empty
    cells), and contributions (p−q)·ln(p/q) are quantized to integer
    micro-nats before summing — order-invariant, bit-identical.

    Returns one row: (n_a, n_b, n_buckets, psi)."""
    from pandemic_knowledge_spark.operators.sketches import quantile_bucket

    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    in_a = day.between(F.lit(period_a[0]), F.lit(period_a[1]))
    in_b = day.between(F.lit(period_b[0]), F.lit(period_b[1]))
    counts = (
        events.where(in_a | in_b)
        .groupBy(quantile_bucket(F.col(value_col)).alias("bkt"))
        .agg(
            F.sum(F.when(in_a, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(in_b, 1).otherwise(0)).alias("cb"),
        )
    )
    totals = counts.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    p = (F.col("ca") + 1).cast("double") / (F.col("n_a") + F.col("n_buckets"))
    q = (F.col("cb") + 1).cast("double") / (F.col("n_b") + F.col("n_buckets"))
    contrib = F.round((p - q) * F.log(p / q) * PSI_MICRO).cast("long")
    return (
        counts.crossJoin(F.broadcast(totals))
        .select("n_a", "n_b", "n_buckets", contrib.alias("c"))
        .groupBy("n_a", "n_b", "n_buckets")
        .agg(F.round(F.sum("c") / PSI_MICRO, 4).alias("psi"))
    )


def sql_distribution_drift_psi(
    value_col: str,
    ts_col: str,
    period_a: tuple[str, str],
    period_b: tuple[str, str],
) -> str:
    """DuckDB oracle replaying :func:`distribution_drift_psi` over events."""
    return f"""
WITH base AS (
  SELECT CAST(round({value_col} * 100) AS BIGINT) AS c,
         CAST({ts_col} AS DATE) AS day
  FROM events
),
tagged AS (
  SELECT {sql_quantile_bucket('c')} AS bkt,
         (day BETWEEN DATE '{period_a[0]}' AND DATE '{period_a[1]}') AS in_a,
         (day BETWEEN DATE '{period_b[0]}' AND DATE '{period_b[1]}') AS in_b
  FROM base
  WHERE (day BETWEEN DATE '{period_a[0]}' AND DATE '{period_a[1]}')
     OR (day BETWEEN DATE '{period_b[0]}' AND DATE '{period_b[1]}')
),
counts AS (
  SELECT bkt,
         sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN in_b THEN 1 ELSE 0 END) AS cb
  FROM tagged GROUP BY bkt
),
totals AS (
  SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
         count(*) AS n_buckets
  FROM counts
),
contrib AS (
  SELECT n_a, n_b, n_buckets,
         CAST(round(
           (CAST(ca + 1 AS DOUBLE) / (n_a + n_buckets)
            - CAST(cb + 1 AS DOUBLE) / (n_b + n_buckets))
           * ln((CAST(ca + 1 AS DOUBLE) / (n_a + n_buckets))
                / (CAST(cb + 1 AS DOUBLE) / (n_b + n_buckets)))
           * {PSI_MICRO}) AS BIGINT) AS c
  FROM counts CROSS JOIN totals
)
SELECT n_a, n_b, n_buckets, round(CAST(sum(c) AS DOUBLE) / {PSI_MICRO}, 4) AS psi
FROM contrib GROUP BY n_a, n_b, n_buckets
"""
