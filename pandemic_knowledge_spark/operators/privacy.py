"""Privacy preparation for data release: k-anonymity suppression
(Sweeney 2002) over declared quasi-identifier columns.

Training-data releases and dashboard exports leak identity through
quasi-identifier COMBINATIONS (day × event type × coarse location …) even
after direct identifiers are dropped — the companion risk to the content
PII that functions.text.redact_pii masks. k-anonymity's contract: every
released quasi combination is shared by ≥ k rows; rarer combinations are
suppressed (masked to '*') so the release partitions into anonymity sets.

Plan shape: ONE window count over the quasi columns (a single hash
shuffle on the quasi key; at 100 TB the same-result groupBy+join form lets
AQE split skewed head groups, but the window form never duplicates the
fact scan). The mask is scan-side conditional projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SUPPRESSED = "*"


def k_anonymize(
    df: DataFrame, quasi_cols: list[str], k: int, suppressed: str = SUPPRESSED
) -> DataFrame:
    """Mask the quasi columns (as strings) for every row whose exact quasi
    combination occurs fewer than k times; append ``anon_suppressed``.
    NULLs count as a value (a NULL combo is itself a quasi signature)."""
    w = Window.partitionBy(*quasi_cols)
    n = F.count(F.lit(1)).over(w)
    out = df.withColumn("anon_suppressed", n < k)
    for c in quasi_cols:
        out = out.withColumn(
            c,
            F.when(F.col("anon_suppressed"), F.lit(suppressed)).otherwise(
                F.col(c).cast("string")
            ),
        )
    return out


def anonymity_report(df: DataFrame, quasi_cols: list[str], k: int) -> DataFrame:
    """One row: released group count, suppressed row count and fraction —
    the release-gate metric (suppression cost of the chosen k)."""
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("n"))
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("n") >= k, 1).otherwise(0)).cast("long").alias("groups_released"),
        F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0)).cast("long").alias("rows_suppressed"),
        F.round(
            F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0))
            / F.sum("n"),
            6,
        ).alias("suppressed_frac"),
    )


def sql_k_anonymize_events(quasi_sql: dict[str, str], k: int) -> str:
    """DuckDB oracle for k_anonymize over the events table with derived
    quasi columns: {out_name: sql_expr}. Returns (event_id, <quasi...>,
    anon_suppressed) with the same NULL-counts-as-value window."""
    derive = ", ".join(f"{e} AS {n}" for n, e in quasi_sql.items())
    names = list(quasi_sql)
    part = ", ".join(names)
    masked = ", ".join(
        f"CASE WHEN n < {k} THEN '{SUPPRESSED}' ELSE CAST({n} AS VARCHAR) END AS {n}"
        for n in names
    )
    return f"""
WITH base AS (SELECT event_id, {derive} FROM events),
counted AS (
  SELECT *, count(*) OVER (PARTITION BY {part}) AS n FROM base
)
SELECT event_id, {masked}, n < {k} AS anon_suppressed
FROM counted
"""
