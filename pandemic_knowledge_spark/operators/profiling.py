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
