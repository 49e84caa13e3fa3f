"""Mergeable distinct-count sketches: HLL rollups for pre-aggregated ranges.

The 100 TB pre-aggregation pattern: distinct counts don't sum — yesterday's
1M distinct users + today's 1M may be anywhere from 1M to 2M — so a rollup
table of plain counts can't answer range questions. A rollup of HLL
SKETCHES can: per-bucket sketches merge register-wise (exact on the sketch
state, associative, commutative), so one small materialized table answers
"distinct over any date range" without rescanning the fact table. This is
Spark's built-in Apache DataSketches integration (`hll_sketch_agg` /
`hll_union_agg` / `hll_sketch_estimate`) arranged into the rollup shape.

Merge-exactness (not just approximation) is the load-bearing property:
estimate(union of bucket sketches) is BIT-IDENTICAL to estimate(one sketch
over the whole range) — asserted in tests/test_sketches.py — so the rollup
can be maintained incrementally (a new day appends one row; no read-modify
of history) and range queries are reproducible at any cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LG_K = 12  # 2^12 registers ≈ ±1.6% relative error; 4 KiB per sketch


def daily_sketch_rollup(
    events: DataFrame, key_col: str, ts_col: str, lg_k: int = LG_K
) -> DataFrame:
    """One row per day: (day, sketch, n_rows). The sketch column is a
    binary HLL over ``key_col`` — the materialized rollup a scheduler
    appends to once per day (each day's sketch depends only on that day's
    rows)."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    return events.groupBy(day.alias("day")).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def distinct_over_range(
    rollup: DataFrame, lo: str, hi: str
) -> DataFrame:
    """Distinct estimate for day range [lo, hi]: filter the rollup (a
    partition-pruned scan of a tiny table) and union-merge the sketches —
    never touching the fact table."""
    return (
        rollup.filter(F.col("day").between(F.lit(lo), F.lit(hi)))
        .agg(F.hll_union_agg("sketch").alias("merged"))
        .select(F.hll_sketch_estimate("merged").alias("n_distinct_est"))
    )


def whole_range_estimate(
    events: DataFrame, key_col: str, ts_col: str, lo: str, hi: str,
    lg_k: int = LG_K,
) -> Column:
    """Direct (non-rollup) estimate over the same range — the reference
    the rollup path must reproduce exactly."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    return (
        events.filter(day.between(F.lit(lo), F.lit(hi)))
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(key_col, F.lit(lg_k))
            ).alias("n_distinct_est")
        )
    )
