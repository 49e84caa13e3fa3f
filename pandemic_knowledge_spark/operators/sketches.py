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

from pyspark.sql import Column, DataFrame, Window
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
) -> DataFrame:
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


def distinct_tolerance_audit(
    events: DataFrame,
    rollup: DataFrame,
    key_col: str,
    ts_col: str,
    ranges: tuple[tuple[str, str], ...],
    tol: float = 0.05,
) -> DataFrame:
    """(range_lo, range_hi, n_distinct_exact, within_<tol>pct) — the HLL
    range rollup re-expressed in ORACLE-CHECKABLE tolerance form (the
    witness column is named from ``tol``, e.g. ``within_5pct`` at the 0.05
    default, so the name always states the bound being attested). The
    estimate
    itself can't replay in another engine (DataSketches register layout),
    but the CLAIM the sketch makes — "within ±tol of the true distinct
    count" — can: Spark emits the exact count plus a boolean witness that
    the rollup-merged estimate honors the bound; the DuckDB oracle computes
    the same exact counts and literal TRUE. A hash match therefore proves
    both the exact side and that every estimate was in-tolerance. The
    exact side is the audit harness, not the 100 TB serving path — one
    fact scan with per-range conditional COUNT(DISTINCT); the serving path
    stays the rollup merge (see :func:`distinct_over_range`)."""
    est_parts = [
        distinct_over_range(rollup, lo, hi).select(
            F.lit(lo).alias("range_lo"),
            F.lit(hi).alias("range_hi"),
            "n_distinct_est",
        )
        for lo, hi in ranges
    ]
    est = est_parts[0]
    for p in est_parts[1:]:
        est = est.unionByName(p)
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    exact_wide = events.select(F.col(key_col).alias("k"), day.alias("day")).agg(
        *[
            F.count_distinct(
                F.when(F.col("day").between(F.lit(lo), F.lit(hi)), F.col("k"))
            ).alias(f"__x{i}")
            for i, (lo, hi) in enumerate(ranges)
        ]
    )
    exact = exact_wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lo).alias("range_lo"),
                        F.lit(hi).alias("range_hi"),
                        F.col(f"__x{i}").alias("n_distinct_exact"),
                    )
                    for i, (lo, hi) in enumerate(ranges)
                ]
            )
        ).alias("r")
    ).select("r.*")
    lo_b = F.col("n_distinct_exact") * F.lit(1.0 - tol)
    hi_b = F.col("n_distinct_exact") * F.lit(1.0 + tol)
    return est.join(F.broadcast(exact), ["range_lo", "range_hi"]).select(
        "range_lo",
        "range_hi",
        "n_distinct_exact",
        (
            (F.col("n_distinct_est") >= lo_b) & (F.col("n_distinct_est") <= hi_b)
        ).alias(_tol_col(tol)),
    )


def _tol_col(tol: float) -> str:
    """Witness column name derived from the tolerance so it can never
    misstate the bound: tol=0.05 → ``within_5pct``, 0.10 →
    ``within_10pct``, and a fractional percent keeps its decimals with
    ``_`` for ``.`` (0.025 → ``within_2_5pct``) — never rounded, which
    would attest a bound that wasn't the one checked."""
    pct = tol * 100
    if abs(pct - round(pct)) < 1e-9:
        return f"within_{int(round(pct))}pct"
    return "within_{}pct".format(f"{pct:g}".replace(".", "_"))


def sql_distinct_tolerance(
    ranges: tuple[tuple[str, str], ...],
    key_col: str = "user_id",
    ts_col: str = "ts",
    tol: float = 0.05,
) -> str:
    """DuckDB replay of :func:`distinct_tolerance_audit`'s checkable half:
    exact per-range distinct counts plus literal TRUE — the oracle asserts
    the Spark estimate was in-tolerance by hash-matching the booleans.
    ``tol`` must match the Spark twin's so the witness column names agree."""
    selects = [
        f"SELECT '{lo}' AS range_lo, '{hi}' AS range_hi, "
        f"CAST(COUNT(DISTINCT {key_col}) AS BIGINT) AS n_distinct_exact, "
        f"TRUE AS {_tol_col(tol)} FROM events "
        f"WHERE CAST({ts_col} AS DATE) BETWEEN DATE '{lo}' AND DATE '{hi}'"
        for lo, hi in ranges
    ]
    return "\nUNION ALL\n".join(selects)


# ---------------------------------------------------------------------------
# Mergeable QUANTILE sketch rollup — "decimal DDSketch".
#
# DDSketch (Masson, Rim, Lee — VLDB'19) buckets values by a relative-error
# log grid; merged sketches answer quantiles over any range with bounded
# relative error. The log-gamma grid uses transcendental log(), whose last
# ulp differs across engines — so this variant buckets by DECIMAL leading
# digits instead: value → integer cents → (digit_count, leading 3 digits).
# Pure integer arithmetic, bit-identical in Spark and DuckDB, monotonic in
# the value, ≤ 0.5% relative error (half bucket width over the bucket's
# lower edge, lead ≥ 100), and counts merge by plain addition — so the
# per-day rollup table answers "p99 over any date range" exactly like the
# HLL rollup answers distinct counts, with merge-exactness BY CONSTRUCTION
# (integer adds, no register semantics).
# ---------------------------------------------------------------------------

Q_PROBES = (0.5, 0.9, 0.95, 0.99)


def _cents(value: Column) -> Column:
    return F.round(value * 100).cast("long")


def quantile_bucket(value: Column) -> Column:
    """Monotonic integer bucket id: 0 for values ≤ 0, else
    1000·digits(cents) + leading-3-digits(cents). Buckets with cents < 1000
    are exact singletons; above that, relative width ≤ 1%."""
    c = _cents(value)
    s = c.cast("string")
    return F.when(c <= 0, F.lit(0)).otherwise(
        F.length(s) * 1000 + F.substring(s, 1, 3).cast("long")
    )


def sql_quantile_bucket(cents_expr: str) -> str:
    """DuckDB emitter for :func:`quantile_bucket` given an integer-cents
    SQL expression — the ONE definition of the bucket grid every oracle
    (quantile rollup, PSI drift) derives from, so the grid cannot fork."""
    return (
        f"CASE WHEN {cents_expr} <= 0 THEN 0 "
        f"ELSE length(CAST({cents_expr} AS VARCHAR)) * 1000 "
        f"+ CAST(substr(CAST({cents_expr} AS VARCHAR), 1, 3) AS BIGINT) END"
    )


def bucket_estimate(b: Column) -> Column:
    """Bucket id → representative value (bucket midpoint, in value units)."""
    d = (b / 1000).cast("long")
    lead = b % 1000
    p = F.pow(F.lit(10.0), (d - 3).cast("double"))
    lo = F.when(d <= 3, lead.cast("double")).otherwise(lead * p)
    hi = F.when(d <= 3, lead.cast("double")).otherwise((lead + 1) * p - 1)
    return F.when(b == 0, F.lit(0.0)).otherwise(
        F.round((lo + hi) / 2.0 / 100.0, 6)
    )


def daily_quantile_rollup(
    events: DataFrame, value_col: str, ts_col: str
) -> DataFrame:
    """(day, b, cnt) — the materialized per-day quantile sketch. One
    map-side-combined shuffle; ≤ ~9k buckets per day regardless of row
    count, so the rollup is tiny and appends one day at a time."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    return events.groupBy(
        day.alias("day"), quantile_bucket(F.col(value_col)).alias("b")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def quantiles_over(
    rollup: DataFrame,
    lo: str | Column,
    hi: str | Column,
    probes: tuple[float, ...] = Q_PROBES,
) -> DataFrame:
    """(q, n, est) per probe quantile over day range [lo, hi]: filter the
    rollup, add-merge bucket counts, walk the cumulative histogram. The
    merged histogram is a few thousand rows — the single-partition window
    is on sketch-sized data, never on facts."""
    merged = (
        rollup.filter(F.col("day").between(lo, hi))
        .groupBy("b")
        .agg(F.sum("cnt").alias("cnt"))
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy())
    )
    qs = F.explode(F.array(*[F.lit(q) for q in probes])).alias("q")
    picked = (
        cum.select(qs, "b", "cum", "n")
        .where(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("q", "n")
        .agg(F.min("b").alias("b"))
    )
    return picked.select(
        "q", "n", bucket_estimate(F.col("b")).alias("est")
    ).orderBy("q")


def sql_quantiles_over(
    where_sql: str,
    value_col: str = "value",
    ts_col: str = "ts",
    probes: tuple[float, ...] = Q_PROBES,
) -> str:
    """DuckDB SQL replaying daily_quantile_rollup → quantiles_over for a
    day-range predicate ``where_sql`` over the events table — every rule
    (cents rounding, digit bucketing, cumulative walk, midpoint decode)
    emitted from the same constants the Spark plan uses."""
    probe_list = ", ".join(str(q) for q in probes)
    return f"""
WITH cents AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c
  FROM (SELECT {value_col} AS value, CAST({ts_col} AS DATE) AS day FROM events)
  WHERE {where_sql}
),
bucketed AS (
  SELECT {sql_quantile_bucket('c')} AS b
  FROM cents
),
merged AS (SELECT b, count(*) AS cnt FROM bucketed GROUP BY b),
walk AS (
  SELECT b, sum(cnt) OVER (ORDER BY b) AS cum, sum(cnt) OVER () AS n
  FROM merged
),
picked AS (
  SELECT q, CAST(n AS BIGINT) AS n, min(b) AS b
  FROM (SELECT CAST(unnest([{probe_list}]) AS DOUBLE) AS q), walk
  WHERE cum >= ceil(q * n)
  GROUP BY q, n
)
SELECT q, n,
       CASE WHEN b = 0 THEN 0.0
            ELSE round((
              (CASE WHEN b // 1000 <= 3 THEN CAST(b % 1000 AS DOUBLE)
                    ELSE (b % 1000) * pow(10.0, b // 1000 - 3) END)
            + (CASE WHEN b // 1000 <= 3 THEN CAST(b % 1000 AS DOUBLE)
                    ELSE (b % 1000 + 1) * pow(10.0, b // 1000 - 3) - 1 END)
            ) / 2.0 / 100.0, 6) END AS est
FROM picked
ORDER BY q
"""
