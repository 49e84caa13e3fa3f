"""Epidemic surveillance analytics: reproduction-number estimation and
outbreak spike detection over an event stream.

The reference's end product is COVID dashboards — case counts per country
over time (/root/reference/flow/scripts/insert_owid.py feeding Kibana
visualizations). The two analytics an epidemiologist runs on exactly that
table shape, re-expressed as window-function plans:

* **Instantaneous reproduction number** (Cori et al. 2013, "A new framework
  ... to estimate time-varying reproduction numbers"): R_t = I_t / Λ_t with
  Λ_t = Σ_s w_s · I_{t-s}, the infectiousness-weighted sum of recent
  incidence under a discretized serial-interval distribution w. The weights
  here are integer rationals (W_NUM / sum(W_NUM)) so Λ's numerator stays an
  exact int64 and R_t is ONE double division — bit-identical across
  engines and cluster sizes.

* **Spike detection**: per-series z-score of today's count against a
  trailing baseline window (yesterday backwards, today excluded). Computed
  from exact integer sums as z = (n·x − s1) / sqrt(n·s2 − s1²) — a single
  sqrt and division on exactly-representable integers, so Spark and the
  DuckDB oracle agree to the bit before the 6 dp display rounding.

Both run on a DENSE daily spine (zero-filled days), because lag-based
windows silently skip missing days otherwise — the classic surveillance
bug when a reporting gap makes Λ_t look small and R_t explode.

Scale: one groupBy(day[, key]) shuffle builds the per-day counts (map-side
combined, output = #days × #keys rows — tiny regardless of fact size), and
every window after that runs on that tiny rollup. The 100 TB fact table is
touched exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Discretized serial-interval weights for lags 1..len days (integer
# numerators; the distribution is W_NUM / W_DEN). Shape: a gamma-ish hump
# peaking at 3-4 days, the usual short-interval respiratory profile.
W_NUM = (1, 2, 3, 3, 2, 1, 1)
W_DEN = sum(W_NUM)

BASELINE_DAYS = 28   # trailing window for the spike baseline
MIN_BASELINE = 7     # days of history required before z is defined
Z_THRESHOLD = 3.0    # flag threshold
MIN_CASES = 10       # suppress spikes on tiny counts


def daily_counts_dense(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str | None = None,
    where: Column | None = None,
) -> DataFrame:
    """(day[, key], cases) on a dense daily spine over the table's full
    [min, max] day range — every day present, zero-filled. The spine bounds
    come from the UNFILTERED table so different case definitions stay
    comparable on the same axis."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    bounds = events.agg(
        F.min(day).alias("lo"), F.max(day).alias("hi")
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    filtered = events.where(where) if where is not None else events
    if key_col is None:
        base = filtered.groupBy(day.alias("day")).agg(
            F.count(F.lit(1)).alias("cases")
        )
        spine = grid
        join_keys = ["day"]
    else:
        base = filtered.groupBy(day.alias("day"), F.col(key_col).alias("key")).agg(
            F.count(F.lit(1)).alias("cases")
        )
        keys = filtered.select(F.col(key_col).alias("key")).distinct()
        spine = grid.crossJoin(keys)
        join_keys = ["day", "key"]
    out = spine.join(base, join_keys, "left").select(
        *join_keys, F.coalesce("cases", F.lit(0)).cast("long").alias("cases")
    )
    return out


def rt_cori(
    daily: DataFrame,
    order_col: str = "day",
    key_cols: tuple[str, ...] = (),
    cases_col: str = "cases",
    w_num: tuple[int, ...] = W_NUM,
) -> DataFrame:
    """Append (lambda_num, rt): R_t = cases·W_DEN / Σ w_s·cases_{t-s}.

    ``lambda_num`` is the exact integer Σ w_s·I_{t-s} (the infectiousness
    denominator's numerator); ``rt`` is NULL while the weighted history is
    empty (series start, or incidence extinct across the whole window).
    Input must be DENSE in ``order_col`` (see :func:`daily_counts_dense`).
    """
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    lam = None
    for s, wn in enumerate(w_num, start=1):
        term = wn * F.coalesce(F.lag(cases_col, s).over(w), F.lit(0))
        lam = term if lam is None else lam + term
    den = sum(w_num)
    return (
        daily.withColumn("lambda_num", lam.cast("long"))
        .withColumn(
            "rt",
            F.when(
                F.col("lambda_num") > 0,
                F.round(F.col(cases_col) * F.lit(den) / F.col("lambda_num"), 6),
            ),
        )
    )


def outbreak_zscore(
    daily: DataFrame,
    order_col: str = "day",
    key_cols: tuple[str, ...] = (),
    cases_col: str = "cases",
    baseline_days: int = BASELINE_DAYS,
    min_baseline: int = MIN_BASELINE,
    z_threshold: float = Z_THRESHOLD,
    min_cases: int = MIN_CASES,
) -> DataFrame:
    """Append (z, spike): today's count vs the trailing baseline window
    [t-baseline_days, t-1]. z = (n·x − s1)/sqrt(n·s2 − s1²) from exact
    integer sums; NULL when history < min_baseline days or the baseline has
    zero variance. ``spike`` = z ≥ z_threshold AND cases ≥ min_cases."""
    frame = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(-baseline_days, -1)
    )
    x = F.col(cases_col)
    n = F.count(F.lit(1)).over(frame)
    s1 = F.sum(x).over(frame)
    s2 = F.sum(x * x).over(frame)
    disc = (n * s2 - s1 * s1).cast("double")
    z = F.when(
        (n >= min_baseline) & (n * s2 - s1 * s1 > 0),
        F.round((n * x - s1).cast("double") / F.sqrt(disc), 6),
    )
    return daily.withColumn("z", z).withColumn(
        "spike",
        F.coalesce((F.col("z") >= z_threshold) & (x >= min_cases), F.lit(False)),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle emitters — weights/thresholds injected from the SAME module
# constants the Spark plan uses.
# ---------------------------------------------------------------------------

def _sql_dense_daily(ts_col: str, where_sql: str, key_sql: str | None) -> str:
    if key_sql is None:
        return f"""
bounds AS (SELECT min(CAST({ts_col} AS DATE)) AS lo,
                  max(CAST({ts_col} AS DATE)) AS hi FROM events),
spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
counts AS (SELECT CAST({ts_col} AS DATE) AS day, count(*) AS c
           FROM events WHERE {where_sql} GROUP BY 1),
daily AS (SELECT s.day, CAST(coalesce(c.c, 0) AS BIGINT) AS cases
          FROM spine s LEFT JOIN counts c USING (day))"""
    return f"""
bounds AS (SELECT min(CAST({ts_col} AS DATE)) AS lo,
                  max(CAST({ts_col} AS DATE)) AS hi FROM events),
days AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
keys AS (SELECT DISTINCT {key_sql} AS key FROM events WHERE {where_sql}),
spine AS (SELECT day, key FROM days CROSS JOIN keys),
counts AS (SELECT CAST({ts_col} AS DATE) AS day, {key_sql} AS key, count(*) AS c
           FROM events WHERE {where_sql} GROUP BY 1, 2),
daily AS (SELECT s.day, s.key, CAST(coalesce(c.c, 0) AS BIGINT) AS cases
          FROM spine s LEFT JOIN counts c USING (day, key))"""


def sql_rt_cori(
    ts_col: str = "ts",
    where_sql: str = "event_type = 'error'",
    w_num: tuple[int, ...] = W_NUM,
) -> str:
    """DuckDB SQL replaying daily_counts_dense → rt_cori (global series)."""
    terms = " + ".join(
        f"{wn} * coalesce(lag(cases, {s}) OVER (ORDER BY day), 0)"
        for s, wn in enumerate(w_num, start=1)
    )
    den = sum(w_num)
    return f"""
WITH {_sql_dense_daily(ts_col, where_sql, None)},
lam AS (SELECT day, cases, CAST({terms} AS BIGINT) AS lambda_num FROM daily)
SELECT day, cases, lambda_num,
       CASE WHEN lambda_num > 0
            THEN round(CAST(cases * {den} AS DOUBLE) / lambda_num, 6) END AS rt
FROM lam
"""


def sql_outbreak_zscore(
    ts_col: str = "ts",
    key_sql: str = "event_type",
    baseline_days: int = BASELINE_DAYS,
    min_baseline: int = MIN_BASELINE,
    z_threshold: float = Z_THRESHOLD,
    min_cases: int = MIN_CASES,
) -> str:
    """DuckDB SQL replaying daily_counts_dense(key) → outbreak_zscore."""
    return f"""
WITH {_sql_dense_daily(ts_col, "TRUE", key_sql)},
stats AS (
  SELECT day, key, cases,
         count(*)        OVER w AS n,
         sum(cases)      OVER w AS s1,
         sum(cases*cases) OVER w AS s2
  FROM daily
  WINDOW w AS (PARTITION BY key ORDER BY day
               ROWS BETWEEN {baseline_days} PRECEDING AND 1 PRECEDING)
)
SELECT day, key AS event_type, cases,
       CASE WHEN n >= {min_baseline} AND n*s2 - s1*s1 > 0
            THEN round(CAST(n*cases - s1 AS DOUBLE)
                       / sqrt(CAST(n*s2 - s1*s1 AS DOUBLE)), 6) END AS z,
       coalesce(CASE WHEN n >= {min_baseline} AND n*s2 - s1*s1 > 0
                     THEN round(CAST(n*cases - s1 AS DOUBLE)
                                / sqrt(CAST(n*s2 - s1*s1 AS DOUBLE)), 6)
                          >= {z_threshold}
                      AND cases >= {min_cases} END,
                FALSE) AS spike
FROM stats
"""
