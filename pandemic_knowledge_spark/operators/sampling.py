"""Deterministic sampling operators: hash-sample, stratified rates, splits.

The reference has no sampling story at all (its only "bound" is a hardcoded
1,000-tweet crawl cap, /root/reference/flow/scripts/crawl_tweets.py:19) —
but a 100 TB training-data pipeline lives on sampling: corpus subsampling,
per-stratum mixture control, and train/test splits that must be REPRODUCIBLE
across reruns, engines, and cluster sizes.

Design: membership is a pure function of (salt, row key) — a 60-bit md5
integer (functions.text.md5_int, identical bytes in every engine) taken
modulo a permille scale. Consequences that matter at scale:

- Zero shuffle, zero state: sampling is a codegen'd scan-side filter.
  ``df.sample`` by contrast is seeded per-partition — its membership
  changes with partitioning/cluster size and cannot be oracle-checked.
- Stable under reruns and engine changes: the same row lands in the same
  split everywhere (DuckDB reproduces membership bit-exactly).
- Distinct salts give independent samples; the split salt is independent
  of any sampling salt, so subsampling never biases the split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pandemic_knowledge_spark.functions.text import md5_int, md5_int_expr

PERMILLE = 1000


def hash_bucket(key: Column, salt: str) -> Column:
    """Deterministic permille bucket in [0, 1000) for a row key."""
    return md5_int(F.concat(F.lit(salt + ":"), key.cast("string"))) % PERMILLE


def hash_bucket_sql(key_sql: str, salt: str) -> str:
    """ANSI-SQL fragment computing the same permille bucket as hash_bucket."""
    salted = f"concat('{salt}:', CAST({key_sql} AS VARCHAR))"
    return f"{md5_int_expr(salted)} % {PERMILLE}"


def hash_sample(df: DataFrame, key: Column, rate_permille: int, salt: str) -> DataFrame:
    """Keep ~rate_permille/1000 of rows, deterministically by key."""
    return df.filter(hash_bucket(key, salt) < rate_permille)


def stratified_sample(
    df: DataFrame, key: Column, stratum: Column, rates_permille: dict[str, int],
    default_permille: int, salt: str,
) -> DataFrame:
    """Per-stratum sampling rates (e.g. downweight a dominant language).

    The rate lookup is a literal CASE expression — strata stay scan-side,
    no join, no shuffle; tune the mixture without touching the data.
    """
    rate = F.lit(default_permille)
    for value, permille in sorted(rates_permille.items()):
        rate = F.when(stratum == value, F.lit(permille)).otherwise(rate)
    return df.filter(hash_bucket(key, salt) < rate)


def hash_split(df: DataFrame, key: Column, train_permille: int, salt: str) -> DataFrame:
    """Add a 'split' column: 'train' for ~train_permille/1000 of rows by
    key, 'test' otherwise. A row's split never changes across reruns."""
    return df.withColumn(
        "split",
        F.when(hash_bucket(key, salt) < train_permille, F.lit("train")).otherwise(
            F.lit("test")
        ),
    )


def upsample_by_stratum(
    df: DataFrame,
    stratum: Column,
    factors: dict[str, int],
    default_factor: int = 1,
) -> DataFrame:
    """Deterministic upsampling WITH replacement: replicate each row
    factor(stratum) times, adding a 1-based ``copy`` index — the "epochs
    per source/language" knob of a training mixture (rare strata repeat,
    dominant strata don't). A literal CASE picks the factor and
    ``explode(sequence(...))`` emits the copies scan-side: no shuffle, no
    state, reproducible everywhere; (key, copy) stays a stable unique id
    for downstream shuffling/packing."""
    factor = F.lit(default_factor)
    for value, n in sorted(factors.items()):
        factor = F.when(stratum == value, F.lit(n)).otherwise(factor)
    return df.withColumn("copy", F.explode(F.sequence(F.lit(1), factor)))


def fixed_n_per_stratum(
    df: DataFrame,
    key: Column,
    stratum_col: str,
    n: int,
    salt: str,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, deterministically: rank
    rows within each stratum by the salted md5 hash of the key (ties broken
    by the key itself — total order) and keep rank <= n. Unlike rate-based
    sampling this hits an exact COUNT; unlike ``df.limit`` per stratum it
    is one window pass, reproducible everywhere, and the chosen rows never
    change when other strata grow.

    Scale note: one shuffle on the stratum column; per-stratum data must
    sort, so this is for bounded picks (eval sets, per-language probes),
    not corpus-scale thinning — use the rate-based samplers for that.
    """
    from pyspark.sql import Window

    h = md5_int(F.concat(F.lit(salt + ":"), key.cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), key.asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


def budget_mixture_sample(
    df: DataFrame,
    key: Column,
    stratum_col: str,
    tokens: Column,
    budgets: dict[str, int],
    default_budget: int,
    salt: str,
) -> DataFrame:
    """Token-budget mixture control: downsample each stratum to an expected
    token budget. The per-stratum keep rate is derived IN-QUERY from the
    stratum's actual token total — rate_permille = min(1000,
    floor(1000·budget/total)) — so the mixture spec is declarative
    ("20 B tokens of web, 5 B of code") and membership stays the
    deterministic md5-permille filter (reproducible across engines,
    partitionings and reruns; E[kept tokens] ≈ budget, never over 1000‰).

    Scale shape: one map-side-combined groupBy over the stratum column
    (strata are few — sources/languages), the tiny totals frame broadcast
    back, then a scan-side filter. No per-stratum giant window partitions,
    no skew: the corpus-sized side never shuffles.

    Output: input columns + n_tokens + rate_permille, kept rows only.
    The floor(double) is exact here: numerator/denominator are int64s, so
    the quotient is ≥ 1/total away from any integer it isn't exactly equal
    to — far beyond double rounding error.
    """
    base = df.withColumn("n_tokens", tokens.cast("long"))
    totals = base.groupBy(stratum_col).agg(F.sum("n_tokens").alias("__T"))
    budget = F.lit(default_budget)
    for value, b in sorted(budgets.items()):
        budget = F.when(F.col(stratum_col) == value, F.lit(b)).otherwise(budget)
    rate = F.least(
        F.lit(1000),
        F.floor(budget.cast("double") * 1000 / F.col("__T")),
    ).cast("int")
    return (
        base.join(F.broadcast(totals), stratum_col)
        .withColumn("rate_permille", rate)
        .filter(hash_bucket(key, salt) < F.col("rate_permille"))
        .drop("__T")
    )
