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


def diversified_sample(
    df: DataFrame,
    key: Column,
    diversity_col: str,
    max_per_value: int,
    shard_size: int,
    salt: str,
) -> DataFrame:
    """ES ``diversified_sampler``: a bounded sample for downstream child
    aggs with at most ``max_per_value`` rows per ``diversity_col`` value —
    the de-bias knob that stops one prolific author/user dominating an
    exploratory panel. Made deterministic (ES samples by shard-local score
    order; a distributed engine needs partition-order independence): rows
    rank by the salted md5 hash of ``key`` both within each diversity
    value (the per-value cap — :func:`fixed_n_per_stratum`) and globally
    (the ``shard_size`` cut, ES's single-logical-shard equivalent), so the
    same rows are chosen on any cluster, any partitioning, both engines.
    ``sampler`` (the undiversified variant) is this with
    ``max_per_value >= shard_size``.

    Scale shape: one shuffle on the diversity column for the capped rank,
    then a TakeOrderedAndProject top-``shard_size`` (bounded — never a
    global sort), then whatever child agg the caller runs on the
    ≤ shard_size rows."""
    capped = fixed_n_per_stratum(df, key, diversity_col, max_per_value, salt)
    h = md5_int(F.concat(F.lit(salt + ":"), key.cast("string")))
    return capped.orderBy(h.asc(), key.asc()).limit(shard_size)


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


# --------------------------------------------------------------------- DSIR


def dsir_rank(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    n_buckets: int = 4096,
    top_k: int = 100,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023, DSIR):
    rank candidate docs by how much they resemble a TARGET distribution,
    estimated over hashed bigram features — the standard LLM-pretraining
    data-selection move ("pick web text that looks like Wikipedia").

    log w(x) = Σ over x's bigrams of [ln p̂_target(b) − ln p̂_raw(b)] with
    add-1-smoothed bucket unigram models (p̂(b) = (cnt_b + 1)/(total + B)).
    Candidates are the NON-target docs; target docs define the numerator
    model and the whole corpus the denominator (the raw pool).

    Engine shape — every stage order-insensitive: bigrams hash to
    ``n_buckets`` buckets (md5→61-bit→mod, the shared shingle mapping; the
    FEATURE MULTISET is kept — no distinct — as DSIR's unigram model
    counts occurrences), bucket counts are one map-side-combined shuffle,
    the per-bucket log-ratio quantizes to INTEGER micro-log-units
    (round(lr·1e6) — so the per-doc sum is an exact int64 aggregate,
    partitioning-invariant where a float sum would drift), the ≤n_buckets
    ratio table broadcasts back onto the exploded features, and the
    ranking is a heap top-k on (log_w DESC, doc_id). Output (doc_id,
    log_w) with log_w = micro-units / 1e6."""
    from pandemic_knowledge_spark.operators.dedup import HASH_MOD, _kgram_concat
    from pandemic_knowledge_spark.functions.text import md5_int, tokenize

    # named tokens column so the 3 references below (size + 2 shifted
    # slices) don't paste the tokenizer regexp into the interpreted
    # transform tree 3x per row (functions.pinning module docs)
    toks = F.col("__toks")
    grams = F.when(F.size(toks) >= 2, _kgram_concat(toks, 2)).otherwise(
        F.array().cast("array<string>")
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        target_pred.cast("boolean").alias("tgt"),
        tokenize(text_col).alias("__toks"),
    ).select(
        "doc_id",
        "tgt",
        F.transform(
            grams, lambda s: (md5_int(s) % HASH_MOD) % n_buckets
        ).alias("bs"),
    )
    # eager localCheckpoint: the exploded feature frame feeds BOTH the
    # bucket-count branch and the candidate-scoring branch — without it
    # each re-runs tokenize + per-bigram md5 over the whole corpus (the
    # operator's dominant cost), the same multi-consumer discipline as
    # minhash/winnow/more_like_this
    ex = base.select(
        "doc_id", "tgt", F.explode("bs").alias("b")
    ).localCheckpoint(eager=False)  # r13: first consumer materializes
    counts = ex.groupBy("b").agg(
        F.sum(F.when(F.col("tgt"), 1).otherwise(0)).alias("tc"),
        F.count(F.lit(1)).alias("rc"),
    )
    totals = counts.agg(
        F.sum("tc").alias("tt"), F.sum("rc").alias("rt")
    )
    lr = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        F.round(
            (
                F.log((F.col("tc") + 1).cast("double") / (F.col("tt") + n_buckets))
                - F.log((F.col("rc") + 1).cast("double") / (F.col("rt") + n_buckets))
            )
            * 1e6
        )
        .cast("long")
        .alias("lri"),
    )
    return (
        ex.filter(~F.col("tgt"))
        .join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(F.round(F.sum("lri") / 1e6, 6).alias("log_w"))
        .orderBy(F.desc("log_w"), F.col("doc_id"))
        .limit(top_k)
    )


def sql_dsir_rank(
    table: str,
    id_col: str,
    text_col: str,
    target_pred_sql: str,
    n_buckets: int = 4096,
    top_k: int = 100,
) -> str:
    """DuckDB SQL reproducing :func:`dsir_rank` exactly (same bigram
    hashing, add-1 smoothing, micro-log-unit quantization and tie-break)."""
    from pandemic_knowledge_spark.operators.dedup import HASH_MOD
    from pandemic_knowledge_spark.functions.text import md5_int_expr, sql_tokenize

    return f"""
WITH base AS (
  SELECT doc_id, __tp AS tgt,
         CASE WHEN len(t) >= 2 THEN
           list_transform(range(1, len(t)), i -> ({md5_int_expr("t[i] || ' ' || t[i+1]")} % {HASH_MOD}) % {n_buckets})
         ELSE [] END AS bs
  FROM (SELECT {id_col} AS doc_id, ({target_pred_sql}) AS __tp, {sql_tokenize(text_col)} AS t FROM {table})
), ex AS (
  SELECT doc_id, tgt, unnest(bs) AS b FROM base
), counts AS (
  SELECT b, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS tc, count(*) AS rc
  FROM ex GROUP BY b
), totals AS (
  SELECT sum(tc) AS tt, sum(rc) AS rt FROM counts
), lr AS (
  SELECT b, CAST(round(
    (ln(CAST(tc + 1 AS DOUBLE) / (tt + {n_buckets}))
     - ln(CAST(rc + 1 AS DOUBLE) / (rt + {n_buckets}))) * 1e6
  ) AS BIGINT) AS lri
  FROM counts, totals
)
SELECT doc_id, round(CAST(sum(lri) AS DOUBLE) / 1e6, 6) AS log_w
FROM ex JOIN lr ON ex.b = lr.b
WHERE NOT tgt
GROUP BY doc_id
ORDER BY log_w DESC, doc_id LIMIT {top_k}
"""
