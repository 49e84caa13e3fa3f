"""Fuzzy dimension matching: character-trigram Jaccard best-match join.

The reference's location enrichment joins on EXACT (country, province,
admin2) strings and falls back to a live geocoder on any miss
(/root/reference/flow/scripts/insert_owid.py:72-101) — so "United States" vs
"Untied States" is a cache miss and a paid network call. A trigram-similarity
join resolves the near-miss in-engine: normalize, shingle into character
3-grams, score candidate pairs by Jaccard, keep the best dimension row above
a threshold. Only true misses reach the geocoder.

Scale shape: the dimension side is dimension-sized (thousands of names), so
its exploded trigram postings BROADCAST; the fact side streams through one
explode + broadcast equi-join on the trigram, then a grouped count and one
window for argmax — no shuffle of the fact table beyond its own grouped
aggregate, never a cartesian. Trigrams appearing in more than
``max_posting`` dimension rows are dropped from the index (a trigram shared
by half the dimension identifies nothing and only fans out candidates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# Shared with sql_normalize_name so engine and oracle can't drift.
NORM_RE = "[^a-z0-9]"
TRIGRAM_N = 3


def normalize_name(c: Column) -> Column:
    """Canonical form for name matching: lowercase, alphanumerics only."""
    return F.regexp_replace(F.lower(c), NORM_RE, "")


def sql_normalize_name(col_sql: str) -> str:
    """DuckDB-equivalent of :func:`normalize_name` — emitted from the SAME
    constant so the oracle replays the identical normalization."""
    return f"regexp_replace(lower({col_sql}), '{NORM_RE}', '', 'g')"


def char_trigrams(c: Column) -> Column:
    """Distinct character 3-grams of the normalized string (empty if < 3
    chars). Short-key operator: names are tens of characters, so the
    per-position substr is fine — pass a MATERIALIZED normalized column for
    anything longer."""
    n = F.length(c)
    idx = F.sequence(F.lit(1), n - TRIGRAM_N + 1)
    g = F.transform(idx, lambda i: F.substr(c, i, F.lit(TRIGRAM_N)))
    return F.when(n >= TRIGRAM_N, F.array_distinct(g)).otherwise(
        F.array().cast("array<string>")
    )


def fuzzy_best_match(
    queries: DataFrame,
    dim: DataFrame,
    query_col: str,
    dim_col: str,
    dim_key: str,
    threshold: float = 0.3,
    max_posting: int = 100,
) -> DataFrame:
    """For each query string, the single best dimension row by trigram
    Jaccard (>= threshold), ties broken by smallest dimension key.

    Returns (query value, matched dim key, matched dim value, jaccard)."""
    q = queries.select(F.col(query_col).alias("qv")).distinct().select(
        "qv", normalize_name(F.col("qv")).alias("_qn")
    )
    d = dim.select(
        F.col(dim_key).alias("dk"), F.col(dim_col).alias("dv")
    ).select("dk", "dv", normalize_name(F.col("dv")).alias("_dn"))

    qg = q.select("qv", char_trigrams(F.col("_qn")).alias("g"))
    dg = d.select("dk", "dv", char_trigrams(F.col("_dn")).alias("g"))
    q_sizes = qg.select("qv", F.size("g").alias("qsz"))
    d_sizes = dg.select("dk", F.size("g").alias("dsz"))

    dex = dg.select("dk", F.explode("g").alias("t"))
    hot = dex.groupBy("t").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") > max_posting
    ).select("t")
    dex = dex.join(F.broadcast(hot), "t", "left_anti")
    qex = qg.select("qv", F.explode("g").alias("t"))

    inter = (
        qex.join(F.broadcast(dex), "t")
        .groupBy("qv", "dk")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    scored = (
        inter.join(F.broadcast(d_sizes), "dk")
        .join(q_sizes, "qv")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("qsz") + F.col("dsz") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    w = Window.partitionBy("qv").orderBy(F.desc("jaccard"), F.asc("dk"))
    best = scored.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1")
    return (
        best.join(d.select("dk", "dv"), "dk")
        .select(
            F.col("qv").alias(query_col),
            F.col("dk").alias(dim_key),
            F.col("dv").alias(dim_col),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )
