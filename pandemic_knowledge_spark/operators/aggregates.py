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


def significant_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    fg_predicate: Column,
    top_k: int = 10,
    min_doc_count: int = 2,
) -> DataFrame:
    """ES ``significant_terms`` (the Kibana "significant terms" panel):
    terms OVERREPRESENTED in a foreground doc subset vs the whole corpus,
    ranked by the JLH score ES defaults to —
    ``(fg_pct − bg_pct) · (fg_pct / bg_pct)`` where fg_pct = share of
    foreground docs containing the term and bg_pct = share of ALL docs
    (ES's superset background: foreground included). Counts are DOC
    frequencies over per-doc DISTINCT terms, exactly as ES counts its
    doc_count. Output (term, fg_count, bg_count, score), top-k by
    (score DESC, term).

    Plan: one corpus scan → per-doc distinct-term explode → ONE shuffle on
    term producing fg/bg doc counts together (conditional sum, no second
    pass), one-row totals broadcast in, top-k via per-partition heaps
    (TakeOrderedAndProject). ``min_doc_count`` (ES default 3, here 2)
    suppresses one-off noise terms before ranking."""
    from pandemic_knowledge_spark.functions.text import tokenize

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        fg_predicate.cast("boolean").alias("fg"),
        F.array_distinct(tokenize(text_col)).alias("terms"),
    )
    totals = base.agg(
        F.sum(F.when(F.col("fg"), 1).otherwise(0)).alias("n_fg"),
        F.count(F.lit(1)).alias("n_all"),
    )
    per_term = (
        base.select("fg", F.explode("terms").alias("term"))
        .groupBy("term")
        .agg(
            F.sum(F.when(F.col("fg"), 1).otherwise(0)).alias("fg_count"),
            F.count(F.lit(1)).alias("bg_count"),
        )
        .filter(F.col("fg_count") >= F.lit(min_doc_count))
    )
    fg_pct = F.col("fg_count").cast("double") / F.col("n_fg")
    bg_pct = F.col("bg_count").cast("double") / F.col("n_all")
    return (
        per_term.crossJoin(F.broadcast(totals))
        .select(
            "term",
            "fg_count",
            "bg_count",
            F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.col("term"))
        .limit(top_k)
    )


def matrix_stats(df: DataFrame, cols) -> DataFrame:
    """ES ``matrix_stats`` aggregation: pairwise population covariance and
    Pearson correlation across numeric fields, in ONE scan. ``cols`` is a
    sequence of (name, integer-valued Column) — the caller scales each
    field to exact integers (cents, permille, ...) so every sum is
    order-insensitive int64; the moments then combine in DOUBLE with one
    fixed expression shape, so the result is bit-identical on any engine
    and partitioning (native covar_pop/corr over raw doubles drift with
    partial-agg order). Covariance is in the caller's scaled units;
    correlation is scale-invariant. Output one row per unordered field
    pair (col_a ≤ col_b): (col_a, col_b, n, covariance, correlation),
    6-dp rounded; the diagonal's correlation is exactly 1 for any
    non-constant column (a zero-variance column yields 0/0 → NULL, in
    both Spark and DuckDB — the empty/constant-input tests pin this)."""
    names = [n for n, _ in cols]
    m = len(names)
    proj = df.select(
        *[c.cast("long").alias(f"__v{i}") for i, (_, c) in enumerate(cols)]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(m):
        aggs.append(F.sum(F.col(f"__v{i}")).alias(f"s{i}"))
        for j in range(i, m):
            aggs.append(
                F.sum(F.col(f"__v{i}") * F.col(f"__v{j}")).alias(f"p{i}_{j}")
            )
    wide = proj.agg(*aggs)
    nd = F.col("n").cast("double")

    def dbl(name: str):
        return F.col(name).cast("double")

    rows = []
    for i in range(m):
        for j in range(i, m):
            num = nd * dbl(f"p{i}_{j}") - dbl(f"s{i}") * dbl(f"s{j}")
            var_i = nd * dbl(f"p{i}_{i}") - dbl(f"s{i}") * dbl(f"s{i}")
            var_j = nd * dbl(f"p{j}_{j}") - dbl(f"s{j}") * dbl(f"s{j}")
            rows.append(
                F.struct(
                    F.lit(names[i]).alias("col_a"),
                    F.lit(names[j]).alias("col_b"),
                    F.col("n").alias("n"),
                    F.round(num / (nd * nd), 6).alias("covariance"),
                    F.round(num / F.sqrt(var_i * var_j), 6).alias("correlation"),
                )
            )
    return wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def sql_matrix_stats(table: str, cols) -> str:
    """DuckDB SQL reproducing :func:`matrix_stats` exactly. ``cols`` maps
    name → integer-valued SQL expression (must match the Spark scaling)."""
    names = [n for n, _ in cols]
    m = len(names)
    exprs = {n: e for n, e in cols}
    sums = ["count(*) AS n"]
    for i in range(m):
        sums.append(f"sum(v{i}) AS s{i}")
        for j in range(i, m):
            sums.append(f"sum(v{i} * v{j}) AS p{i}_{j}")
    proj = ", ".join(
        f"CAST({exprs[names[i]]} AS BIGINT) AS v{i}" for i in range(m)
    )
    selects = []
    for i in range(m):
        for j in range(i, m):
            num = (
                f"(CAST(n AS DOUBLE) * CAST(p{i}_{j} AS DOUBLE)"
                f" - CAST(s{i} AS DOUBLE) * CAST(s{j} AS DOUBLE))"
            )
            var_i = (
                f"(CAST(n AS DOUBLE) * CAST(p{i}_{i} AS DOUBLE)"
                f" - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE))"
            )
            var_j = (
                f"(CAST(n AS DOUBLE) * CAST(p{j}_{j} AS DOUBLE)"
                f" - CAST(s{j} AS DOUBLE) * CAST(s{j} AS DOUBLE))"
            )
            selects.append(
                f"SELECT '{names[i]}' AS col_a, '{names[j]}' AS col_b, "
                f"CAST(n AS BIGINT) AS n, "
                f"round({num} / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS covariance, "
                f"round({num} / sqrt({var_i} * {var_j}), 6) AS correlation "
                f"FROM wide"
            )
    body = "\nUNION ALL\n".join(selects)
    return (
        f"WITH proj AS (SELECT {proj} FROM {table}),\n"
        f"wide AS (SELECT {', '.join(sums)} FROM proj)\n{body}"
    )


def sql_significant_terms(
    table: str,
    id_col: str,
    text_col: str,
    fg_predicate_sql: str,
    top_k: int = 10,
    min_doc_count: int = 2,
) -> str:
    """DuckDB SQL reproducing :func:`significant_terms` exactly — same
    tokenizer, per-doc distinct terms, superset background, JLH score,
    6-dp round and (score DESC, term) tie-break."""
    from pandemic_knowledge_spark.functions.text import sql_tokenize

    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         ({fg_predicate_sql}) AS fg,
         list_distinct({sql_tokenize(text_col)}) AS terms
  FROM {table}
), totals AS (
  SELECT sum(CASE WHEN fg THEN 1 ELSE 0 END) AS n_fg, count(*) AS n_all FROM base
), per_term AS (
  SELECT term,
         sum(CASE WHEN fg THEN 1 ELSE 0 END) AS fg_count,
         count(*) AS bg_count
  FROM (SELECT fg, unnest(terms) AS term FROM base)
  GROUP BY term
  HAVING fg_count >= {min_doc_count}
)
SELECT term,
       CAST(fg_count AS BIGINT) AS fg_count,
       CAST(bg_count AS BIGINT) AS bg_count,
       round(
         (CAST(fg_count AS DOUBLE) / n_fg - CAST(bg_count AS DOUBLE) / n_all)
         * ((CAST(fg_count AS DOUBLE) / n_fg) / (CAST(bg_count AS DOUBLE) / n_all)),
         6
       ) AS score
FROM per_term, totals
ORDER BY score DESC, term LIMIT {top_k}
"""
