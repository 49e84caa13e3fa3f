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
    from pandemic_knowledge_spark.functions.pinning import pin
    from pandemic_knowledge_spark.functions.text import tokenize

    pre = docs.select(
        F.col(id_col).alias("doc_id"),
        fg_predicate.cast("boolean").alias("fg"),
        F.col(text_col),
    )
    # Distinct-terms array pinned (r13 wave 14): the explode below makes
    # Spark infer a size(terms) > 0 filter and pushdown re-inlined the
    # plain alias — the tokenizer regexp ran twice per row on the
    # per-term subtree (the wave-3/4 seam; census multi_tokenize_filters).
    # totals aggregates the UNPINNED projection: it never reads terms,
    # and a Generate cannot be pruned, so pinning below it would force a
    # tokenize pass the original plan pruned away.
    base = pin(pre, terms=F.array_distinct(tokenize(text_col)))
    totals = pre.agg(
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


def significant_terms_field(
    docs: DataFrame,
    field: str,
    fg_predicate: Column,
    top_k: int = 10,
    min_doc_count: int = 2,
) -> DataFrame:
    """ES ``significant_terms`` over a KEYWORD field (the commoner Kibana
    panel shape: significant hosts / agents / categories — no analysis
    chain, one value per doc): field values overrepresented in the
    foreground subset vs the whole corpus, same JLH score and same
    superset-background contract as the text form
    (:func:`significant_terms`). Output (term, fg_count, bg_count,
    score), top-k by (score DESC, term).

    Plan: ONE scan → ONE groupBy(field) carrying fg/bg doc counts as a
    conditional sum, one-row totals broadcast in, TakeOrderedAndProject
    top-k — strictly cheaper than the text form (no tokenize, no
    explode)."""
    base = docs.select(
        F.col(field).alias("term"),
        fg_predicate.cast("boolean").alias("fg"),
    ).where(F.col("term").isNotNull())
    totals = base.agg(
        F.sum(F.when(F.col("fg"), 1).otherwise(0)).alias("n_fg"),
        F.count(F.lit(1)).alias("n_all"),
    )
    per_term = (
        base.groupBy("term")
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


def sql_significant_terms_field(
    table: str, field: str, fg_sql: str, top_k: int = 10,
    min_doc_count: int = 2,
) -> str:
    """DuckDB SQL reproducing :func:`significant_terms_field` exactly."""
    return f"""
WITH base AS (
  SELECT {field} AS term, CAST(({fg_sql}) AS BOOLEAN) AS fg
  FROM {table} WHERE {field} IS NOT NULL
), totals AS (
  SELECT CAST(sum(CASE WHEN fg THEN 1 ELSE 0 END) AS BIGINT) AS n_fg,
         CAST(count(*) AS BIGINT) AS n_all
  FROM base
), per_term AS (
  SELECT term,
         CAST(sum(CASE WHEN fg THEN 1 ELSE 0 END) AS BIGINT) AS fg_count,
         CAST(count(*) AS BIGINT) AS bg_count
  FROM base GROUP BY term
  HAVING CAST(sum(CASE WHEN fg THEN 1 ELSE 0 END) AS BIGINT)
         >= {min_doc_count}
)
SELECT term, fg_count, bg_count,
       round((CAST(fg_count AS DOUBLE) / n_fg
              - CAST(bg_count AS DOUBLE) / n_all)
             * ((CAST(fg_count AS DOUBLE) / n_fg)
                / (CAST(bg_count AS DOUBLE) / n_all)), 6) AS score
FROM per_term, totals
ORDER BY score DESC, term LIMIT {top_k}
"""


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
            # product moments: per-row products in LONG (exact — the
            # scaled integers are < 2^31 for any realistic cents field,
            # so the product fits; bigger inputs fail loudly under ANSI
            # mode rather than silently wrapping), SUMMED in DECIMAL
            # (a long Σ of ~1e15 products overflows around 1e4 rows —
            # the r11 sf1-probe overflow family). The long multiply +
            # compact-decimal accumulate is ~20× faster than
            # decimal×decimal per row (the probe caught the first
            # decimal-product draft at 46 s/sf1); DuckDB's HUGEINT sum
            # converts to double identically.
            aggs.append(
                F.sum(
                    (F.col(f"__v{i}") * F.col(f"__v{j}"))
                    .cast("decimal(38,0)")
                ).alias(f"p{i}_{j}")
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


def rare_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_doc_count: int,
    limit: int = 100,
) -> DataFrame:
    """ES ``rare_terms`` aggregation — the long-tail complement of the
    terms agg (find the values that almost never occur, without the
    inverted top-N's "give me a huge size and hope" anti-pattern): terms
    whose DOC frequency (per-doc distinct, exactly how ES counts
    doc_count) is ≤ ``max_doc_count``, rarest first, (term, doc_count).

    Plan: one corpus scan → per-doc distinct-term explode → ONE term
    shuffle for doc frequencies → filter → top-``limit`` via
    per-partition heaps (TakeOrderedAndProject — rare buckets are capped,
    mirroring ES's CuckooFilter-bounded memory; no global sort). Linear
    at any corpus size."""
    from pandemic_knowledge_spark.functions.text import tokenize

    # NOTE (r13 wave 14): a pin here was tried and REVERTED — the census
    # reads ONE regexp site per row on this plan already (the agg's
    # count-only consumer prunes everything but the explode; no pushed
    # predicate re-inlines the array), so the barrier would only add
    # Generate overhead.
    vocab = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(tokenize(text_col))).alias("term"),
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    return (
        vocab.filter(F.col("doc_count") <= F.lit(max_doc_count))
        .orderBy("doc_count", "term")
        .limit(limit)
    )


def sql_rare_terms(
    table: str, id_col: str, text_col: str, max_doc_count: int, limit: int = 100
) -> str:
    """DuckDB SQL reproducing :func:`rare_terms` exactly."""
    from pandemic_knowledge_spark.functions.text import sql_tokenize

    return f"""
WITH vocab AS (
  SELECT term, count(*) AS doc_count
  FROM (
    SELECT {id_col} AS doc_id,
           unnest(list_distinct({sql_tokenize(text_col)})) AS term
    FROM {table}
  )
  GROUP BY term
)
SELECT term, doc_count FROM vocab
WHERE doc_count <= {max_doc_count}
ORDER BY doc_count, term LIMIT {limit}
"""


def adjacency_matrix(df: DataFrame, filters: dict[str, Column]) -> DataFrame:
    """ES ``adjacency_matrix`` aggregation: given named filters, one
    bucket per filter plus one per pairwise INTERSECTION (ES's
    ``A&B``-keyed buckets, '&' joining the two names in sorted order),
    each with its doc count; empty buckets are omitted, exactly as ES
    drops zero-doc buckets. The Kibana use: co-occurrence of segments
    (bought X ∩ bought Y) without N² queries.

    Plan: ONE scan — every filter becomes a 0/1 projection column, all
    singleton and pairwise counts are conditional sums in a single
    partial+final aggregate (no shuffle of the fact table at all, just
    the one-row agg), then the one result row unpivots via a literal
    struct-array explode. Adding a filter adds a column, never a scan."""
    names = sorted(filters)
    proj = df.select(
        *[filters[n].cast("boolean").cast("int").alias(f"__f_{i}") for i, n in enumerate(names)]
    )
    aggs = []
    keys = []
    for i, n in enumerate(names):
        keys.append(n)
        aggs.append(F.sum(F.col(f"__f_{i}")).alias(f"c{len(aggs)}"))
    for i, a in enumerate(names):
        for j in range(i + 1, len(names)):
            keys.append(f"{a}&{names[j]}")
            aggs.append(
                F.sum(F.col(f"__f_{i}") * F.col(f"__f_{j}")).alias(f"c{len(aggs)}")
            )
    one = proj.agg(*aggs)
    buckets = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("key"),
                        F.coalesce(F.col(f"c{i}"), F.lit(0)).alias("doc_count"),
                    )
                    for i, k in enumerate(keys)
                ]
            )
        ).alias("b")
    ).select("b.*")
    return buckets.filter(F.col("doc_count") > 0)


def sql_adjacency_matrix(table: str, filters: dict[str, str]) -> str:
    """DuckDB SQL reproducing :func:`adjacency_matrix` exactly —
    ``filters`` maps bucket name → SQL predicate string."""
    names = sorted(filters)
    cols = [
        f"CAST(COALESCE(sum(CASE WHEN {filters[n]} THEN 1 ELSE 0 END), 0) AS BIGINT) AS c_{i}"
        for i, n in enumerate(names)
    ]
    sel = []
    for i, n in enumerate(names):
        sel.append((n, f"c_{i}"))
    k = len(names)
    for i, a in enumerate(names):
        for j in range(i + 1, len(names)):
            cols.append(
                f"CAST(COALESCE(sum(CASE WHEN ({filters[a]}) AND ({filters[names[j]]}) "
                f"THEN 1 ELSE 0 END), 0) AS BIGINT) AS c_{k}"
            )
            sel.append((f"{a}&{names[j]}", f"c_{k}"))
            k += 1
    unions = "\nUNION ALL\n".join(
        f"SELECT '{key}' AS key, {c} AS doc_count FROM one" for key, c in sel
    )
    return f"""
WITH one AS (
  SELECT {', '.join(cols)} FROM {table}
)
SELECT key, doc_count FROM ({unions}) WHERE doc_count > 0
"""


def composite_after_pred(names: list[str], after) -> Column:
    """The composite cursor as ONE boolean Column: lexicographic
    (k1, k2, ...) > (a1, a2, ...) over the source-key columns — the
    after-key IS the page cursor, evaluated on the (bucket-count-sized)
    aggregated frame, so later pages never rescan earlier buckets' rows.
    Shared by :func:`composite_page` and the ES body door's ``composite``
    bucket type (operators.esdsl) so the cursor law can't fork."""
    if len(after) != len(names) or any(a is None for a in after):
        raise ValueError(
            "composite after-cursor must supply a non-NULL value per "
            f"source ({len(names)} expected, got {after!r})"
        )
    pred = None
    for i in range(len(names)):
        eq = None
        for j in range(i):
            e = F.col(names[j]) == F.lit(after[j])
            eq = e if eq is None else (eq & e)
        gt = F.col(names[i]) > F.lit(after[i])
        term = gt if eq is None else (eq & gt)
        pred = term if pred is None else (pred | term)
    return pred


def composite_page(
    df: DataFrame,
    sources: list,
    metrics: dict[str, Column],
    after: tuple | None = None,
    size: int = 10,
) -> DataFrame:
    """ES ``composite`` aggregation — the PAGINATED group-by ES built so
    dashboards can walk every bucket of a high-cardinality grouping
    without a giant terms size: buckets are ordered by the source-key
    tuple, and each page resumes strictly AFTER the ``after`` key of the
    previous page. ``sources`` is [(name, Column), ...] (ascending order,
    as ES defaults); ``after`` is the last key tuple of the prior page or
    None for the first page.

    Rows with a NULL in ANY source key are excluded — ES's composite
    default (``missing_bucket: false``: documents without a value for a
    source are skipped). Without this, a NULL bucket would surface on
    page 1 but be unreachable past any cursor (NULL > x is NULL), making
    pagination silently lossy; dropping it up front keeps every emitted
    bucket pageable and matches an oracle's non-NULL ordering.

    Plan: one grouped aggregate on the source keys, the after-key
    predicate as a tuple-lexicographic filter ON TOP of the aggregate
    (buckets, not rows — a later page never rescans earlier buckets'
    rows... the agg itself is one shuffle), then orderBy().limit(size) →
    TakeOrderedAndProject per-partition heaps. No global sort, no state:
    the after-key IS the cursor, so page N costs the same as page 1 and
    pages can be fetched by independent jobs — the property ES built
    composite for."""
    names = [n for n, _ in sources]
    filtered = df
    for _, c in sources:  # missing_bucket=false: skip NULL-keyed rows
        filtered = filtered.filter(c.isNotNull())
    g = filtered.groupBy(*[c.alias(n) for n, c in sources]).agg(
        *[c.alias(n) for n, c in metrics.items()]
    )
    if after is not None:
        g = g.filter(composite_after_pred(names, after))
    return g.orderBy(*[F.col(n) for n in names]).limit(size)


def dense_daily_counts(df: DataFrame, ts_col: str) -> DataFrame:
    """The ES date_histogram day frame with default ``min_doc_count=0``
    semantics: (day, cnt) for EVERY calendar day between the first and
    last bucket — gap days exist with cnt=0, exactly as ES emits empty
    buckets. One grouped count, then one bounded explode of the
    [min, max] day range (≤ tens of thousands of rows for decades)
    left-joined back. Shared by every pipeline aggregation
    (:func:`date_histogram_pipeline`, :func:`serial_diff_daily`,
    :func:`sibling_bucket_stats`) so the spine can't fork between them."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    raw = df.groupBy(day.alias("day")).agg(F.count(F.lit(1)).alias("cnt"))
    spine = (
        raw.agg(F.min("day").alias("__lo"), F.max("day").alias("__hi"))
        .select(F.explode(F.sequence("__lo", "__hi")).alias("day"))
    )
    return spine.join(raw, "day", "left").select(
        "day", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt")
    )


def sql_dense_daily_counts(table: str, ts_col: str) -> str:
    """DuckDB CTEs (raw → spine → daily) mirroring
    :func:`dense_daily_counts` — composed into every pipeline-agg oracle,
    never hand-copied."""
    return f"""raw AS (
  SELECT CAST(date_trunc('day', {ts_col}) AS DATE) AS day, count(*) AS cnt
  FROM {table} GROUP BY 1
), spine AS (
  SELECT CAST(unnest(generate_series(CAST(min(day) AS TIMESTAMP),
                                     CAST(max(day) AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM raw
), daily AS (
  SELECT spine.day, CAST(COALESCE(raw.cnt, 0) AS BIGINT) AS cnt
  FROM spine LEFT JOIN raw ON spine.day = raw.day
)"""


def date_histogram_pipeline(
    df: DataFrame, ts_col: str, window: int = 7
) -> DataFrame:
    """ES PIPELINE aggregations over a day date_histogram, in one frame:
    ``derivative`` (bucket count minus the previous day's, NULL only for
    the first bucket), ``cumulative_sum``, and a trailing-``window``-day
    ``moving_avg`` (ES moving_fn unweightedAvg) — the Kibana "daily delta
    / running total / smoothed trend" panel triple.

    ES-default gap semantics (``min_doc_count=0``): the daily spine is
    DENSIFIED — every calendar day between the first and last bucket
    exists with cnt=0, exactly as ES's date_histogram emits empty buckets
    — so a derivative after a gap is cnt−0 and the moving average divides
    by the zero buckets too. The spine is one bounded explode of the
    [min, max] day range (≤ tens of thousands of rows for decades of
    data) left-joined to the real counts.

    Every stage avoids a global single-partition sort, because at 100 TB
    the daily frame spans years and the engine should never funnel it
    through one task:
    - derivative: an equi self-join on day = prev_day + 1 (no window);
    - cumulative_sum: two-phase prefix sum — within-MONTH running totals
      (window partitioned by month) plus a month-offset frame composed
      from month totals (the one bounded non-equi join: months, not
      days), the classic distributed scan composition;
    - moving_avg: each day's count fans out to the ≤``window`` report
      days it contributes to (the rolling_active_keys explode pattern),
      then ONE keyed shuffle re-aggregates; the inner join back to the
      daily spine truncates past the series end.
    Counts and sums stay int64 end-to-end; only the final avg divides."""
    if window < 1:
        # window=0 would make F.sequence(0, -1) count DOWN (Spark infers
        # step -1), silently turning the trailing average into a leading
        # one — reject instead.
        raise ValueError(f"date_histogram_pipeline: window must be >= 1, got {window}")
    daily = dense_daily_counts(df, ts_col).localCheckpoint(
        eager=True  # 4 consumers; truncate the scan plan
    )
    prev = daily.select(
        F.date_add("day", 1).alias("day"), F.col("cnt").alias("__prev_cnt")
    )
    cum = daily_prefix_sum(daily, "cnt", "cumulative_sum")
    contrib = daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(window - 1))).alias("__o"), "day", "cnt"
    ).select(F.date_add("day", F.col("__o")).alias("day"), "cnt")
    mov = contrib.groupBy("day").agg(
        F.sum("cnt").alias("__msum"), F.count(F.lit(1)).alias("__mn")
    )
    return (
        cum.join(prev, "day", "left")
        .join(mov, "day")  # inner: prunes fan-out rows past the series end
        .select(
            "day",
            "cnt",
            (F.col("cnt") - F.col("__prev_cnt")).alias("derivative"),
            "cumulative_sum",
            F.round(
                F.col("__msum").cast("double") / F.col("__mn"), 4
            ).alias("moving_avg"),
        )
    )


def daily_prefix_sum(daily: DataFrame, val_col: str, out_col: str) -> DataFrame:
    """Distributed running total over a (day, value) frame WITHOUT a
    global single-partition sort — at 100 TB a daily frame spans years
    and must never funnel through one task. The classic two-phase scan
    composition: within-MONTH running totals (window partitioned by
    month) plus a month-offset frame composed from month totals (the one
    bounded non-equi join: months, not days — broadcastable forever).
    Returns the input columns plus ``out_col``. Shared by
    :func:`date_histogram_pipeline` (cumulative_sum) and
    :func:`cumulative_cardinality_daily` so the prefix machinery can't
    fork."""
    from pyspark.sql.window import Window

    month = F.trunc("day", "month")
    w_month = (
        Window.partitionBy(month)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = daily.withColumn("__cum_m", F.sum(val_col).over(w_month)).withColumn(
        "__m", month
    )
    mtot = daily.groupBy(month.alias("__m")).agg(F.sum(val_col).alias("__mcnt"))
    offs = (
        mtot.alias("a")
        .join(
            F.broadcast(mtot.select(F.col("__m").alias("__m2"), "__mcnt").alias("b")),
            F.col("__m2") < F.col("a.__m"),
            "left",
        )
        .groupBy(F.col("a.__m").alias("__m"))
        .agg(F.coalesce(F.sum(F.col("b.__mcnt")), F.lit(0)).alias("__off"))
    )
    return (
        within.join(F.broadcast(offs), "__m")
        .withColumn(out_col, F.col("__cum_m") + F.col("__off"))
        .drop("__cum_m", "__m", "__off")
    )


def sql_date_histogram_pipeline(table: str, ts_col: str, window: int = 7) -> str:
    """DuckDB SQL reproducing :func:`date_histogram_pipeline` exactly —
    the same min_doc_count=0 densified spine (generate_series over the
    [min, max] day range), then plain ordered window frames (fine
    single-node) with a calendar RANGE frame for the moving average,
    which matches the explode-fanout by construction; the derivative
    joins on day = prev+1 exactly as the Spark twin."""
    if window < 1:
        raise ValueError(
            f"sql_date_histogram_pipeline: window must be >= 1, got {window}"
        )
    return f"""
WITH {sql_dense_daily_counts(table, ts_col)}, w AS (
  SELECT day, cnt,
         CAST(sum(cnt) OVER (ORDER BY day) AS BIGINT) AS cumulative_sum,
         CAST(sum(cnt) OVER (
           ORDER BY day RANGE BETWEEN INTERVAL {window - 1} DAY PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS msum,
         count(*) OVER (
           ORDER BY day RANGE BETWEEN INTERVAL {window - 1} DAY PRECEDING AND CURRENT ROW
         ) AS mn
  FROM daily
)
SELECT w.day, w.cnt,
       w.cnt - p.cnt AS derivative,
       w.cumulative_sum,
       round(CAST(w.msum AS DOUBLE) / w.mn, 4) AS moving_avg
FROM w LEFT JOIN daily p ON w.day = p.day + 1
"""


#: ES auto_date_histogram rounding ladder: (label, kind, seconds). ES's
#: ladder includes sub-minute units and interval MULTIPLES (5m/10m/30m,
#: 3h/12h, ...), so a short span still gets fine-grained buckets instead
#: of collapsing to the next calendar unit. kind="cal" rungs truncate
#: calendar-exactly via date_trunc (label IS the unit); kind="fixed" rungs
#: are fixed-width epoch floors (the multiples — a 5-minute bucket has no
#: calendar meaning). `seconds` doubles as the approximate span used for
#: the CHOICE and, for fixed rungs, the exact step width.
AUTO_HISTOGRAM_LADDER: tuple[tuple[str, str, int], ...] = (
    ("second", "cal", 1),
    ("5s", "fixed", 5),
    ("10s", "fixed", 10),
    ("30s", "fixed", 30),
    ("minute", "cal", 60),
    ("5m", "fixed", 300),
    ("10m", "fixed", 600),
    ("30m", "fixed", 1_800),
    ("hour", "cal", 3_600),
    ("3h", "fixed", 10_800),
    ("12h", "fixed", 43_200),
    ("day", "cal", 86_400),
    ("week", "cal", 604_800),
    ("month", "cal", 2_592_000),
    ("quarter", "cal", 7_776_000),
    ("year", "cal", 31_536_000),
)


def auto_date_histogram(
    df: DataFrame, ts_col: str, target_buckets: int = 20,
    extra_aggs=(), extra_finals=(),
) -> DataFrame:
    """ES ``auto_date_histogram``: the caller asks for AT MOST
    ``target_buckets`` buckets and the engine picks the interval — the
    Kibana panel that stays readable whether the time filter spans an
    hour or a decade. The smallest ladder unit whose approximate span
    count fits the target is chosen (calendar truncation can still
    produce one bucket more around month/quarter edges, as in ES, whose
    rounding is approximate too). Output (interval, bucket, doc_count).

    Fully declarative — no driver round-trip: the one-row min/max bounds
    frame broadcasts in (the operator's single scalar BNLJ), the unit
    choice is a literal CASE ladder over the span, and the bucket is a
    CASE over per-unit date_trunc, so the fact table sees one scan and
    one grouped shuffle regardless of which interval wins."""
    ts = F.col(ts_col)
    bounds = df.agg(
        F.unix_timestamp(F.min(ts)).alias("__lo"),
        F.unix_timestamp(F.max(ts)).alias("__hi"),
    ).select((F.col("__hi") - F.col("__lo")).alias("__span"))
    unit = None
    for name, _kind, secs in AUTO_HISTOGRAM_LADDER:
        cond = F.col("__span") <= F.lit(target_buckets * secs)
        unit = F.when(cond, F.lit(name)) if unit is None else unit.when(cond, F.lit(name))
    unit = unit.otherwise(F.lit(AUTO_HISTOGRAM_LADDER[-1][0]))
    with_unit = df.crossJoin(F.broadcast(bounds.select(unit.alias("__unit"))))
    bucket = None
    for name, kind, secs in AUTO_HISTOGRAM_LADDER:
        cond = F.col("__unit") == F.lit(name)
        if kind == "cal":
            trunc = F.date_trunc(name, ts)
        else:  # fixed-width epoch floor (the ES interval multiples)
            trunc = F.timestamp_seconds(
                F.floor(F.unix_timestamp(ts) / F.lit(secs)) * F.lit(secs)
            )
        bucket = F.when(cond, trunc) if bucket is None else bucket.when(cond, trunc)
    out = (
        with_unit.groupBy(
            F.col("__unit").alias("interval"), bucket.alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("doc_count"), *extra_aggs)
    )
    if extra_finals:
        # metric sub-aggs (the ES door) ride the SAME grouped shuffle —
        # the interval choice costs nothing extra
        out = out.select("interval", "bucket", "doc_count", *extra_finals)
    return out


def sql_auto_date_histogram(
    table: str, ts_col: str, target_buckets: int = 20,
    extra_sql: str = "",
) -> str:
    """DuckDB SQL reproducing :func:`auto_date_histogram` exactly — same
    ladder, same floored-seconds span, same calendar truncation."""
    span = (
        f"CAST(floor(epoch(max({ts_col}))) AS BIGINT)"
        f" - CAST(floor(epoch(min({ts_col}))) AS BIGINT)"
    )
    unit_case = "CASE " + " ".join(
        f"WHEN span <= {target_buckets * secs} THEN '{name}'"
        for name, _kind, secs in AUTO_HISTOGRAM_LADDER
    ) + f" ELSE '{AUTO_HISTOGRAM_LADDER[-1][0]}' END"

    def _sql_bucket(name: str, kind: str, secs: int) -> str:
        if kind == "cal":
            return f"date_trunc('{name}', {ts_col})"
        return (
            f"make_timestamp(CAST(floor(floor(epoch({ts_col})) / {secs})"
            f" * {secs} AS BIGINT) * 1000000)"
        )

    bucket_case = "CASE " + " ".join(
        f"WHEN c.unit = '{name}' THEN {_sql_bucket(name, kind, secs)}"
        for name, kind, secs in AUTO_HISTOGRAM_LADDER
    ) + " END"
    return f"""
WITH bounds AS (
  SELECT {span} AS span FROM {table}
), c AS (
  SELECT {unit_case} AS unit FROM bounds
)
SELECT c.unit AS interval, {bucket_case} AS bucket, count(*) AS doc_count{extra_sql}
FROM {table}, c
GROUP BY 1, 2
"""


def top_hits(
    df: DataFrame,
    bucket_col: str,
    sort_col: str,
    payload_cols: list[str],
    k: int = 3,
    ascending: bool = False,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """ES ``terms`` + ``top_hits`` sub-aggregation — the Kibana "latest
    news per source" panel shape (the reference's dashboard lists the
    newest documents inside each bucket, /root/reference/README.md:22-24):
    per ``bucket_col`` value, the top-``k`` rows by ``sort_col`` WITH their
    payload columns carried through, plus the bucket's total ``doc_count``
    (the terms-agg count ES attaches to every bucket). ``tiebreak_col``
    (default: the first payload column) makes the cut deterministic when
    sort values tie — ES breaks ties by internal doc id; a distributed
    engine must name one.

    Scale shape: the top-k path is a row_number window ALONE, so Spark's
    WindowGroupLimit pushes the cut below the sort — each input partition
    keeps at most k rows per bucket BEFORE the bucket shuffle (plan-gated
    in tests/test_es_aggs.py). doc_count deliberately does NOT ride the
    same window: an unbounded count frame would force every row of every
    bucket through the shuffle just to be discarded by the rank filter
    (the first-draft plan did exactly that); instead it's a
    map-side-combined groupBy — one tiny (#buckets-row) frame — joined
    back onto the ≤ k·#buckets top-k rows."""
    from pyspark.sql.window import Window

    tb = tiebreak_col or payload_cols[0]
    order = [
        F.col(sort_col).asc() if ascending else F.col(sort_col).desc(),
        F.col(tb).asc(),
    ]
    w = Window.partitionBy(bucket_col).orderBy(*order)
    cols = [bucket_col, *payload_cols]
    counts = df.groupBy(bucket_col).agg(F.count(F.lit(1)).alias("doc_count"))
    topk = (
        df.select(*dict.fromkeys(cols + [sort_col, tb]))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(k))
    )
    return topk.join(counts, bucket_col).select(*cols, "rank", "doc_count")


def sql_top_hits(
    table: str,
    bucket_col: str,
    sort_col: str,
    payload_cols: list[str],
    k: int = 3,
    ascending: bool = False,
    tiebreak_col: str | None = None,
) -> str:
    """DuckDB SQL reproducing :func:`top_hits` exactly — same sort
    direction, same tiebreak, same per-bucket doc_count."""
    tb = tiebreak_col or payload_cols[0]
    direction = "ASC" if ascending else "DESC"
    cols = ", ".join(dict.fromkeys([bucket_col, *payload_cols]))
    return f"""
SELECT {cols}, rank, doc_count FROM (
  SELECT {cols},
         CAST(row_number() OVER (
           PARTITION BY {bucket_col} ORDER BY {sort_col} {direction}, {tb} ASC
         ) AS INTEGER) AS rank,
         count(*) OVER (PARTITION BY {bucket_col}) AS doc_count
  FROM {table}
) WHERE rank <= {k}
"""


def serial_diff_daily(df: DataFrame, ts_col: str, lag: int = 7) -> DataFrame:
    """ES ``serial_diff`` pipeline aggregation over the day
    date_histogram: each bucket's count minus the count ``lag`` buckets
    earlier (NULL for the first ``lag`` buckets) — the seasonality
    detrender (lag=7 removes the weekly cycle). Runs on the densified
    min_doc_count=0 spine (:func:`dense_daily_counts`), so on the dense
    frame "lag buckets" IS "lag calendar days" and the subtraction is an
    EQUI self-join on day = prev_day + lag — no window, no global sort,
    exactly the derivative's distributed shape."""
    if lag < 1:
        raise ValueError(f"serial_diff_daily: lag must be >= 1, got {lag}")
    daily = dense_daily_counts(df, ts_col).localCheckpoint(eager=False)
    prev = daily.select(
        F.date_add("day", lag).alias("day"), F.col("cnt").alias("__lag_cnt")
    )
    return (
        daily.join(prev, "day", "left")
        .select(
            "day", "cnt",
            (F.col("cnt") - F.col("__lag_cnt")).alias(f"diff_{lag}"),
        )
    )


def sql_serial_diff_daily(table: str, ts_col: str, lag: int = 7) -> str:
    """DuckDB SQL reproducing :func:`serial_diff_daily` exactly."""
    if lag < 1:
        raise ValueError(f"sql_serial_diff_daily: lag must be >= 1, got {lag}")
    return f"""
WITH {sql_dense_daily_counts(table, ts_col)}
SELECT d.day, d.cnt, d.cnt - p.cnt AS diff_{lag}
FROM daily d LEFT JOIN daily p ON d.day = p.day + {lag}
"""


def sibling_bucket_stats(df: DataFrame, ts_col: str) -> DataFrame:
    """ES sibling pipeline aggregations over the day date_histogram in one
    row: ``max_bucket`` / ``min_bucket`` (value AND key), ``avg_bucket``,
    ``sum_bucket`` — the "which day peaked / bottomed / what's typical"
    Kibana annotations. ES returns a keys LIST on ties; a distributed
    engine must pick one deterministically: the EARLIEST tied day.

    One pass over the dense day spine: the arg-extremes fold into the
    same aggregate via struct ordering — max(struct(cnt, −epoch_day))
    picks the highest count and, among ties, the smallest day — so the
    whole row is one tiny aggregate, no join, no window."""
    daily = dense_daily_counts(df, ts_col)
    epoch = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    return (
        daily.select("day", "cnt", epoch.alias("__ed"))
        .agg(
            F.max(F.struct(F.col("cnt"), (-F.col("__ed")).alias("__ned"))).alias("__mx"),
            F.min(F.struct(F.col("cnt"), F.col("__ed"))).alias("__mn"),
            F.round(F.sum("cnt") / F.count(F.lit(1)).cast("double"), 6).alias("avg_cnt"),
            F.sum("cnt").alias("sum_cnt"),
        )
        .select(
            F.col("__mx.cnt").alias("max_cnt"),
            F.date_add(
                F.lit("1970-01-01").cast("date"), -F.col("__mx.__ned")
            ).alias("max_day"),
            F.col("__mn.cnt").alias("min_cnt"),
            F.date_add(
                F.lit("1970-01-01").cast("date"), F.col("__mn.__ed")
            ).alias("min_day"),
            "avg_cnt",
            "sum_cnt",
        )
    )


def sql_sibling_bucket_stats(table: str, ts_col: str) -> str:
    """DuckDB SQL reproducing :func:`sibling_bucket_stats` exactly — the
    arg-extremes via ordered LIMIT 1 subqueries (equivalent to the struct
    ordering: highest/lowest count, earliest day on ties)."""
    return f"""
WITH {sql_dense_daily_counts(table, ts_col)},
mx AS (SELECT cnt AS max_cnt, day AS max_day FROM daily
       ORDER BY cnt DESC, day ASC LIMIT 1),
mn AS (SELECT cnt AS min_cnt, day AS min_day FROM daily
       ORDER BY cnt ASC, day ASC LIMIT 1),
tot AS (SELECT round(CAST(sum(cnt) AS BIGINT) / CAST(count(*) AS DOUBLE), 6) AS avg_cnt,
               CAST(sum(cnt) AS BIGINT) AS sum_cnt FROM daily)
SELECT mx.max_cnt, mx.max_day, mn.min_cnt, mn.min_day, tot.avg_cnt, tot.sum_cnt
FROM mx, mn, tot
"""


def value_histogram(
    df: DataFrame, col: str, interval: float, min_doc_count: int = 0
) -> DataFrame:
    """ES numeric ``histogram`` aggregation: values bucket at
    ``floor(value / interval) * interval`` and, with the ES default
    ``min_doc_count=0``, EMPTY buckets between the min and max key are
    returned too — the fixed-interval bar chart that never hides gaps.
    Output (bucket double, doc_count long).

    One grouped count on the bucket index (a long — map-side combined),
    then the zero spine is a bounded explode of the [min, max] INDEX
    range joined back: the fact table is scanned once; the spine costs
    (max−min)/interval rows, the caller's resolution choice."""
    if interval <= 0:
        raise ValueError(f"value_histogram: interval must be > 0, got {interval}")
    idx = F.floor(F.col(col) / F.lit(float(interval))).cast("long")
    raw = df.filter(F.col(col).isNotNull()).groupBy(idx.alias("__i")).agg(
        F.count(F.lit(1)).alias("doc_count")
    )
    if min_doc_count > 0:
        out = raw.filter(F.col("doc_count") >= F.lit(min_doc_count))
    else:
        spine = (
            raw.agg(F.min("__i").alias("__lo"), F.max("__i").alias("__hi"))
            .select(F.explode(F.sequence("__lo", "__hi")).alias("__i"))
        )
        out = spine.join(raw, "__i", "left").select(
            "__i", F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count")
        )
    return out.select(
        (F.col("__i").cast("double") * F.lit(float(interval))).alias("bucket"),
        F.col("doc_count").cast("long").alias("doc_count"),
    )


def sql_value_histogram(
    table: str, col: str, interval: float, min_doc_count: int = 0
) -> str:
    """DuckDB SQL reproducing :func:`value_histogram` exactly (same
    floor-index arithmetic, same zero spine)."""
    if interval <= 0:
        raise ValueError(f"sql_value_histogram: interval must be > 0, got {interval}")
    if min_doc_count > 0:
        return f"""
SELECT CAST(floor({col} / {interval!r}) AS DOUBLE) * {interval!r} AS bucket,
       CAST(count(*) AS BIGINT) AS doc_count
FROM {table} WHERE {col} IS NOT NULL
GROUP BY 1 HAVING count(*) >= {min_doc_count}
"""
    return f"""
WITH raw AS (
  SELECT CAST(floor({col} / {interval!r}) AS BIGINT) AS i, count(*) AS doc_count
  FROM {table} WHERE {col} IS NOT NULL GROUP BY 1
), spine AS (
  SELECT unnest(generate_series(min(i), max(i))) AS i FROM raw
)
SELECT CAST(spine.i AS DOUBLE) * {interval!r} AS bucket,
       CAST(COALESCE(raw.doc_count, 0) AS BIGINT) AS doc_count
FROM spine LEFT JOIN raw ON spine.i = raw.i
"""


def string_stats(df: DataFrame, col: str) -> DataFrame:
    """ES ``string_stats`` metric aggregation over a keyword field:
    count, min_length, max_length, avg_length, and the Shannon ENTROPY of
    the field's character distribution (base 2) — the data-quality probe
    that flags machine-generated / low-diversity values.

    Distributed determinism: lengths aggregate as exact int64s; the
    entropy uses the identity  H = log2(T) − (Σ c·log2 c)/T  over the
    per-character counts, with each c·log2 c term rounded to integer
    NANO-units before the sum — integer sums are partitioning-invariant,
    so Spark and the oracle hash identically (the same micro-log-unit
    idiom as the DSIR sampler). The character explode multiplies rows by
    the value length — a keyword-field aggregation by contract (ES runs
    it on keyword fields); at 100 TB the per-char frame combines
    map-side to ≤ |alphabet| rows per partition."""
    vals = df.select(F.col(col).alias("__v")).filter(F.col("__v").isNotNull())
    lens = vals.agg(
        F.count(F.lit(1)).alias("count"),
        F.min(F.length("__v")).alias("min_length"),
        F.max(F.length("__v")).alias("max_length"),
        F.sum(F.length("__v")).alias("__tot_chars"),
    )
    chars = (
        vals.select(F.explode(F.split("__v", "")).alias("__c"))
        .filter(F.col("__c") != F.lit(""))
        .groupBy("__c")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    ent = chars.agg(
        F.sum(
            F.round(F.col("__n").cast("double") * F.log2(F.col("__n")) * F.lit(1e9), 0)
            .cast("long")
        ).alias("__nlogn_nano"),
        F.sum("__n").alias("__t"),
    )
    return lens.crossJoin(F.broadcast(ent)).select(
        "count",
        "min_length",
        "max_length",
        F.round(F.col("__tot_chars").cast("double") / F.col("count"), 6).alias(
            "avg_length"
        ),
        F.round(
            F.log2(F.col("__t").cast("double"))
            - (F.col("__nlogn_nano").cast("double") / 1e9) / F.col("__t"),
            6,
        ).alias("entropy"),
    )


def sql_string_stats(table: str, col: str) -> str:
    """DuckDB SQL reproducing :func:`string_stats` exactly — same
    nano-unit rounded Σ c·log2 c, same H identity, same roundings."""
    return f"""
WITH vals AS (
  SELECT {col} AS v FROM {table} WHERE {col} IS NOT NULL
), lens AS (
  SELECT count(*) AS cnt, min(length(v)) AS min_length,
         max(length(v)) AS max_length,
         CAST(sum(length(v)) AS BIGINT) AS tot_chars
  FROM vals
), chars AS (
  SELECT c, count(*) AS n
  FROM (SELECT unnest(string_split(v, '')) AS c FROM vals)
  WHERE c <> '' GROUP BY c
), ent AS (
  SELECT CAST(sum(CAST(round(CAST(n AS DOUBLE) * log2(n) * 1e9, 0) AS BIGINT)) AS BIGINT) AS nlogn_nano,
         CAST(sum(n) AS BIGINT) AS t
  FROM chars
)
SELECT CAST(lens.cnt AS BIGINT) AS count, lens.min_length, lens.max_length,
       round(CAST(lens.tot_chars AS DOUBLE) / lens.cnt, 6) AS avg_length,
       round(log2(CAST(ent.t AS DOUBLE)) - (CAST(ent.nlogn_nano AS DOUBLE) / 1e9) / ent.t, 6) AS entropy
FROM lens, ent
"""


def filters_agg(
    df: DataFrame,
    buckets: list,
    other_bucket: str | None = "_other_",
) -> DataFrame:
    """ES ``filters`` aggregation: NAMED predicate buckets in one scan —
    each bucket counts the docs matching its filter (buckets are
    independent: a doc can land in several, exactly ES's semantics), plus
    an optional ``other_bucket`` for docs matching NO filter. ``buckets``
    is a list of (name, boolean Column). Output one row per bucket name:
    (bucket, doc_count).

    Plan: ONE scan, ONE one-row aggregate (a conditional sum per bucket,
    all map-side combined), then a literal-array explode unpivots to rows
    — the adjacency_matrix shape; no shuffle grows with bucket count."""
    names = [n for n, _ in buckets]
    if other_bucket in names:
        raise ValueError(f"filters_agg: bucket name {other_bucket!r} collides")
    conds = list(buckets)
    if other_bucket is not None:
        none_match = None
        for _, c in buckets:
            nc = ~c
            none_match = nc if none_match is None else (none_match & nc)
        conds.append((other_bucket, none_match))
    # positional internal aliases: bucket NAMES are arbitrary ES strings
    # (dots, spaces, backticks) and must never reach a column parser —
    # they ride only as literals in the unpivot structs
    aggs = [
        F.sum(F.when(c, F.lit(1)).otherwise(F.lit(0))).cast("long").alias(f"__dc_{i}")
        for i, (_, c) in enumerate(conds)
    ]
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(n).alias("bucket"), F.col(f"__dc_{i}").alias("doc_count")
        )
        for i, (n, _) in enumerate(conds)
    ]
    return wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def sql_filters_agg(table: str, buckets: list, other_bucket: str | None = "_other_") -> str:
    """DuckDB SQL reproducing :func:`filters_agg` exactly. ``buckets`` is
    a list of (name, SQL boolean expression)."""
    conds = list(buckets)
    if other_bucket is not None:
        none = " AND ".join(f"NOT ({e})" for _, e in buckets)
        conds.append((other_bucket, none))
    branches = " UNION ALL ".join(
        "SELECT '{}' AS bucket, ".format(n.replace("'", "''"))
        + f"CAST(sum(CASE WHEN {e} THEN 1 ELSE 0 END) AS BIGINT) AS doc_count "
        f"FROM {table}"
        for n, e in conds
    )
    return branches


def cumulative_cardinality_daily(df: DataFrame, ts_col: str, key_col: str) -> DataFrame:
    """ES ``cumulative_cardinality`` pipeline aggregation over the day
    date_histogram: for each day, the number of DISTINCT keys seen so far
    (the "total users to date" Kibana line). ES computes it from per-
    bucket HLL sketches; exactly and distributed it reduces to first-seen
    dates: a key contributes to the cumulative count from its FIRST day
    onward, so cumulative_cardinality(day) = Σ_{d ≤ day} |{k: first(k)=d}|.

    Plan: ONE scan of the fact table — the groupBy(key) carries each
    key's first AND last day, so the dense-spine bounds (the
    min_doc_count=0 range: first day any key appeared … last day any key
    appeared) fold out of the same aggregate instead of a second scan —
    then a day-sized count and the shared :func:`daily_prefix_sum`. No
    global sort, no per-day distinct re-count (the naive form re-counts a
    growing set per bucket: quadratic in days). Output
    (day, new_keys, cumulative_keys)."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    first_seen = (
        df.select(F.col(key_col).alias("__k"), day.alias("day"))
        .filter(F.col("__k").isNotNull())
        .groupBy("__k")
        .agg(F.min("day").alias("day"), F.max("day").alias("__last"))
        .localCheckpoint(eager=False)  # 2 consumers: counts + bounds (lazy, r13)
    )
    new_per_day = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_keys")
    )
    # dense spine over the keyed docs' full day range (a day with docs but
    # no new keys still buckets, as does a gap day)
    spine = (
        first_seen.agg(F.min("day").alias("__lo"), F.max("__last").alias("__hi"))
        .select(F.explode(F.sequence("__lo", "__hi")).alias("day"))
    )
    daily = spine.join(new_per_day, "day", "left").select(
        "day", F.coalesce(F.col("new_keys"), F.lit(0)).cast("long").alias("new_keys")
    )
    return daily_prefix_sum(daily, "new_keys", "cumulative_keys")


def sql_cumulative_cardinality_daily(table: str, ts_col: str, key_col: str) -> str:
    """DuckDB SQL reproducing :func:`cumulative_cardinality_daily`."""
    return f"""
WITH first_seen AS (
  SELECT {key_col} AS k,
         min(CAST(date_trunc('day', {ts_col}) AS DATE)) AS day,
         max(CAST(date_trunc('day', {ts_col}) AS DATE)) AS last_day
  FROM {table} WHERE {key_col} IS NOT NULL GROUP BY 1
), new_per_day AS (
  SELECT day, count(*) AS new_keys FROM first_seen GROUP BY day
), bounds AS (
  SELECT min(day) AS lo, max(last_day) AS hi FROM first_seen
), spine AS (
  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
), daily AS (
  SELECT spine.day, CAST(COALESCE(new_per_day.new_keys, 0) AS BIGINT) AS new_keys
  FROM spine LEFT JOIN new_per_day ON spine.day = new_per_day.day
)
SELECT day, new_keys,
       CAST(sum(new_keys) OVER (ORDER BY day) AS BIGINT) AS cumulative_keys
FROM daily
"""


def range_agg(df: DataFrame, col: str, ranges: list) -> DataFrame:
    """ES ``range`` aggregation: NAMED value ranges, ``from`` inclusive /
    ``to`` exclusive / either end unbounded, evaluated INDEPENDENTLY (ES
    allows overlapping ranges — a doc can land in several); docs with a
    NULL value land in none. ``ranges`` is a list of (name, lo, hi) with
    None for an open end. Output (bucket, doc_count) — one scan, one
    one-row conditional aggregate via :func:`filters_agg`."""
    c = F.col(col)
    conds = []
    for name, lo, hi in ranges:
        cond = c.isNotNull()
        if lo is not None:
            cond = cond & (c >= F.lit(lo))
        if hi is not None:
            cond = cond & (c < F.lit(hi))
        conds.append((name, cond))
    return filters_agg(df, conds, other_bucket=None)


def sql_range_agg(table: str, col: str, ranges: list, sql_lit=repr) -> str:
    """DuckDB SQL reproducing :func:`range_agg` exactly. ``sql_lit``
    renders a bound as a SQL literal (default ``repr`` for numerics; pass
    e.g. ``lambda v: f"TIMESTAMP '{v}'"`` for date ranges)."""
    conds = []
    for name, lo, hi in ranges:
        parts = [f"{col} IS NOT NULL"]
        if lo is not None:
            parts.append(f"{col} >= {sql_lit(lo)}")
        if hi is not None:
            parts.append(f"{col} < {sql_lit(hi)}")
        conds.append((name, " AND ".join(parts)))
    return sql_filters_agg(table, conds, other_bucket=None)


def date_range_agg(df: DataFrame, ts_col: str, ranges: list) -> DataFrame:
    """ES ``date_range`` aggregation — :func:`range_agg` over a timestamp
    column with ISO bounds (from inclusive, to exclusive, open ends)."""
    c = F.col(ts_col)
    conds = []
    for name, lo, hi in ranges:
        cond = c.isNotNull()
        if lo is not None:
            cond = cond & (c >= F.lit(lo).cast("timestamp"))
        if hi is not None:
            cond = cond & (c < F.lit(hi).cast("timestamp"))
        conds.append((name, cond))
    return filters_agg(df, conds, other_bucket=None)


def sql_date_range_agg(table: str, ts_col: str, ranges: list) -> str:
    """DuckDB twin of :func:`date_range_agg`."""
    return sql_range_agg(
        table, ts_col, ranges, sql_lit=lambda v: f"TIMESTAMP '{v}'"
    )


def t_test_agg(
    df: DataFrame,
    value_col: str,
    a_filter: Column,
    b_filter: Column,
    scale: int = 1000,
) -> DataFrame:
    """ES ``t_test`` metric aggregation (default ``heteroscedastic`` =
    Welch's unpaired t-test): is population A's mean value significantly
    different from population B's?  t = (m_a − m_b) / √(v_a/n_a + v_b/n_b)
    with SAMPLE variances (n−1). Output one row
    (n_a, n_b, mean_a, mean_b, t_value).

    Determinism: values scale to exact integers (``scale`` micro-units —
    the cents idiom), both populations' Σ and Σx² fold into ONE one-row
    conditional aggregate (a single scan, map-side combined), and the
    means/variances/t assemble in double with one fixed expression shape
    — bit-identical on any partitioning, like matrix_stats."""
    v = cents(F.col(value_col), scale)
    aggs = []
    for tag, cond in (("a", a_filter), ("b", b_filter)):
        gated = F.when(cond, v)
        aggs += [
            F.count(gated).alias(f"n_{tag}"),
            F.sum(gated).alias(f"s_{tag}"),
            F.sum(gated * gated).alias(f"ss_{tag}"),
        ]
    wide = df.agg(*aggs)

    def mean(tag):
        return F.col(f"s_{tag}").cast("double") / F.col(f"n_{tag}") / scale

    def var(tag):  # sample variance, in VALUE units (descaled)
        n = F.col(f"n_{tag}").cast("double")
        s = F.col(f"s_{tag}").cast("double")
        ss = F.col(f"ss_{tag}").cast("double")
        return (ss - s * s / n) / (n - 1) / (scale * scale)

    t = (mean("a") - mean("b")) / F.sqrt(
        var("a") / F.col("n_a") + var("b") / F.col("n_b")
    )
    return wide.select(
        F.col("n_a"),
        F.col("n_b"),
        F.round(mean("a"), 6).alias("mean_a"),
        F.round(mean("b"), 6).alias("mean_b"),
        F.round(t, 6).alias("t_value"),
    )


def sql_t_test_agg(
    table: str, value_col: str, a_sql: str, b_sql: str, scale: int = 1000
) -> str:
    """DuckDB SQL reproducing :func:`t_test_agg` exactly."""
    v = f"CAST(round(({value_col}) * {scale}, 0) AS BIGINT)"
    parts = []
    for tag, cond in (("a", a_sql), ("b", b_sql)):
        g = f"CASE WHEN {cond} THEN {v} END"
        parts += [
            f"CAST(count({g}) AS BIGINT) AS n_{tag}",
            f"CAST(sum({g}) AS BIGINT) AS s_{tag}",
            f"CAST(sum(({g}) * ({g})) AS BIGINT) AS ss_{tag}",
        ]
    mean = lambda t: f"(CAST(s_{t} AS DOUBLE) / n_{t} / {scale})"
    var = (
        lambda t: f"((CAST(ss_{t} AS DOUBLE) - CAST(s_{t} AS DOUBLE) * s_{t} / n_{t})"
        f" / (n_{t} - 1) / ({scale} * {scale}.0))"
    )
    return f"""
WITH wide AS (
  SELECT {", ".join(parts)} FROM {table}
)
SELECT n_a, n_b,
       round({mean('a')}, 6) AS mean_a,
       round({mean('b')}, 6) AS mean_b,
       round(({mean('a')} - {mean('b')})
             / sqrt({var('a')} / n_a + {var('b')} / n_b), 6) AS t_value
FROM wide
"""


def moving_percentile_daily(
    df: DataFrame, ts_col: str, window: int = 7, p: float = 0.5
) -> DataFrame:
    """ES ``moving_percentiles`` pipeline aggregation: an exact
    percentile of the trailing ``window`` day-bucket values — the robust
    (outlier-proof) cousin of the moving average Kibana overlays. Runs on
    the min_doc_count=0 dense spine, trailing-inclusive like the
    moving_avg stage of :func:`date_histogram_pipeline`, truncated at the
    series start (ES emits the percentile of however many buckets exist).

    Distributed shape: each day's count fans out to the ≤``window``
    report days it contributes to (the same explode pattern as the
    moving average — never a global sort), then ONE keyed shuffle
    re-aggregates; the per-day group holds ≤``window`` values, so the
    exact interpolated percentile is a constant-size in-group sort.
    Output (day, cnt, moving_pNN)."""
    if window < 1:
        raise ValueError(f"moving_percentile_daily: window must be >= 1, got {window}")
    if not (0.0 <= p <= 1.0):
        raise ValueError(f"moving_percentile_daily: p must be in [0, 1], got {p}")
    daily = dense_daily_counts(df, ts_col).localCheckpoint(eager=False)
    contrib = daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(window - 1))).alias("__o"), "day", "cnt"
    ).select(F.date_add("day", F.col("__o")).alias("day"), F.col("cnt").alias("__v"))
    out_col = f"moving_p{int(p * 100)}"
    mov = contrib.groupBy("day").agg(
        F.round(F.expr(f"percentile(__v, {p!r})"), 6).alias(out_col)
    )
    # inner join back to the spine: prunes fan-out rows past the series end
    return daily.join(mov, "day").select("day", "cnt", out_col)


def sql_moving_percentile_daily(
    table: str, ts_col: str, window: int = 7, p: float = 0.5
) -> str:
    """DuckDB SQL reproducing :func:`moving_percentile_daily` exactly —
    the trailing calendar-day window as a bounded self-join over the
    dense spine (mirrors the explode fan-out by construction), exact
    interpolated percentile per report day."""
    if window < 1:
        raise ValueError(
            f"sql_moving_percentile_daily: window must be >= 1, got {window}"
        )
    out_col = f"moving_p{int(p * 100)}"
    return f"""
WITH {sql_dense_daily_counts(table, ts_col)}
SELECT d1.day, d1.cnt,
       round(quantile_cont(d2.cnt, {p!r}), 6) AS {out_col}
FROM daily d1
JOIN daily d2 ON d2.day BETWEEN d1.day - {window - 1} AND d1.day
GROUP BY d1.day, d1.cnt
"""


def extended_stats_by(
    df: DataFrame,
    key_col: str,
    value_col: str,
    scale: int = 100,
    sigma: float = 2.0,
) -> DataFrame:
    """ES ``extended_stats`` metric aggregation, grouped: per key the full
    moment panel — count, min, max, sum, avg, sum_of_squares,
    variance (population, ES's default ``variance``), sampling variance,
    std_deviation and the ±``sigma`` std_deviation_bounds Kibana draws as
    the banded overlay.

    Determinism: values scale to exact integers (the cents idiom); ONE
    grouped aggregate collects n/Σ/Σx² (map-side combined, one shuffle on
    the key); every double assembles from those integers with the same
    fixed expression shape as :func:`t_test_agg`, so results are
    bit-identical on any partitioning and replay exactly in DuckDB
    (:func:`sql_extended_stats_by`)."""
    v = cents(F.col(value_col), scale)
    # Σx² runs in DECIMAL(38,0): a long squares-sum overflows around 1e4
    # money-sized rows per group at sf1 (cents² ≈ 1e15/row — the r11 sf1
    # probe caught the door's copy of this). The per-row square stays in
    # LONG (exact below 2^31-scale inputs; bigger fails loudly under
    # ANSI) and only the SUM accumulates in decimal — the long multiply
    # is ~20× faster than decimal×decimal per row. DuckDB sums BIGINT
    # products into HUGEINT, converting to double identically.
    wide = df.groupBy(key_col).agg(
        F.count(v).alias("n"),
        F.min(F.col(value_col)).alias("mn"),
        F.max(F.col(value_col)).alias("mx"),
        F.sum(v).alias("s"),
        F.sum((v * v).cast("decimal(38,0)")).alias("ss"),
    )
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    ss = F.col("ss").cast("double")
    mean = s / F.col("n") / scale
    var_pop = (ss - s * F.col("s") / F.col("n")) / F.col("n") / (scale * scale)
    var_samp = (ss - s * F.col("s") / F.col("n")) / (F.col("n") - 1) / (scale * scale)
    std = F.sqrt(var_pop)
    return wide.select(
        F.col(key_col),
        F.col("n").alias("doc_count"),
        F.round("mn", 4).alias("min_value"),
        F.round("mx", 4).alias("max_value"),
        (s / scale).alias("sum_value"),
        F.round(mean, 6).alias("avg_value"),
        F.round(ss / (scale * scale), 6).alias("sum_of_squares"),
        F.round(var_pop, 6).alias("variance"),
        F.round(var_samp, 6).alias("variance_sampling"),
        F.round(std, 6).alias("std_deviation"),
        F.round(mean + sigma * std, 6).alias("std_upper"),
        F.round(mean - sigma * std, 6).alias("std_lower"),
    ).orderBy(key_col)


def sql_extended_stats_by(
    table: str, key_col: str, value_col: str, scale: int = 100,
    sigma: float = 2.0,
) -> str:
    """DuckDB SQL reproducing :func:`extended_stats_by` exactly — same
    integer moments, same fixed double expression shapes."""
    v = f"CAST(round(({value_col}) * {scale}, 0) AS BIGINT)"
    mean = f"(CAST(s AS DOUBLE) / n / {scale})"
    var_pop = (
        f"((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n"
        f" / ({scale} * {scale}.0))"
    )
    var_samp = (
        f"((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)"
        f" / ({scale} * {scale}.0))"
    )
    std = f"sqrt({var_pop})"
    return f"""
WITH wide AS (
  SELECT {key_col},
         CAST(count({v}) AS BIGINT) AS n,
         min({value_col}) AS mn,
         max({value_col}) AS mx,
         CAST(sum({v}) AS BIGINT) AS s,
         sum(({v}) * ({v})) AS ss
  FROM {table} GROUP BY {key_col}
)
SELECT {key_col},
       n AS doc_count,
       round(mn, 4) AS min_value,
       round(mx, 4) AS max_value,
       CAST(s AS DOUBLE) / {scale} AS sum_value,
       round({mean}, 6) AS avg_value,
       round(CAST(ss AS DOUBLE) / ({scale} * {scale}.0), 6) AS sum_of_squares,
       round({var_pop}, 6) AS variance,
       round({var_samp}, 6) AS variance_sampling,
       round({std}, 6) AS std_deviation,
       round({mean} + {sigma!r} * {std}, 6) AS std_upper,
       round({mean} - {sigma!r} * {std}, 6) AS std_lower
FROM wide ORDER BY {key_col}
"""


def mad_by(
    df: DataFrame, key_col: str, value_col: str, scale: int = 100
) -> DataFrame:
    """ES ``median_absolute_deviation`` metric aggregation, grouped —
    MAD = median(|x − median(x)|), the robust dispersion ES pairs with its
    percentile panels (ES approximates with TDigest; we match the
    capability exactly so the oracle verifies values).

    Determinism across engines: both medians run in an INTEGER domain.
    Values scale to cents; the per-key median of cents is either k or
    k+0.5 (percentile_cont at 0.5 interpolates halfway at most), so
    2·|x_cents| − 2·median stays an exact integer and the second median
    runs over exact ints too; the final descale (/2/scale) and 6-dp round
    are one fixed double expression. Both median passes use the
    rank-targeted distributed percentile tier
    (operators.ranks.grouped_percentiles_exact) — never a per-group
    single-reducer value map; the #keys-row median frame broadcasts into
    the deviation scan."""
    from pandemic_knowledge_spark.operators.ranks import grouped_percentiles_exact

    v = cents(F.col(value_col), scale)
    base = df.select(F.col(key_col), v.alias("__mad_c"))
    # The #keys-row median frame is checkpointed: since r13 the percentile
    # machinery no longer materializes its input (guide §5 — re-scanning
    # two pruned columns beats storing a corpus copy), so WITHOUT this
    # tiny barrier the deviation pass would embed the whole pass-1 plan
    # in each of its subtrees (measured: 442-exchange plan, 8.9 s vs
    # 3.3 s at sf0.1). Lazy: it materializes with the first action.
    med = (
        grouped_percentiles_exact(base, [key_col], "__mad_c", [0.5])
        .select(key_col, (F.col("p50") * 2).cast("long").alias("__mad_m2"))
        .localCheckpoint(eager=False)
    )
    dev = base.join(F.broadcast(med), key_col).select(
        key_col,
        F.abs(F.col("__mad_c") * 2 - F.col("__mad_m2")).alias("__mad_d2"),
    )
    out = grouped_percentiles_exact(dev, [key_col], "__mad_d2", [0.5])
    return out.select(
        key_col, F.round(F.col("p50") / 2.0 / scale, 6).alias("mad")
    ).orderBy(key_col)


def sql_mad_by(table: str, key_col: str, value_col: str, scale: int = 100) -> str:
    """DuckDB SQL reproducing :func:`mad_by` exactly (quantile_cont is
    percentile_cont — the same interpolation Spark's percentile() uses)."""
    v = f"CAST(round(({value_col}) * {scale}, 0) AS BIGINT)"
    return f"""
WITH med AS (
  SELECT {key_col}, CAST(2 * quantile_cont({v}, 0.5) AS BIGINT) AS m2
  FROM {table} GROUP BY {key_col}
), dev AS (
  SELECT t.{key_col}, abs(2 * {v} - med.m2) AS d2
  FROM {table} t JOIN med USING ({key_col})
)
SELECT {key_col}, round(quantile_cont(d2, 0.5) / 2.0 / {scale}, 6) AS mad
FROM dev GROUP BY {key_col} ORDER BY {key_col}
"""


def rate_monthly(
    df: DataFrame, ts_col: str, value_col: str, scale: int = 100
) -> DataFrame:
    """ES ``rate`` aggregation inside a calendar-month date_histogram,
    ``unit: "day"``: each month reports its event count and value sum
    RESCALED to a per-day rate (doc_rate = docs / days-in-month) — the
    unit-normalized trend Kibana overlays so a 28-day February compares
    honestly with a 31-day March. One scan → one month groupBy (exact
    integer count + cents sum); days-in-month derives from the month
    start (last_day), so the division is one fixed double expression."""
    month = F.date_trunc("month", F.col(ts_col)).cast("date")
    monthly = (
        df.select(month.alias("month"), cents(F.col(value_col), scale).alias("__c"))
        .groupBy("month")
        .agg(F.count(F.lit(1)).alias("doc_count"), F.sum("__c").alias("__s"))
        .withColumn(
            "days",
            (F.datediff(F.last_day(F.col("month")), F.col("month")) + 1)
            .cast("long"),
        )
    )
    return monthly.select(
        "month",
        "doc_count",
        "days",
        F.round(
            F.col("doc_count") / F.col("days").cast("double"), 6
        ).alias("doc_rate_per_day"),
        F.round(
            F.col("__s").cast("double") / scale / F.col("days").cast("double"), 6
        ).alias("value_rate_per_day"),
    ).orderBy("month")


def sql_rate_monthly(
    table: str, ts_col: str, value_col: str, scale: int = 100
) -> str:
    """DuckDB SQL reproducing :func:`rate_monthly` exactly."""
    v = f"CAST(round(({value_col}) * {scale}, 0) AS BIGINT)"
    days = ("(date_diff('day', CAST(month AS DATE), "
            "CAST(last_day(CAST(month AS DATE)) AS DATE)) + 1)")
    return f"""
WITH m AS (
  SELECT CAST(date_trunc('month', {ts_col}) AS DATE) AS month,
         CAST(count(*) AS BIGINT) AS doc_count,
         CAST(sum({v}) AS BIGINT) AS s
  FROM {table} GROUP BY 1
)
SELECT month, doc_count,
       CAST({days} AS BIGINT) AS days,
       round(doc_count / CAST({days} AS DOUBLE), 6) AS doc_rate_per_day,
       round(CAST(s AS DOUBLE) / {scale} / CAST({days} AS DOUBLE), 6)
         AS value_rate_per_day
FROM m ORDER BY month
"""


def stats_bucket_daily(df: DataFrame, ts_col: str) -> DataFrame:
    """ES ``stats_bucket`` + ``extended_stats_bucket`` sibling pipeline
    over a daily date_histogram: one row of count / min / max / avg / sum
    plus population variance and std deviation OF THE DAILY DOC COUNTS —
    the "how spiky is my traffic" panel. Two exact integer aggregates
    (day counts, then one-row moments over the ≤ #days bucket frame);
    every double assembles from ints with a fixed expression shape."""
    daily = df.groupBy(
        F.date_trunc("day", F.col(ts_col)).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wide = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cnt").alias("mn"),
        F.max("cnt").alias("mx"),
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
    )
    s = F.col("s").cast("double")
    ss = F.col("ss").cast("double")
    mean = s / F.col("n")
    var_pop = (ss - s * F.col("s") / F.col("n")) / F.col("n")
    return wide.select(
        F.col("n").alias("bucket_count"),
        F.col("mn").alias("min_count"),
        F.col("mx").alias("max_count"),
        F.col("s").alias("sum_count"),
        F.round(mean, 6).alias("avg_count"),
        F.round(var_pop, 6).alias("variance"),
        F.round(F.sqrt(var_pop), 6).alias("std_deviation"),
    )


def sql_stats_bucket_daily(table: str, ts_col: str) -> str:
    """DuckDB SQL reproducing :func:`stats_bucket_daily` exactly."""
    return f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', {ts_col}) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS cnt
  FROM {table} GROUP BY 1
), wide AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(min(cnt) AS BIGINT) AS mn,
         CAST(max(cnt) AS BIGINT) AS mx,
         CAST(sum(cnt) AS BIGINT) AS s,
         CAST(sum(cnt * cnt) AS BIGINT) AS ss
  FROM daily
)
SELECT n AS bucket_count, mn AS min_count, mx AS max_count, s AS sum_count,
       round(CAST(s AS DOUBLE) / n, 6) AS avg_count,
       round((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n, 6)
         AS variance,
       round(sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n), 6)
         AS std_deviation
FROM wide
"""
