"""Relevance-ranked full-text search (SURVEY.md §2.9 X3).

Replaces the capability the reference delegates to Elasticsearch
(`multi_match best_fields lenient`,
/root/reference/news_app/app/app/src/SearchUI.js:22-27) with a BM25 scorer
built from DataFrame primitives: explode tokens → per-(doc,term) TF →
per-term DF → idf join → score → top-k.

Scale shape: the TF table is one shuffle on doc_id (map-side combined);
the DF table is a shuffle on term; the query-term join is a broadcast (a
query has a handful of terms). At interactive scale, TF/DF tables are
precomputed per ingest and cached/persisted — the Spark analogue of ES's
inverted index (SURVEY.md §4.2).

Corpus stats (N, avgdl) are computed as exact integer sums so Spark and
the DuckDB oracle agree bit-for-bit; scores round to 4 dp before ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandemic_knowledge_spark.functions.text import tokenize

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_search(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query: str,
    k: int = 10,
) -> DataFrame:
    """BM25 top-k: (doc_id, score) for docs matching >= 1 query term.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5))  [Robertson-Sparck Jones, the
    Lucene/ES formula]; tf component uses k1=1.2, b=0.75.
    """
    q_terms = sorted(set(query.lower().split()))
    base = docs.select(
        F.col(id_col).alias("doc_id"), tokenize(text_col).alias("toks")
    ).withColumn("dl", F.size("toks"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(q_terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("avgdl", F.col("sum_dl").cast("double") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (BM25_K1 + 1))
            / (F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 4).alias("score"))
        .orderBy(F.desc("score"), F.col("doc_id"))
        .limit(k)
    )


def bm25_search_fields(
    docs: DataFrame,
    id_col: str,
    field_cols: list[str],
    query: str,
    k: int = 10,
    tie_breaker: float = 0.0,
) -> DataFrame:
    """Multi-field ``best_fields`` BM25 top-k — the reference's search shape
    (`multi_match` with `type: best_fields, lenient: true` over all fields,
    /root/reference/news_app/app/app/src/SearchUI.js:22-27): each field is
    scored as its own BM25 corpus (own N, avgdl, per-term df — ES's
    per-field inverted index), a doc's score is its BEST single field
    (`greatest` across fields), plus ``tie_breaker`` × the other fields'
    scores (ES semantics; default 0 = pure best_fields).

    Plan shape: ONE scan of the docs (all fields tokenized in a single
    projection, then an explode over a literal field array — no per-field
    re-scan), one shuffle to (field, doc, term) TF, a broadcast of the tiny
    per-(field, term) DF and per-field stats, and a final per-doc agg.
    Candidate rows are only docs matching >= 1 query term in >= 1 field, so
    the expensive stages are bounded by matches, not corpus size.
    """
    q_terms = sorted(set(query.lower().split()))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        *[tokenize(c).alias(f"__toks_{i}") for i, c in enumerate(field_cols)],
    )
    field_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("field"), F.col(f"__toks_{i}").alias("toks")
            )
            for i, c in enumerate(field_cols)
        ]
    )
    long = (
        base.select("doc_id", F.explode(field_structs).alias("fx"))
        .select("doc_id", F.col("fx.field").alias("field"), F.col("fx.toks").alias("toks"))
        .withColumn("dl", F.size("toks"))
    )
    stats = long.groupBy("field").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        long.select("field", "doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(q_terms))
        .groupBy("field", "doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("field", "term").agg(F.countDistinct("doc_id").alias("df"))
    field_scores = (
        tf.join(F.broadcast(df_t), ["field", "term"])
        .join(F.broadcast(stats), "field")
        .withColumn("avgdl", F.col("sum_dl").cast("double") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (BM25_K1 + 1))
            / (F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id", "field")
        .agg(F.round(F.sum("term_score"), 4).alias("field_score"))
    )
    return (
        field_scores.groupBy("doc_id")
        .agg(
            F.max("field_score").alias("__best"),
            F.sum("field_score").alias("__total"),
        )
        .select(
            "doc_id",
            F.round(
                F.col("__best") + F.lit(tie_breaker) * (F.col("__total") - F.col("__best")),
                4,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.col("doc_id"))
        .limit(k)
    )


def sql_bm25_search_fields(
    table: str,
    id_col: str,
    field_exprs: dict[str, str],
    query: str,
    k: int = 10,
    tie_breaker: float = 0.0,
) -> str:
    """DuckDB SQL reproducing :func:`bm25_search_fields` exactly.

    ``field_exprs`` maps field name → SQL expression deriving that field's
    text from the table's columns (must match the Spark-side derivation).
    """
    q_terms = sorted(set(query.lower().split()))
    terms_list = ", ".join(f"'{t}'" for t in q_terms)
    branches = " UNION ALL ".join(
        f"SELECT {id_col} AS doc_id, '{name}' AS field, "
        f"regexp_extract_all(lower({expr}), '[a-z0-9]+') AS toks FROM {table}"
        for name, expr in field_exprs.items()
    )
    return f"""
WITH long AS (
  SELECT doc_id, field, toks, len(toks) AS dl FROM ({branches})
), stats AS (
  SELECT field, count(*) AS n_docs, sum(dl) AS sum_dl FROM long GROUP BY field
), tf AS (
  SELECT field, doc_id, dl, term, count(*) AS tf
  FROM (SELECT field, doc_id, dl, unnest(toks) AS term FROM long)
  WHERE term IN ({terms_list})
  GROUP BY field, doc_id, dl, term
), dft AS (
  SELECT field, term, count(DISTINCT doc_id) AS df FROM tf GROUP BY field, term
), fscore AS (
  SELECT tf.doc_id, tf.field,
         round(sum(
           ln(1.0 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
           * (tf.tf * ({BM25_K1} + 1))
           / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * tf.dl / (CAST(stats.sum_dl AS DOUBLE) / stats.n_docs)))
         ), 4) AS field_score
  FROM tf
  JOIN dft ON tf.field = dft.field AND tf.term = dft.term
  JOIN stats ON tf.field = stats.field
  GROUP BY tf.doc_id, tf.field
)
SELECT doc_id,
       round(max(field_score) + {tie_breaker} * (sum(field_score) - max(field_score)), 4) AS score
FROM fscore GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT {k}
"""


def sql_bm25_search(table: str, id_col: str, text_col: str, query: str, k: int = 10) -> str:
    """DuckDB SQL reproducing :func:`bm25_search` exactly."""
    q_terms = sorted(set(query.lower().split()))
    terms_list = ", ".join(f"'{t}'" for t in q_terms)
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         regexp_extract_all(lower({text_col}), '[a-z0-9]+') AS toks
  FROM {table}
), base2 AS (
  SELECT doc_id, toks, len(toks) AS dl FROM base
), stats AS (
  SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM base2
), tf AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM base2)
  WHERE term IN ({terms_list})
  GROUP BY doc_id, dl, term
), dft AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id,
         ln(1.0 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
         * (tf.tf * ({BM25_K1} + 1))
         / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * tf.dl / (CAST(stats.sum_dl AS DOUBLE) / stats.n_docs)))
         AS term_score
  FROM tf, dft, stats
  WHERE tf.term = dft.term
)
SELECT doc_id, round(sum(term_score), 4) AS score
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT {k}
"""
