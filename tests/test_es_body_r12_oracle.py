"""DuckDB oracle parity for the r12 wave-2/3 door types that don't have
catalog rows yet (cumulative_cardinality, rate, extended_stats_bucket,
terms order, top_metrics) — the r9→r10 pattern: pytest parity this
round, catalog registration declared as r13 debt. Uses the driver's own
comparison (tests.oracle_harness.compare_query: sorted columns,
order-insensitive rowset, bit-exact floats)."""

from __future__ import annotations

from pandemic_knowledge_spark.tables import load
from tests.oracle_harness import compare_query


def _run(spark, sf_dir, fn, sql):
    errs, cnt = compare_query(spark, sf_dir, fn, sql)
    assert not errs, errs
    assert cnt > 0


def test_cumulative_cardinality_oracle(spark, sf_dir):
    from pandemic_knowledge_spark.operators.esdsl import es_aggs

    def fn(spark, sf_dir):
        return es_aggs(load(spark, sf_dir, "events"), {"aggs": {"daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day",
                               "min_doc_count": 0},
            "aggs": {
                "u": {"cardinality": {"field": "user_id"}},
                "cu": {"cumulative_cardinality": {"buckets_path": "u"}},
            }}}})["daily"]

    _run(spark, sf_dir, fn, """
WITH d AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS key,
         CAST(count(*) AS BIGINT) AS doc_count,
         CAST(count(DISTINCT user_id) AS BIGINT) AS u
  FROM events GROUP BY 1
), b AS (SELECT min(key) AS lo, max(key) AS hi FROM d),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS key FROM b
), dense AS (
  SELECT spine.key, CAST(coalesce(d.doc_count, 0) AS BIGINT) AS doc_count,
         d.u
  FROM spine LEFT JOIN d USING (key)
), firsts AS (
  SELECT min(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS key
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
), new_per AS (
  SELECT key, CAST(count(*) AS BIGINT) AS nw FROM firsts GROUP BY 1
)
SELECT dense.key, dense.doc_count, dense.u,
       CAST(sum(coalesce(new_per.nw, 0)) OVER (ORDER BY dense.key)
            AS BIGINT) AS cu
FROM dense LEFT JOIN new_per USING (key) ORDER BY key
""")


def test_rate_oracle(spark, sf_dir):
    from pandemic_knowledge_spark.operators.esdsl import es_aggs

    def fn(spark, sf_dir):
        return es_aggs(load(spark, sf_dir, "orders"), {"aggs": {"pm": {
            "date_histogram": {"field": "o_orderdate",
                               "calendar_interval": "month"},
            "aggs": {
                "docs_day": {"rate": {"unit": "day"}},
                "keys_day": {"rate": {"unit": "day",
                                      "field": "o_custkey"}},
            }}}})["pm"]

    days = ("CAST(date_diff('day', CAST(key AS DATE), "
            "CAST(key + INTERVAL 1 MONTH AS DATE)) AS DOUBLE)")
    _run(spark, sf_dir, fn, f"""
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS key,
         CAST(count(*) AS BIGINT) AS doc_count,
         CAST(sum(o_custkey) AS BIGINT) AS s
  FROM orders GROUP BY 1
)
SELECT key, doc_count,
       round(doc_count / {days}, 6) AS docs_day,
       round(s / {days}, 6) AS keys_day
FROM m ORDER BY key
""")


def test_extended_stats_bucket_oracle(spark, sf_dir):
    from pandemic_knowledge_spark.operators.esdsl import es_aggs

    def fn(spark, sf_dir):
        return es_aggs(load(spark, sf_dir, "orders"), {"aggs": {
            "pm": {"date_histogram": {"field": "o_orderdate",
                                      "calendar_interval": "month"}},
            "spread": {"extended_stats_bucket": {
                "buckets_path": "pm>_count"}},
        }})["spread"]

    _run(spark, sf_dir, fn, """
WITH m AS (
  SELECT CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY date_trunc('month', o_orderdate)
), wide AS (
  SELECT CAST(count(*) AS BIGINT) AS c, CAST(min(n) AS BIGINT) AS mn,
         CAST(max(n) AS BIGINT) AS mx, CAST(sum(n) AS BIGINT) AS s,
         CAST(sum(n * n) AS BIGINT) AS ss
  FROM m
)
SELECT c AS "count", mn AS "min", mx AS "max",
       round(CAST(s AS DOUBLE) / c, 6) AS "avg", s AS "sum",
       round(CAST(ss AS DOUBLE), 6) AS sum_of_squares,
       round((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / c) / c, 6)
         AS variance,
       round(sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / c) / c), 6)
         AS std_deviation,
       round(CAST(s AS DOUBLE) / c
             + 2.0 * sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / c)
                          / c), 6) AS std_upper,
       round(CAST(s AS DOUBLE) / c
             - 2.0 * sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / c)
                          / c), 6) AS std_lower
FROM wide
""")


def test_filter_wrapper_oracle(spark, sf_dir):
    """Kibana's per-panel `filter` wrapper around a date_histogram,
    composed with a request query — bit-exact vs DuckDB."""
    from pandemic_knowledge_spark.operators.esdsl import es_aggs

    def fn(spark, sf_dir):
        return es_aggs(load(spark, sf_dir, "events"), {
            "query": {"range": {"value": {"gte": 10}}},
            "aggs": {"purch": {
                "filter": {"term": {"event_type": "purchase"}},
                "aggs": {"daily": {"date_histogram": {
                    "field": "ts", "calendar_interval": "month"}}},
            }},
        })["purch"]

    _run(spark, sf_dir, fn, """
SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS key,
       CAST(count(*) AS BIGINT) AS doc_count
FROM events
WHERE value >= 10 AND event_type = 'purchase'
GROUP BY 1 ORDER BY key
""")


def test_multi_match_field_boosts_oracle(spark, sf_dir):
    """multi_match with per-field boosts (title^3) through the body door
    vs the boosted DuckDB twin — both best_fields and most_fields."""
    from pyspark.sql import functions as F

    from pandemic_knowledge_spark.operators.esdsl import es_query
    from pandemic_knowledge_spark.operators.search import (
        sql_bm25_search_fields,
    )

    def make_fn(mm_type):
        def fn(spark, sf_dir):
            d = load(spark, sf_dir, "documents").select(
                "doc_id",
                F.expr("substr(text, 1, 80)").alias("title"),
                F.expr("substr(text, 81)").alias("body"),
            )
            return es_query(d, "doc_id", "title", {
                "query": {"multi_match": {
                    "query": "spark join stream window",
                    "type": mm_type,
                    "fields": ["title^3", "body"],
                }},
                "size": 10,
            })
        return fn

    exprs = {"title": "substr(text, 1, 80)", "body": "substr(text, 81)"}
    for mm_type in ("best_fields", "most_fields"):
        _run(spark, sf_dir, make_fn(mm_type), sql_bm25_search_fields(
            "documents", "doc_id", exprs, "spark join stream window",
            k=10, mode=mm_type, boosts={"title": 3.0},
        ))


def test_significant_terms_field_oracle(spark, sf_dir):
    from pandemic_knowledge_spark.operators.aggregates import (
        sql_significant_terms_field,
    )
    from pandemic_knowledge_spark.operators.esdsl import es_aggs

    def fn(spark, sf_dir):
        return es_aggs(load(spark, sf_dir, "documents"), {
            "query": {"range": {"n_chars": {"gte": 400}}},
            "aggs": {"sig": {"significant_terms": {
                "field": "lang", "size": 5, "min_doc_count": 1}}},
        }, text_col="text")["sig"]

    _run(spark, sf_dir, fn, sql_significant_terms_field(
        "documents", "lang", "coalesce(n_chars >= 400, FALSE)",
        top_k=5, min_doc_count=1,
    ))


def test_terms_order_top_metrics_oracle(spark, sf_dir):
    from pandemic_knowledge_spark.operators.esdsl import es_aggs

    def fn(spark, sf_dir):
        return es_aggs(load(spark, sf_dir, "events"), {"aggs": {"t": {
            "terms": {"field": "event_type", "size": 3,
                      "order": {"vmax": "desc"}},
            "aggs": {
                "vmax": {"max": {"field": "value"}},
                "latest": {"top_metrics": {
                    "metrics": [{"field": "value"}],
                    "sort": [{"ts": "desc"}]}},
            }}}})["t"]

    _run(spark, sf_dir, fn, """
WITH g AS (
  SELECT event_type AS key, CAST(count(*) AS BIGINT) AS doc_count,
         max(value) AS vmax
  FROM events GROUP BY 1
), w AS (
  SELECT event_type AS key, value AS latest_value,
         row_number() OVER (
           PARTITION BY event_type ORDER BY ts DESC, value DESC
         ) AS rn
  FROM events
)
SELECT g.key, g.doc_count, g.vmax, w.latest_value
FROM g JOIN w USING (key) WHERE w.rn = 1
ORDER BY g.vmax DESC, g.key LIMIT 3
""")
