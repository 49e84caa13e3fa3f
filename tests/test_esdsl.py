"""The ES request-body door (operators.esdsl.es_query): real ES JSON
bodies route onto the engine's doors and return the identical pages the
direct door calls return — including the reference's own SearchUI
queryBuilder shape, bool.filter[multi_match]. Unsupported constructs must
raise UnsupportedEsQuery with the failing JSON path, never approximate."""

from __future__ import annotations

import pytest

from pandemic_knowledge_spark.engine import Engine
from pandemic_knowledge_spark.operators.boolquery import (
    bool_search,
    dis_max_search,
    function_score_search,
)
from pandemic_knowledge_spark.operators.esdsl import (
    UnsupportedEsQuery,
    es_query,
)
from pandemic_knowledge_spark.operators.search import (
    bm25_search,
    span_near_search,
    wildcard_search,
)
from pandemic_knowledge_spark.tables import load


def rows(df):
    return sorted(map(tuple, df.collect()))


def test_reference_searchui_shape(spark, sf_dir):
    """The exact body the reference's queryBuilder emits —
    bool.filter[multi_match] (SearchUI.js:15-33) — must run and equal the
    equivalent direct bool door call."""
    docs = load(spark, sf_dir, "documents")
    body = {
        "query": {
            "bool": {
                "must": [{"multi_match": {"query": "spark stream",
                                          "fields": ["text"],
                                          "type": "best_fields"}}],
                "filter": [{"term": {"text": "table"}}],
            }
        },
        "size": 10,
    }
    got = rows(es_query(docs, "doc_id", "text", body))
    want = rows(bool_search(docs, "doc_id", "text",
                            must=[{"match": "spark stream"}],
                            filter=[{"term": "table"}], k=10))
    assert got == want and got


def test_bool_body_full_clause_mix(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    body = {
        "query": {
            "bool": {
                "must": [{"match": {"text": {"query": "spark stream",
                                             "operator": "and"}}}],
                "should": [
                    {"match_phrase": {"text": {"query": "fast scan",
                                               "slop": 2, "boost": 1.5}}},
                    {"constant_score": {"filter": {"term": {"text": "table"}},
                                        "boost": 2.0}},
                ],
                "must_not": [{"term": {"text": "vector"}}],
                "filter": [{"range": {"n_chars": {"gte": 100, "lt": 500}}},
                           {"exists": {"field": "lang"}}],
            }
        },
        "size": 12,
    }
    got = rows(es_query(docs, "doc_id", "text", body))
    want = rows(bool_search(
        docs, "doc_id", "text",
        must=[{"match": "spark stream", "operator": "and"}],
        should=[{"phrase": "fast scan", "slop": 2, "boost": 1.5},
                {"constant_score": {"term": "table"}, "boost": 2.0}],
        must_not=[{"term": "vector"}],
        filter=[{"range": {"n_chars": {"gte": 100, "lt": 500}}},
                {"exists": {"field": "lang"}}],
        k=12,
    ))
    assert got == want and got


def test_top_level_leaves_and_compounds(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    # bare match == implicit bool should
    got = rows(es_query(docs, "doc_id", "text",
                        {"query": {"match": {"text": "spark stream"}},
                         "size": 8}))
    want = rows(bool_search(docs, "doc_id", "text",
                            should=[{"match": "spark stream"}],
                            minimum_should_match=1, k=8))
    assert got == want
    # dis_max
    got = rows(es_query(docs, "doc_id", "text", {
        "query": {"dis_max": {
            "queries": [{"match": {"text": "spark stream"}},
                        {"match_phrase": {"text": "fast scan"}}],
            "tie_breaker": 0.3,
        }}, "size": 10}))
    want = rows(dis_max_search(
        docs, "doc_id", "text",
        [{"match": "spark stream"}, {"phrase": "fast scan"}],
        tie_breaker=0.3, k=10))
    assert got == want
    # function_score
    fs_body = {
        "query": {"function_score": {
            "query": {"match": {"text": "spark stream"}},
            "functions": [
                {"field_value_factor": {"field": "n_chars", "factor": 0.01,
                                        "modifier": "log1p", "missing": 1.0}},
                {"weight": 2.0, "filter": {"term": {"text": "table"}}},
            ],
            "max_boost": 8.0,
        }}, "size": 10}
    got = rows(es_query(docs, "doc_id", "text", fs_body))
    want = rows(function_score_search(
        docs, "doc_id", "text", {"match": "spark stream"},
        [{"field_value_factor": {"field": "n_chars", "factor": 0.01,
                                 "modifier": "log1p", "missing": 1.0}},
         {"weight": 2.0, "filter": {"term": "table"}}],
        max_boost=8.0, k=10))
    assert got == want
    # wildcard + span_near
    got = rows(es_query(docs, "doc_id", "text",
                        {"query": {"wildcard": {"text": {"value": "str*"}}},
                         "size": 10}))
    want = rows(wildcard_search(docs, "doc_id", "text", "str*", k=10))
    assert got == want
    got = rows(es_query(docs, "doc_id", "text", {
        "query": {"span_near": {
            "clauses": [{"span_term": {"text": "spark"}},
                        {"span_term": {"text": {"value": "stream"}}}],
            "slop": 3, "in_order": True,
        }}, "size": 15}))
    want = rows(span_near_search(docs, "doc_id", "text", "spark stream",
                                 slop=3, k=15))
    assert got == want


def test_from_size_offset_paging(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    full = bm25_search(docs, "doc_id", "text", "spark stream", k=9).collect()
    page2 = es_query(docs, "doc_id", "text",
                     {"query": {"match": {"text": "spark stream"}},
                      "size": 3, "from": 6}).collect()
    assert [tuple(r) for r in page2] == [tuple(r) for r in full[6:9]]


def test_match_all(spark):
    docs = spark.createDataFrame(
        [(i, "x") for i in range(7)], "doc_id long, text string"
    )
    got = es_query(docs, "doc_id", "text",
                   {"query": {"match_all": {}}, "size": 5}).collect()
    assert [r["doc_id"] for r in got] == [0, 1, 2, 3, 4]
    assert all(r["score"] == 0.0 for r in got)


def test_unsupported_paths_are_named(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(UnsupportedEsQuery, match=r"\$\.query\.bool\.must\[0\]"):
        es_query(docs, "doc_id", "text",
                 {"query": {"bool": {"must": [{"bool": {}}]}}})
    with pytest.raises(UnsupportedEsQuery, match="knn"):
        es_query(docs, "doc_id", "text", {"query": {"knn": {}}})
    with pytest.raises(UnsupportedEsQuery, match="fuzziness"):
        es_query(docs, "doc_id", "text",
                 {"query": {"bool": {"must": [
                     {"fuzzy": {"text": {"value": "a", "fuzziness": 1}}}]}}})
    with pytest.raises(UnsupportedEsQuery, match="unsupported options"):
        es_query(docs, "doc_id", "text",
                 {"query": {"match": {"text": {"query": "a",
                                               "analyzer": "english"}}}})
    with pytest.raises(UnsupportedEsQuery, match="top-level"):
        es_query(docs, "doc_id", "text",
                 {"query": {"bool": {"must": [{"multi_match": {
                     "query": "a", "fields": ["text", "lang"]}}]}}})


def test_engine_facade(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    body = {"query": {"bool": {
        "must": [{"match": {"text": "spark stream"}}],
        "filter": [{"range": {"n_chars": {"gte": 120}}}],
    }}, "size": 10}
    got = rows(eng.es_query(body))
    want = rows(es_query(load(spark, sf_dir, "documents"),
                         "doc_id", "text", body))
    assert got == want and got


def test_missing_required_keys_raise_pathed_errors(spark):
    """Malformed bodies (missing required keys) raise UnsupportedEsQuery
    carrying the JSON path — never a raw KeyError."""
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    for body, frag in [
        ({"query": {"dis_max": {}}}, "queries"),
        ({"query": {"function_score": {}}}, "query"),
        ({"query": {"exists": {}}}, "field"),
        ({"query": {"bool": {"must": [{"term": {"text": {"boost": 2}}}]}}},
         "value"),
        ({"query": {"span_near": {"clauses": [{"span_term": {"t": {}}}]}}},
         "value"),
        ({"size": 3}, "query"),
    ]:
        with pytest.raises(UnsupportedEsQuery, match=frag):
            es_query(docs, "doc_id", "text", body)


# ------------------------------------------------------------ aggregations


def test_es_aggs_kibana_dashboard_body(spark, sf_dir):
    """The Kibana shape: filter + date_histogram + metric sub-aggs equals
    the direct groupBy."""
    from pandemic_knowledge_spark.operators.esdsl import es_aggs
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events")
    body = {
        "query": {"bool": {"must_not": [{"term": {"event_type": "signup"}}]}},
        "aggs": {"per_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"users": {"cardinality": {"field": "user_id"}},
                     "max_value": {"max": {"field": "value"}}},
        }},
    }
    got = rows(es_aggs(ev, body)["per_day"])
    want = rows(
        ev.where(~F.coalesce(F.col("event_type") == "signup", F.lit(False)))
        .groupBy(F.date_trunc("day", "ts").alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"),
             F.countDistinct("user_id").alias("users"),
             F.max("value").alias("max_value"))
        .orderBy("key")
    )
    assert got == want and got


def test_es_aggs_terms_histogram_range(spark):
    from pandemic_knowledge_spark.operators.esdsl import es_aggs

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 15.0), (3, "b", 25.0), (4, "b", None),
         (5, "c", 35.0)],
        "id long, kind string, v double",
    )
    out = es_aggs(df, {"aggs": {
        "kinds": {"terms": {"field": "kind", "size": 2},
                  "aggs": {"v_count": {"value_count": {"field": "v"}}}},
        "v_hist": {"histogram": {"field": "v", "interval": 10.0}},
        "v_ranges": {"range": {"field": "v", "ranges": [
            {"to": 10.0}, {"from": 10.0, "to": 30.0}, {"from": 30.0}]}},
    }})
    kinds = [(r["key"], r["doc_count"], r["v_count"])
             for r in out["kinds"].collect()]
    assert kinds == [("a", 2, 2), ("b", 2, 1)]  # count desc, key asc, size 2
    hist = [(r["key"], r["doc_count"]) for r in out["v_hist"].collect()]
    assert hist == [(0.0, 1), (10.0, 1), (20.0, 1), (30.0, 1)]  # nulls out
    ranges = {r["key"]: r["doc_count"] for r in out["v_ranges"].collect()}
    # ES bounds: from inclusive, to exclusive; nulls never bucket
    assert ranges == {"*-10.0": 1, "10.0-30.0": 2, "30.0-*": 1}


def test_es_aggs_filter_semantics(spark):
    from pandemic_knowledge_spark.operators.esdsl import es_aggs

    df = spark.createDataFrame(
        [(1, "x", "apple pie", 5), (2, "y", "apple tart", 50),
         (3, "x", "pear pie", 50), (4, None, "apple", 50)],
        "id long, kind string, text string, n long",
    )
    # recursive bool, text term (analyzed membership) + field range +
    # must_not over a NULL field keeps the doc
    body = {
        "query": {"bool": {
            "must": [{"term": {"text": "apple"}}],
            "filter": [{"range": {"n": {"gte": 10}}}],
            "must_not": [{"term": {"kind": "y"}}],
        }},
        "aggs": {"n_ids": {"terms": {"field": "id", "size": 10}}},
    }
    got = {r["key"] for r in
           es_aggs(df, body, text_col="text")["n_ids"].collect()}
    assert got == {4}  # 1 fails range, 2 is must_not'd, 3 lacks 'apple';
    # 4's NULL kind must be KEPT by the must_not (ES missing-field rule)


def test_es_aggs_errors_are_pathed(spark):
    from pandemic_knowledge_spark.operators.esdsl import es_aggs

    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    with pytest.raises(UnsupportedEsQuery, match="aggs"):
        es_aggs(df, {"query": {"match_all": {}}})
    with pytest.raises(UnsupportedEsQuery, match="percentiles"):
        es_aggs(df, {"aggs": {"p": {"terms": {"field": "id"}, "aggs": {
            "q": {"percentiles": {"field": "v"}}}}}})
    with pytest.raises(UnsupportedEsQuery, match="composite"):
        es_aggs(df, {"aggs": {"c": {"composite": {"sources": []}}}})
    with pytest.raises(UnsupportedEsQuery, match="text column"):
        es_aggs(df, {"query": {"match": {"t": "x"}},
                     "aggs": {"a": {"terms": {"field": "id"}}}})


def test_es_aggs_engine_facade(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    body = {"aggs": {"by_type": {"terms": {"field": "event_type",
                                           "size": 3}}}}
    got = rows(eng.es_aggs(body)["by_type"])
    from pandemic_knowledge_spark.operators.esdsl import es_aggs

    want = rows(es_aggs(load(spark, sf_dir, "events"), body)["by_type"])
    assert got == want and got


def test_es_aggs_filters_buckets(spark):
    from pandemic_knowledge_spark.operators.esdsl import es_aggs

    df = spark.createDataFrame(
        [(1, "apple pie", 10.0), (2, "apple tart", 30.0),
         (3, "pear pie", 30.0), (4, "fig", 5.0)],
        "id long, text string, v double",
    )
    out = es_aggs(df, {"aggs": {"panels": {
        "filters": {
            "filters": {
                "apples": {"term": {"text": "apple"}},
                "big": {"range": {"v": {"gte": 20.0}}},
            },
            "other_bucket_key": "rest",
        },
        "aggs": {"v_max": {"max": {"field": "v"}}},
    }}}, text_col="text")["panels"]
    got = [(r["key"], r["doc_count"], r["v_max"]) for r in out.collect()]
    # declaration order; doc 2 lands in BOTH buckets (ES semantics);
    # doc 4 matches none -> other bucket
    assert got == [("apples", 2, 30.0), ("big", 2, 30.0), ("rest", 1, 5.0)]


# --------------------------------------------------- r11 ADVICE regressions


def test_top_level_term_query_scores_constant(spark, sf_dir):
    """ADVICE r10: a bare top-level {"query": {"term": ...}} must run (it
    is listed as supported), routing as constant_score(term) — on an ES
    keyword field norms are off and tf=1, so every matching doc scores
    the same constant; rank-identical, magnitude = boost."""
    docs = load(spark, sf_dir, "documents")
    body = {"query": {"term": {"text": {"value": "spark", "boost": 2.0}}},
            "size": 10}
    got = rows(es_query(docs, "doc_id", "text", body))
    want = rows(bool_search(
        docs, "doc_id", "text",
        should=[{"constant_score": {"term": "spark"}, "boost": 2.0}],
        minimum_should_match=1, k=10,
    ))
    assert got == want and got
    assert {s for _, s in got} == {2.0}


def test_term_inside_bool_scored_context(spark, sf_dir):
    """term in bool must/should wraps to constant_score; in filter /
    must_not it stays a raw membership test (no score contribution)."""
    docs = load(spark, sf_dir, "documents")
    body = {"query": {"bool": {
        "must": [{"term": {"text": "spark"}}],
        "should": [{"term": {"text": {"value": "stream", "boost": 3.0}}}],
    }}, "size": 10}
    got = rows(es_query(docs, "doc_id", "text", body))
    want = rows(bool_search(
        docs, "doc_id", "text",
        must=[{"constant_score": {"term": "spark"}}],
        should=[{"constant_score": {"term": "stream"}, "boost": 3.0}],
        k=10,
    ))
    assert got == want and got


def test_top_level_multi_match_honors_operator(spark, sf_dir):
    """ADVICE r10: top-level multi_match must honor operator /
    minimum_should_match on the single-field best_fields collapse instead
    of silently returning the any-term doc set."""
    docs = load(spark, sf_dir, "documents")
    body_and = {"query": {"multi_match": {
        "query": "spark stream", "fields": ["text"], "operator": "and",
    }}, "size": 200}
    got = rows(es_query(docs, "doc_id", "text", body_and))
    want = rows(bool_search(
        docs, "doc_id", "text",
        should=[{"match": "spark stream", "operator": "and"}],
        minimum_should_match=1, k=200,
    ))
    assert got == want and got
    # and the AND doc set is exactly the docs holding BOTH tokens — the
    # any-term approximation the silent path returned would include
    # single-token docs
    from pyspark.sql import functions as F

    from pandemic_knowledge_spark.functions.text import tokenize

    both = {
        r["doc_id"]
        for r in docs.where(
            F.array_contains(tokenize("text"), "spark")
            & F.array_contains(tokenize("text"), "stream")
        ).select("doc_id").collect()
    }
    page_ids = {d for d, _ in got}
    assert page_ids <= both
    assert len(got) == min(200, len(both))


def test_top_level_multi_match_rejects_unknown_options(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    with pytest.raises(UnsupportedEsQuery, match="fuzziness"):
        es_query(docs, "doc_id", "text", {"query": {"multi_match": {
            "query": "spark", "fields": ["text"], "fuzziness": "AUTO",
        }}})
    with pytest.raises(UnsupportedEsQuery, match="single-field"):
        es_query(docs, "doc_id", "text", {"query": {"multi_match": {
            "query": "spark", "fields": ["text", "lang"],
            "operator": "and",
        }}})


def test_bool_multi_match_single_field_boost_folds(spark, sf_dir):
    """ADVICE r10: fields: ["text^3"] inside bool multiplies the clause
    score by 3 (single field — an exact fold), never silently strips."""
    docs = load(spark, sf_dir, "documents")
    boosted = {"query": {"bool": {"must": [{"multi_match": {
        "query": "spark stream", "fields": ["text^3"],
    }}]}}, "size": 10}
    plain = {"query": {"bool": {"must": [{"multi_match": {
        "query": "spark stream", "fields": ["text"],
    }}]}}, "size": 10}
    got = dict(rows(es_query(docs, "doc_id", "text", boosted)))
    base = dict(rows(es_query(docs, "doc_id", "text", plain)))
    assert set(got) == set(base) and got
    for d, s in got.items():
        # scores round to 4 dp on both sides, so the fold is exact up to
        # 3x a half-ulp of the base rounding
        assert abs(s - 3.0 * base[d]) < 2e-4


def test_nested_bool_allowed_inside_filter_subtree(spark, sf_dir):
    """ADVICE r10: an ES-valid filter tree with bool under must INSIDE a
    filter occurrence (pure membership all the way down) must compile."""
    docs = load(spark, sf_dir, "documents")
    body = {"query": {"bool": {
        "must": [{"match": {"text": "spark"}}],
        "filter": [{"bool": {"must": [{"bool": {"should": [
            {"term": {"text": "stream"}},
            {"range": {"n_chars": {"gte": 500}}},
        ]}}]}}],
    }}, "size": 50}
    got = rows(es_query(docs, "doc_id", "text", body))
    # flat equivalent: filter on (stream-token OR n_chars>=500)
    want = rows(bool_search(
        docs, "doc_id", "text",
        must=[{"match": "spark"}],
        filter=[{"bool": {"should": [
            {"term": "stream"}, {"range": {"n_chars": {"gte": 500}}},
        ]}}],
        k=50,
    ))
    assert got == want and got
    # scored contexts OUTSIDE a membership subtree still reject nesting
    with pytest.raises(UnsupportedEsQuery, match="SCORED"):
        es_query(docs, "doc_id", "text", {"query": {"bool": {
            "must": [{"bool": {"must": [{"match": {"text": "spark"}}]}}],
        }}})
