"""r12 body-door widening: Engine.es_search rejects unknown top-level
keys (the r11 judge's confirmed silent-drop defect) and the previously
dropped keys now ROUTE — post_filter / track_total_hits / search_after /
collapse / highlight — plus the new leaves (match_phrase_prefix /
match_bool_prefix / significant_text) and ES 8's retriever.rrf tree.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandemic_knowledge_spark.engine import Engine
from pandemic_knowledge_spark.operators.esdsl import (
    UnsupportedEsQuery,
    es_aggs,
    es_query,
)
from pandemic_knowledge_spark.tables import load


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark, sf_dir)


def rows(df):
    return [tuple(r) for r in df.collect()]


# --------------------------------------------------- es_search hardening


def test_es_search_rejects_unknown_body_keys(engine):
    """The r11 judge repro: a body with an unsupported top-level key must
    raise with the path, never run with silently different semantics.
    Only genuinely UNSUPPORTED keys belong here (suggest/rescore moved
    to their own suites when they became supported — r12 advisor: their
    presence made this test pass for the wrong reason)."""
    for bad in ("explain", "pit", "indices_boost", "stored_fields"):
        with pytest.raises(UnsupportedEsQuery, match=r"unsupported"):
            engine.es_search({"query": {"match": {"text": "spark"}},
                              bad: {"x": 1}})


def test_es_search_rejects_aggs_next_to_knn(engine):
    """ES scopes aggs to query matches + top-k knn hits; aggregating the
    unfiltered table diverges arbitrarily — refuse (r11 advisor)."""
    emb = engine.table("embeddings")
    vec = emb.first()["embedding"]
    with pytest.raises(UnsupportedEsQuery, match="next to knn"):
        engine.es_search({
            "knn": {"field": "embedding", "query_vector": vec, "k": 5},
            "aggs": {"n": {"value_count": {"field": "doc_id"}}},
        })


def test_es_search_hybrid_gates_match_field(engine):
    """A hybrid BM25 arm naming a metadata field must not silently score
    the text column (r11 advisor); a missing query key is a pathed error,
    not a KeyError."""
    emb = engine.table("embeddings")
    vec = emb.first()["embedding"]
    knn = {"field": "embedding", "query_vector": vec, "k": 5}
    with pytest.raises(UnsupportedEsQuery, match="text column"):
        engine.es_search({"knn": knn, "query": {"match": {"lang": "en"}},
                          "rank": {"rrf": {}}})
    with pytest.raises(UnsupportedEsQuery, match="missing required key"):
        engine.es_search({"knn": knn,
                          "query": {"match": {"text": {"boost": 2.0}}},
                          "rank": {"rrf": {}}})


# ------------------------------------------------------------ post_filter


def test_post_filter_narrows_hits_not_aggs(engine, spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    body = {
        "query": {"match": {"text": "spark stream"}},
        "post_filter": {"term": {"lang": "en"}},
        "size": 10,
        "aggs": {"by_lang": {"terms": {"field": "lang", "size": 5}}},
    }
    out = engine.es_search(body, table="documents")
    hits = out["hits"].collect()
    assert hits
    # hits respect the post_filter ...
    langs = {
        r["lang"]
        for r in docs.join(
            spark.createDataFrame([(h["doc_id"],) for h in hits],
                                  "doc_id long"), "doc_id"
        ).select("lang").collect()
    }
    assert langs == {"en"}
    # ... scores are the UNfiltered query's scores (post_filter never
    # touches scoring) ...
    plain = {r["doc_id"]: r["score"] for r in es_query(
        docs, "doc_id", "text",
        {"query": {"match": {"text": "spark stream"}}, "size": 10_000}
    ).collect()}
    for h in hits:
        assert plain[h["doc_id"]] == h["score"]
    # ... and the aggs stay WIDE (ES post_filter scope: facet counts over
    # all query matches, not the post-filtered page)
    agg_langs = {r["key"] for r in out["by_lang"].collect()}
    assert len(agg_langs) > 1


def test_post_filter_folds_into_existing_bool(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    got = es_query(docs, "doc_id", "text", {
        "query": {"bool": {"must": [{"match": {"text": "spark"}}],
                           "filter": [{"range": {"n_chars": {"gte": 200}}}]},
                  },
        "post_filter": {"term": {"lang": "en"}},
        "size": 10,
    })
    want = es_query(docs, "doc_id", "text", {
        "query": {"bool": {"must": [{"match": {"text": "spark"}}],
                           "filter": [{"range": {"n_chars": {"gte": 200}}},
                                      {"term": {"lang": "en"}}]}},
        "size": 10,
    })
    assert rows(got) == rows(want) and rows(got)


def test_post_filter_composes_with_highlight_and_sorted_route(spark, sf_dir):
    """Composition seams (the door's historical bug source): post_filter
    next to highlight — the REAL Searchkit facet+highlight request — and
    post_filter on the field-sorted route."""
    docs = load(spark, sf_dir, "documents")
    got = es_query(docs, "doc_id", "text", {
        "query": {"match": {"text": "spark stream"}},
        "post_filter": {"term": {"lang": "en"}},
        "highlight": {"fields": {"text": {}}},
        "size": 5,
    })
    assert got.columns == ["doc_id", "score", "highlighted"]
    out = got.collect()
    assert out and all("<em>" in r["highlighted"] for r in out)
    # sorted route: post_filter ANDs into the membership predicate
    ev = load(spark, sf_dir, "events")
    got2 = es_query(ev, "event_id", None, {
        "query": {"match_all": {}},
        "post_filter": {"term": {"event_type": "purchase"}},
        "sort": [{"ts": "desc"}], "size": 5, "_source": ["event_type"],
    })
    rows2 = got2.collect()
    assert len(rows2) == 5
    assert {r["event_type"] for r in rows2} == {"purchase"}


# ------------------------------------------------------- track_total_hits


def test_track_total_hits_exact_count(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    body = {"query": {"term": {"lang": "en"}}, "size": 5,
            "track_total_hits": True}
    got = es_query(docs, "doc_id", "text", body)
    assert got.columns == ["doc_id", "score", "total"]
    n_en = docs.where(F.col("lang") == "en").count()
    out = got.collect()
    assert len(out) == 5
    assert {r["total"] for r in out} == {n_en}
    # total counts POST-FILTERED matches (ES: post_filter narrows
    # hits.total too)
    tot2 = es_query(docs, "doc_id", "text", {
        "query": {"match_all": {}}, "post_filter": {"term": {"lang": "en"}},
        "size": 1, "track_total_hits": True,
    }).collect()[0]["total"]
    assert tot2 == n_en
    with pytest.raises(UnsupportedEsQuery, match="track_total_hits"):
        es_query(docs, "doc_id", "text",
                 {"query": {"match_all": {}}, "track_total_hits": 10000})


def test_track_total_hits_on_sorted_route(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    body = {"query": {"term": {"event_type": "purchase"}},
            "sort": [{"ts": "desc"}], "size": 3,
            "track_total_hits": True}
    got = es_query(ev, "event_id", None, body)
    assert got.columns == ["doc_id", "total"]
    n = ev.where(F.col("event_type") == "purchase").count()
    assert {r["total"] for r in got.collect()} == {n}


# ----------------------------------------------------------- search_after


def test_search_after_sorted_route_keyset_equals_offset(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    base = {"query": {"match_all": {}}, "sort": [{"ts": "desc"}],
            "size": 8, "_source": ["ts", "event_type"]}
    p1 = es_query(ev, "event_id", None, base).collect()
    cursor = [p1[-1]["ts"], p1[-1]["doc_id"]]
    got = es_query(ev, "event_id", None, {**base, "search_after": cursor})
    want = es_query(ev, "event_id", None, {**base, "size": 8, "from": 8})
    assert rows(got) == rows(want) and len(rows(got)) == 8
    with pytest.raises(UnsupportedEsQuery, match="from"):
        es_query(ev, "event_id", None,
                 {**base, "search_after": cursor, "from": 8})
    with pytest.raises(UnsupportedEsQuery, match="tiebreak"):
        es_query(ev, "event_id", None,
                 {**base, "search_after": [p1[-1]["ts"]]})


def test_search_after_scored_route_keyset_equals_offset(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    base = {"query": {"match": {"text": "spark stream window"}}, "size": 8}
    p1 = es_query(docs, "doc_id", "text", base).collect()
    cursor = [p1[-1]["score"], p1[-1]["doc_id"]]
    got = es_query(docs, "doc_id", "text",
                   {**base, "search_after": cursor})
    want = es_query(docs, "doc_id", "text", {**base, "from": 8})
    assert rows(got) == rows(want) and rows(got)
    # non-bm25 scored shapes say so with the path
    with pytest.raises(UnsupportedEsQuery, match="search_after"):
        es_query(docs, "doc_id", "text",
                 {"query": {"fuzzy": {"text": "strean"}},
                  "search_after": cursor})


# --------------------------------------------------------------- collapse


def test_collapse_in_body(spark, sf_dir):
    from pandemic_knowledge_spark.operators.boolquery import collapse_search

    docs = load(spark, sf_dir, "documents")
    got = es_query(docs, "doc_id", "text", {
        "query": {"match": {"text": "spark stream"}},
        "collapse": {"field": "lang"}, "size": 10,
    })
    want = collapse_search(docs, "doc_id", "text", "spark stream", "lang",
                           k=10)
    assert rows(got) == rows(want) and rows(got)
    # collapse × sort routes to the sorted-collapse composition as of
    # r13 (covered in tests/test_es_r13.py); non-match scored collapse
    # queries stay loud
    with pytest.raises(UnsupportedEsQuery, match="collapse"):
        es_query(docs, "doc_id", "text", {
            "query": {"wildcard": {"text": "spar*"}},
            "collapse": {"field": "lang"},
        })


# -------------------------------------------------------------- highlight


def test_highlight_in_body(spark, sf_dir):
    from pandemic_knowledge_spark.engine import highlight_pattern

    docs = load(spark, sf_dir, "documents")
    got = es_query(docs, "doc_id", "text", {
        "query": {"match": {"text": "spark stream"}},
        "_source": ["lang"],
        "highlight": {"fields": {"text": {}}},
        "size": 5,
    })
    assert got.columns == ["doc_id", "score", "lang", "highlighted"]
    pat = highlight_pattern("spark stream")
    want = es_query(docs, "doc_id", "text", {
        "query": {"match": {"text": "spark stream"}},
        "_source": ["text"], "size": 5,
    }).select(
        "doc_id", "score",
        F.regexp_replace("text", pat, "<em>$1</em>").alias("highlighted"),
    )
    assert [(r["doc_id"], r["highlighted"]) for r in got.collect()] == [
        (r["doc_id"], r["highlighted"]) for r in want.collect()
    ]
    assert any("<em>" in r["highlighted"] for r in got.collect())
    # custom tags
    got2 = es_query(docs, "doc_id", "text", {
        "query": {"match": {"text": "spark"}},
        "highlight": {"fields": {"text": {}}, "pre_tags": ["**"],
                      "post_tags": ["**"]},
        "size": 3,
    })
    assert all("**" in r["highlighted"] for r in got2.collect())
    with pytest.raises(UnsupportedEsQuery, match="highlight"):
        es_query(docs, "doc_id", "text", {
            "query": {"match": {"text": "spark"}},
            "highlight": {"fields": {"lang": {}}},
        })
    with pytest.raises(UnsupportedEsQuery, match="highlight"):
        es_query(docs, "doc_id", "text", {
            "query": {"match_all": {}},
            "highlight": {"fields": {"text": {}}},
        })


# ------------------------------------------------------------- new leaves


def test_match_phrase_prefix_leaf(spark, sf_dir):
    from pandemic_knowledge_spark.operators.search import match_phrase_prefix

    docs = load(spark, sf_dir, "documents")
    got = es_query(docs, "doc_id", "text", {
        "query": {"match_phrase_prefix": {"text": {"query": "the str",
                                                   "max_expansions": 10}}},
        "size": 10,
    })
    want = match_phrase_prefix(docs, "doc_id", "text", "the str", k=10,
                               max_expansions=10)
    assert rows(got) == rows(want) and rows(got)
    with pytest.raises(UnsupportedEsQuery, match="text column"):
        es_query(docs, "doc_id", "text", {
            "query": {"match_phrase_prefix": {"lang": "e"}}})


def test_match_bool_prefix_leaf(spark, sf_dir):
    from pandemic_knowledge_spark.operators.boolquery import bool_search

    docs = load(spark, sf_dir, "documents")
    got = es_query(docs, "doc_id", "text", {
        "query": {"match_bool_prefix": {"text": "spark stre"}}, "size": 10})
    want = bool_search(docs, "doc_id", "text",
                       should=[{"match": "spark"}, {"prefix": "stre"}],
                       minimum_should_match=1, k=10)
    assert rows(got) == rows(want) and rows(got)


def test_significant_text_door(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    body_terms = {"query": {"match": {"text": "spark"}}, "aggs": {
        "sig": {"significant_terms": {"field": "text", "size": 7}}}}
    body_text = {"query": {"match": {"text": "spark"}}, "aggs": {
        "sig": {"significant_text": {"field": "text", "size": 7}}}}
    a = es_aggs(docs, body_terms, text_col="text", id_col="doc_id")["sig"]
    b = es_aggs(docs, body_text, text_col="text", id_col="doc_id")["sig"]
    assert rows(a) == rows(b) and rows(a)
    with pytest.raises(UnsupportedEsQuery, match="filter_duplicate_text"):
        es_aggs(docs, {"query": {"match": {"text": "spark"}}, "aggs": {
            "sig": {"significant_text": {"field": "text",
                                         "filter_duplicate_text": True}}}},
            text_col="text", id_col="doc_id")


# ----------------------- r12 wave 2: top_metrics / extended_stats_bucket /
# min_score / fields (pytest parity now; catalog rows are declared r13
# registration debt — the r9→r10 pattern)


def test_top_metrics_door_metric(spark, sf_dir):
    """top_metrics as a door metric sub-agg: per bucket the metric values
    OF the top-sorted row, folded into the same grouped aggregate as a
    struct max/min — no window, no join."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    got = es_aggs(ev, {"aggs": {"by_type": {
        "terms": {"field": "event_type", "size": 3},
        "aggs": {"latest": {"top_metrics": {
            "metrics": [{"field": "value"}],
            "sort": [{"ts": "desc"}],
        }}},
    }}})["by_type"]
    assert got.columns == ["key", "doc_count", "latest_value"]
    w = Window.partitionBy("event_type").orderBy(
        F.desc("ts"), F.desc("value")
    )
    want = {
        (r["event_type"], r["value"])
        for r in ev.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1).collect()
    }
    for r in got.collect():
        assert (r["key"], r["latest_value"]) in want
    # asc sort takes the struct MIN
    got2 = es_aggs(ev, {"aggs": {"by_type": {
        "terms": {"field": "event_type", "size": 3},
        "aggs": {"first": {"top_metrics": {
            "metrics": [{"field": "value"}], "sort": [{"ts": "asc"}],
        }}}}}})["by_type"]
    w2 = Window.partitionBy("event_type").orderBy(F.asc("ts"), F.asc("value"))
    want2 = {
        (r["event_type"], r["value"])
        for r in ev.withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") == 1).collect()
    }
    for r in got2.collect():
        assert (r["key"], r["first_value"]) in want2
    # size > 1 routes to top_hits, loudly
    with pytest.raises(UnsupportedEsQuery, match="size 1"):
        es_aggs(ev, {"aggs": {"x": {"terms": {"field": "event_type"},
            "aggs": {"t": {"top_metrics": {"metrics": [{"field": "value"}],
                                           "sort": [{"ts": "desc"}],
                                           "size": 3}}}}}})


def test_top_metrics_in_predicate_buckets(spark, sf_dir):
    """top_metrics rides the one-scan filters path (cond-wrapped struct)."""
    ev = load(spark, sf_dir, "events")
    got = es_aggs(ev, {"aggs": {"f": {
        "filters": {"filters": {
            "purchases": {"term": {"event_type": "purchase"}}}},
        "aggs": {"latest": {"top_metrics": {
            "metrics": [{"field": "value"}], "sort": [{"ts": "desc"}]}}},
    }}})["f"].collect()
    assert len(got) == 1
    top = (ev.where(F.col("event_type") == "purchase")
           .orderBy(F.desc("ts"), F.desc("value")).limit(1).collect()[0])
    assert got[0]["latest_value"] == top["value"]


def test_extended_stats_bucket_sibling(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    out = es_aggs(o, {"aggs": {
        "per_month": {"date_histogram": {"field": "o_orderdate",
                                         "calendar_interval": "month"}},
        "spread": {"extended_stats_bucket": {
            "buckets_path": "per_month>_count"}},
    }})
    months = [r["doc_count"] for r in out["per_month"].collect()]
    row = out["spread"].collect()[0]
    import statistics

    n = len(months)
    assert row["count"] == n and row["sum"] == sum(months)
    assert row["min"] == min(months) and row["max"] == max(months)
    mean = sum(months) / n
    var = statistics.pvariance(months)
    assert row["avg"] == round(mean, 6)
    assert abs(row["variance"] - var) < 1e-4
    assert row["std_upper"] == round(mean + 2.0 * var ** 0.5, 6)


def test_cumulative_cardinality_door(spark):
    """cumulative_cardinality = distinct keys seen so far: reduces
    exactly to first-seen buckets + the shared two-phase prefix sum (ES
    merges HLL sketches — approximate; this is the exact form)."""
    import datetime as dt

    rows_in = [
        (1, "u1", dt.datetime(2024, 1, 1)), (2, "u2", dt.datetime(2024, 1, 1)),
        (3, "u1", dt.datetime(2024, 1, 2)),
        (4, "u3", dt.datetime(2024, 1, 4)), (5, "u1", dt.datetime(2024, 1, 4)),
        (6, "u4", dt.datetime(2024, 1, 5)), (7, "u5", dt.datetime(2024, 1, 5)),
    ]
    df = spark.createDataFrame(rows_in, "id long, user string, ts timestamp")
    body = {"aggs": {"daily": {
        "date_histogram": {"field": "ts", "calendar_interval": "day",
                           "min_doc_count": 0},
        "aggs": {"u": {"cardinality": {"field": "user"}},
                 "cu": {"cumulative_cardinality": {"buckets_path": "u"}}},
    }}}
    out = es_aggs(df, body)["daily"].collect()
    assert [r["cu"] for r in out] == [2, 2, 2, 3, 5]
    assert [r["u"] for r in out] == [2, 1, None, 2, 2]
    # buckets_path must name a sibling CARDINALITY metric
    with pytest.raises(UnsupportedEsQuery, match="cardinality metric"):
        es_aggs(df, {"aggs": {"daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"m": {"max": {"field": "id"}},
                     "cu": {"cumulative_cardinality": {
                         "buckets_path": "m"}}}}}})
    # unordered parents refuse the walk
    with pytest.raises(UnsupportedEsQuery, match="ordered parent"):
        es_aggs(df, {"aggs": {"t": {
            "terms": {"field": "user"},
            "aggs": {"u": {"cardinality": {"field": "id"}},
                     "cu": {"cumulative_cardinality": {
                         "buckets_path": "u"}}}}}})


def test_min_score_and_fields(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    base = {"query": {"match": {"text": "spark stream"}}, "size": 50}
    all_rows = es_query(docs, "doc_id", "text", base).collect()
    cut = all_rows[len(all_rows) // 2]["score"]
    got = es_query(docs, "doc_id", "text", {**base, "min_score": cut})
    want = [(r["doc_id"], r["score"]) for r in all_rows if r["score"] >= cut]
    assert [(r["doc_id"], r["score"]) for r in got.collect()] == want
    # fields == the modern _source spelling (flat columns out)
    a = es_query(docs, "doc_id", "text",
                 {**base, "size": 5, "_source": ["lang"]})
    b = es_query(docs, "doc_id", "text",
                 {**base, "size": 5, "fields": ["lang"]})
    assert rows(a) == rows(b) and a.columns == b.columns
    with pytest.raises(UnsupportedEsQuery, match="not both"):
        es_query(docs, "doc_id", "text",
                 {**base, "_source": ["lang"], "fields": ["lang"]})
    with pytest.raises(UnsupportedEsQuery, match="min_score"):
        es_query(docs, "doc_id", "text",
                 {"query": {"match_all": {}}, "min_score": 0.5})
    # ES's hits.total respects min_score — for a PLAIN MATCH the exact
    # score-aware total is implemented (r13); a 'total' column counting
    # only >= threshold hits
    both = es_query(docs, "doc_id", "text",
                    {**base, "min_score": cut,
                     "track_total_hits": True}).collect()
    assert both and all(r["total"] == len(want) for r in both)
    # other scored shapes still refuse (their unbounded score frames
    # aren't exposed)
    with pytest.raises(UnsupportedEsQuery, match="track_total_hits"):
        es_query(docs, "doc_id", "text", {
            "query": {"bool": {"must": [{"match": {"text": "spark"}}]}},
            "min_score": 1.0, "track_total_hits": True})
    with pytest.raises(UnsupportedEsQuery, match="min_score"):
        es_query(load(spark, sf_dir, "events"), "event_id", None,
                 {"query": {"match_all": {}}, "sort": [{"ts": "desc"}],
                  "min_score": 0.5})


def test_terms_order_and_missing(spark, sf_dir):
    """terms `order` (_count asc, _key, sibling metric) and `missing`."""
    ev = load(spark, sf_dir, "events")
    body = lambda order: {"aggs": {"t": {
        "terms": {"field": "event_type", "size": 3, "order": order},
        "aggs": {"vmax": {"max": {"field": "value"}}},
    }}}
    base = (ev.groupBy(F.col("event_type").alias("key"))
            .agg(F.count(F.lit(1)).alias("doc_count"),
                 F.max("value").alias("vmax")))
    got = es_aggs(ev, body({"vmax": "desc"}))["t"].collect()
    want = base.orderBy(F.desc("vmax"), F.asc("key")).limit(3).collect()
    assert [(r["key"], r["vmax"]) for r in got] == [
        (r["key"], r["vmax"]) for r in want]
    got2 = es_aggs(ev, body({"_count": "asc"}))["t"].collect()
    want2 = base.orderBy(F.asc("doc_count"), F.asc("key")).limit(3).collect()
    assert [r["key"] for r in got2] == [r["key"] for r in want2]
    got3 = es_aggs(ev, body({"_key": "desc"}))["t"].collect()
    want3 = base.orderBy(F.desc("key")).limit(3).collect()
    assert [r["key"] for r in got3] == [r["key"] for r in want3]
    with pytest.raises(UnsupportedEsQuery, match="sibling metric"):
        es_aggs(ev, body({"nope": "desc"}))
    # missing: null keys land in a named bucket
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "id long, k string")
    out = es_aggs(df, {"aggs": {"t": {"terms": {"field": "k",
                                                "missing": "N/A"}}}})["t"]
    assert {(r["key"], r["doc_count"]) for r in out.collect()} == {
        ("a", 1), ("N/A", 2)}
    # order on the parent of a nested bucket: _count/_key route (r13 —
    # Kibana's "order split by alphabetical"); sibling-metric targets
    # stay loud (no sibling metric column exists next to a nested bucket)
    nested = lambda order: {"aggs": {"t": {
        "terms": {"field": "event_type", "size": 2, "order": order},
        "aggs": {"h": {"date_histogram": {
            "field": "ts", "calendar_interval": "month"}}}}}}
    keys_desc = {r["key"] for r in
                 es_aggs(ev, nested({"_key": "desc"}))["t"].collect()}
    all_keys = sorted(r["event_type"] for r in
                      ev.select("event_type").distinct().collect())
    assert keys_desc == set(all_keys[-2:])
    with pytest.raises(UnsupportedEsQuery, match="sibling metric"):
        es_aggs(ev, nested({"vmax": "desc"}))


def test_extended_bounds_widens_the_spine(spark):
    import datetime as dt

    rows_in = [(1, dt.datetime(2024, 3, 10)), (2, dt.datetime(2024, 4, 2))]
    df = spark.createDataFrame(rows_in, "id long, ts timestamp")
    out = es_aggs(df, {"aggs": {"m": {"date_histogram": {
        "field": "ts", "calendar_interval": "month", "min_doc_count": 0,
        "extended_bounds": {"min": "2024-01-15", "max": "2024-06-01"},
    }}}})["m"].collect()
    assert [r["key"].month for r in out] == [1, 2, 3, 4, 5, 6]
    assert [r["doc_count"] for r in out] == [0, 0, 1, 1, 0, 0]
    # bounds can only EXTEND (union with the data range)
    out2 = es_aggs(df, {"aggs": {"m": {"date_histogram": {
        "field": "ts", "calendar_interval": "month", "min_doc_count": 0,
        "extended_bounds": {"min": "2024-03-20", "max": "2024-03-25"},
    }}}})["m"].collect()
    assert [r["key"].month for r in out2] == [3, 4]
    # numeric histogram form
    dfn = spark.createDataFrame([(1, 12.0)], "id long, v double")
    outn = es_aggs(dfn, {"aggs": {"h": {"histogram": {
        "field": "v", "interval": 5.0, "min_doc_count": 0,
        "extended_bounds": {"min": 0, "max": 20},
    }}}})["h"].collect()
    assert [r["key"] for r in outn] == [0.0, 5.0, 10.0, 15.0, 20.0]
    # silently-ignored form refused
    with pytest.raises(UnsupportedEsQuery, match="extended_bounds"):
        es_aggs(df, {"aggs": {"m": {"date_histogram": {
            "field": "ts", "calendar_interval": "month",
            "extended_bounds": {"min": "2024-01-01", "max": "2024-02-01"},
        }}}})


def test_geo_distance_defaults_to_meters(spark, sf_dir):
    """ES's default geo_distance unit is meters — a verbatim Kibana body
    without `unit` now buckets correctly instead of failing."""
    cust = None
    df = spark.createDataFrame(
        [(1, 48.8566, 2.3522),    # Paris (origin)
         (2, 48.8606, 2.3376),    # Louvre ~1.2 km
         (3, 45.7640, 4.8357)],   # Lyon ~392 km
        "id long, lat double, lon double",
    ).selectExpr("id", "named_struct('lat', lat, 'lon', lon) AS geo")
    body = lambda unit_kv: {"aggs": {"rings": {"geo_distance": {
        "field": "geo", "origin": {"lat": 48.8566, "lon": 2.3522},
        "ranges": [{"to": 2000}, {"from": 2000}], **unit_kv,
    }}}}
    out_m = {r["key"]: r["doc_count"]
             for r in es_aggs(df, body({}))["rings"].collect()}
    assert out_m == {"*-2000": 2, "2000-*": 1}
    out_km = {r["key"]: r["doc_count"]
              for r in es_aggs(df, {"aggs": {"rings": {"geo_distance": {
                  "field": "geo", "origin": {"lat": 48.8566, "lon": 2.3522},
                  "ranges": [{"to": 2}, {"from": 2}], "unit": "km",
              }}}})["rings"].collect()}
    assert out_km == {"*-2": 2, "2-*": 1}
    with pytest.raises(UnsupportedEsQuery, match="unit"):
        es_aggs(df, body({"unit": "furlong"}))


def test_rate_metric_door(spark):
    import datetime as dt

    rows_in = []
    i = 0
    for d in range(1, 32):       # 31 January days, 2 docs/day, v=10
        for _ in range(2):
            rows_in.append((i, dt.datetime(2024, 1, d), 10.0)); i += 1
    for d in range(1, 30):       # 29 February days (2024 leap), 1 doc/day
        rows_in.append((i, dt.datetime(2024, 2, d), 29.0)); i += 1
    df = spark.createDataFrame(rows_in, "id long, ts timestamp, v double")
    out = es_aggs(df, {"aggs": {"pm": {
        "date_histogram": {"field": "ts", "calendar_interval": "month"},
        "aggs": {
            "docs_per_day": {"rate": {"unit": "day"}},
            "v_per_day": {"rate": {"unit": "day", "field": "v"}},
            "v_per_month": {"rate": {"unit": "month", "field": "v"}},
        }}}})["pm"].collect()
    jan, feb = out
    assert jan["docs_per_day"] == 2.0 and feb["docs_per_day"] == 1.0
    assert jan["v_per_day"] == 20.0          # 620 / 31
    assert feb["v_per_day"] == 29.0          # 841 / 29
    assert jan["v_per_month"] == 620.0 and feb["v_per_month"] == 841.0
    with pytest.raises(UnsupportedEsQuery, match="rate"):
        es_aggs(df, {"aggs": {"t": {"terms": {"field": "id"},
            "aggs": {"r": {"rate": {"unit": "day"}}}}}})
    with pytest.raises(UnsupportedEsQuery, match="unit"):
        es_aggs(df, {"aggs": {"pm": {
            "date_histogram": {"field": "ts", "calendar_interval": "hour"},
            "aggs": {"r": {"rate": {"unit": "day"}}}}}})


def test_significant_terms_keyword_field(spark, sf_dir):
    """significant_terms on a NON-text column takes the keyword form —
    one groupBy, no tokenize, same JLH score (the commoner Kibana
    panel)."""
    docs = load(spark, sf_dir, "documents")
    got = es_aggs(docs, {
        "query": {"range": {"n_chars": {"gte": 400}}},
        "aggs": {"sig": {"significant_terms": {"field": "lang", "size": 5,
                                               "min_doc_count": 1}}},
    }, text_col="text")["sig"]
    assert got.columns == ["term", "fg_count", "bg_count", "score"]
    rows_out = got.collect()
    assert rows_out
    n_all = docs.where(F.col("lang").isNotNull()).count()
    n_fg = docs.where(
        (F.col("n_chars") >= 400) & F.col("lang").isNotNull()
    ).count()
    for r in rows_out:
        fg = docs.where((F.col("lang") == r["term"])
                        & (F.col("n_chars") >= 400)).count()
        bg = docs.where(F.col("lang") == r["term"]).count()
        assert (r["fg_count"], r["bg_count"]) == (fg, bg)
        fgp, bgp = fg / n_fg, bg / n_all
        assert r["score"] == round((fgp - bgp) * (fgp / bgp), 6)
    # still needs a foreground
    with pytest.raises(UnsupportedEsQuery, match="foreground"):
        es_aggs(docs, {"aggs": {"sig": {"significant_terms": {
            "field": "lang"}}}}, text_col="text")


def test_date_histogram_time_zone(spark):
    import datetime as dt

    # 23:30 UTC on Jan 1 is already Jan 2 in +02:00
    rows_in = [(1, dt.datetime(2024, 1, 1, 10, 0)),
               (2, dt.datetime(2024, 1, 1, 23, 30)),
               (3, dt.datetime(2024, 1, 2, 5, 0))]
    df = spark.createDataFrame(rows_in, "id long, ts timestamp")
    out = es_aggs(df, {"aggs": {"d": {"date_histogram": {
        "field": "ts", "calendar_interval": "day",
        "time_zone": "+02:00"}}}})["d"].collect()
    # local day starts at 22:00 UTC of the previous day
    assert [(r["key"], r["doc_count"]) for r in out] == [
        (dt.datetime(2023, 12, 31, 22, 0), 1),
        (dt.datetime(2024, 1, 1, 22, 0), 2),
    ]
    with pytest.raises(UnsupportedEsQuery, match="time_zone"):
        es_aggs(df, {"aggs": {"d": {"date_histogram": {
            "field": "ts", "calendar_interval": "day",
            "time_zone": "+02:00", "min_doc_count": 0}}}})


def test_filter_and_global_aggs(spark, sf_dir):
    """The single `filter` bucket (Kibana's per-panel wrapper) and
    `global` (escape the request query — the %-of-all denominator)."""
    ev = load(spark, sf_dir, "events")
    # filter + metrics: one row, doc_count + metric over the narrowed set
    out = es_aggs(ev, {"aggs": {"purch": {
        "filter": {"term": {"event_type": "purchase"}},
        "aggs": {"vsum": {"sum": {"field": "value"}}},
    }}})["purch"].collect()
    assert len(out) == 1
    sub = ev.where(F.col("event_type") == "purchase")
    assert out[0]["doc_count"] == sub.count()
    assert out[0]["vsum"] == sub.agg(F.sum("value")).collect()[0][0]
    # filter wrapping a BUCKET agg: recurse over the narrowed frame
    got = es_aggs(ev, {"aggs": {"purch": {
        "filter": {"term": {"event_type": "purchase"}},
        "aggs": {"daily": {"date_histogram": {
            "field": "ts", "calendar_interval": "month"}}},
    }}})["purch"]
    want = es_aggs(sub, {"aggs": {"daily": {"date_histogram": {
        "field": "ts", "calendar_interval": "month"}}}})["daily"]
    assert rows(got) == rows(want) and rows(got)
    # filter composes with the request query (AND)
    got2 = es_aggs(ev, {
        "query": {"range": {"value": {"gte": 10}}},
        "aggs": {"purch": {
            "filter": {"term": {"event_type": "purchase"}},
            "aggs": {"n": {"value_count": {"field": "event_id"}}}}},
    })["purch"].collect()[0]
    assert got2["doc_count"] == ev.where(
        (F.col("value") >= 10) & (F.col("event_type") == "purchase")
    ).count()
    # global ESCAPES the request query
    gout = es_aggs(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {"all_docs": {"global": {},
                              "aggs": {"n": {"value_count": {
                                  "field": "event_id"}}}}},
    })["all_docs"].collect()[0]
    assert gout["doc_count"] == ev.count() and gout["n"] == ev.count()
    # loud seams: mixing a nested bucket with sibling metrics, pipelines
    with pytest.raises(UnsupportedEsQuery, match="ONLY that"):
        es_aggs(ev, {"aggs": {"x": {
            "filter": {"term": {"event_type": "purchase"}},
            "aggs": {"daily": {"date_histogram": {
                "field": "ts", "calendar_interval": "month"}},
                "m": {"max": {"field": "value"}}}}}})
    with pytest.raises(UnsupportedEsQuery, match="global takes"):
        es_aggs(ev, {"aggs": {"x": {"global": {"q": 1}}}})


def test_three_level_nested_buckets(spark, sf_dir):
    """Kibana's full "split chart + x-axis + split series" body: terms →
    date_histogram → terms with leaf metrics — one scan, one triple-key
    shuffle, three bounded cuts. Verified against an independent Spark
    computation of ES's cut semantics (parents rank by TOTAL doc_count
    at every level)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    body = {"aggs": {"by_type": {
        "terms": {"field": "event_type", "size": 2},
        "aggs": {"monthly": {
            "date_histogram": {"field": "ts", "calendar_interval": "month"},
            "aggs": {"by_user_bucket": {
                "terms": {"field": "user_id", "size": 2},
                "aggs": {"vmax": {"max": {"field": "value"}}},
            }},
        }},
    }}}
    got = es_aggs(ev, body)["by_type"]
    assert got.columns == ["key", "monthly_key", "by_user_bucket_key",
                           "doc_count", "vmax"]
    g = (ev.groupBy(F.col("event_type").alias("key"),
                    F.date_trunc("month", "ts").alias("mk"),
                    F.col("user_id").alias("uk"))
         .agg(F.count(F.lit(1)).alias("doc_count"),
              F.max("value").alias("vmax")))
    top_types = [r["key"] for r in
                 g.groupBy("key").agg(F.sum("doc_count").alias("t"))
                 .orderBy(F.desc("t"), F.asc("key")).limit(2).collect()]
    w3 = Window.partitionBy("key", "mk").orderBy(F.desc("doc_count"),
                                                 F.asc("uk"))
    want = (g.where(F.col("key").isin(top_types))
            .withColumn("__rn", F.row_number().over(w3))
            .where(F.col("__rn") <= 2).drop("__rn"))
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in want.collect()) and got.count() > 0
    # leaf pipelines window per (level-1, level-2) series
    body2 = {"aggs": {"by_type": {
        "terms": {"field": "event_type", "size": 2},
        "aggs": {"by_user": {
            "terms": {"field": "user_id", "size": 2},
            "aggs": {"monthly": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "month"},
                "aggs": {"cum": {"cumulative_sum": {
                    "buckets_path": "_count"}}},
            }},
        }},
    }}}
    out2 = es_aggs(ev, body2)["by_type"].collect()
    assert out2
    import itertools
    for (_, _), grp in itertools.groupby(
        out2, key=lambda r: (r["key"], r["by_user_key"])
    ):
        run = 0
        for r in grp:
            run += r["doc_count"]
            assert r["cum"] == run
    # four levels are loud
    with pytest.raises(UnsupportedEsQuery, match="three levels"):
        es_aggs(ev, {"aggs": {"a": {"terms": {"field": "event_type"},
            "aggs": {"b": {"terms": {"field": "user_id"},
                "aggs": {"c": {"date_histogram": {
                    "field": "ts", "calendar_interval": "month"},
                    "aggs": {"d": {"terms": {"field": "event_id"}}}}}}}}}})
    # metrics next to the mid-level bucket are loud
    with pytest.raises(UnsupportedEsQuery, match="INSIDE"):
        es_aggs(ev, {"aggs": {"a": {"terms": {"field": "event_type"},
            "aggs": {"b": {"terms": {"field": "user_id"},
                "aggs": {"c": {"date_histogram": {
                    "field": "ts", "calendar_interval": "month"}},
                    "m": {"max": {"field": "value"}}}}}}}})


def test_rescore_in_body(spark, sf_dir):
    from pandemic_knowledge_spark.operators.boolquery import rescore_search

    docs = load(spark, sf_dir, "documents")
    body = {
        "query": {"match": {"text": "spark stream"}},
        "rescore": {"window_size": 40, "query": {
            "rescore_query": {"match_phrase": {"text": "fast scan"}},
            "query_weight": 1.0, "rescore_weight": 2.0,
        }},
        "size": 10,
    }
    got = es_query(docs, "doc_id", "text", body)
    want = rescore_search(docs, "doc_id", "text", "spark stream",
                          "fast scan", window_size=40, query_weight=1.0,
                          rescore_weight=2.0, k=10)
    assert rows(got) == rows(want) and rows(got)
    # the array form ES clients send
    got2 = es_query(docs, "doc_id", "text",
                    {**body, "rescore": [body["rescore"]]})
    assert rows(got2) == rows(want)
    with pytest.raises(UnsupportedEsQuery, match="score_mode"):
        es_query(docs, "doc_id", "text", {**body, "rescore": {
            "query": {"rescore_query": {
                "match_phrase": {"text": "fast scan"}},
                "score_mode": "max"}}})
    with pytest.raises(UnsupportedEsQuery, match="match_phrase"):
        es_query(docs, "doc_id", "text", {**body, "rescore": {
            "query": {"rescore_query": {"match": {"text": "x"}}}}})
    with pytest.raises(UnsupportedEsQuery, match="rescore"):
        es_query(docs, "doc_id", "text",
                 {**body, "sort": [{"n_chars": "desc"}]})


def test_suggest_in_search_body(engine, spark, sf_dir):
    from pandemic_knowledge_spark.operators.search import (
        phrase_suggest,
        term_suggest,
    )

    docs = load(spark, sf_dir, "documents")
    out = engine.es_search({
        "query": {"match": {"text": "spark"}}, "size": 3,
        "suggest": {
            "fix_term": {"text": "strean", "term": {"field": "text"}},
            "fix_phrase": {"text": "spark strean",
                           "phrase": {"field": "text", "size": 2}},
        },
    })
    assert set(out) == {"hits", "fix_term", "fix_phrase"}
    want_t = term_suggest(docs, "doc_id", "text", "strean")
    assert rows(out["fix_term"]) == rows(want_t) and rows(want_t)
    want_p = phrase_suggest(docs, "doc_id", "text", "spark strean", k=2)
    assert rows(out["fix_phrase"]) == rows(want_p)
    from pandemic_knowledge_spark.operators.esdsl import UnsupportedEsQuery
    with pytest.raises(UnsupportedEsQuery, match="text column"):
        engine.es_search({"suggest": {"s": {
            "text": "x", "term": {"field": "lang"}}}})
    with pytest.raises(UnsupportedEsQuery, match="term/phrase"):
        engine.es_search({"suggest": {"s": {
            "text": "x", "completion": {"field": "text"}}}})


# ---------------------------------------------------------- retriever.rrf


def test_retriever_rrf_matches_rank_rrf(engine):
    emb = engine.table("embeddings")
    vec = emb.first()["embedding"]
    legacy = engine.es_search({
        "knn": {"field": "embedding", "query_vector": vec, "k": 20},
        "query": {"match": {"text": "spark stream"}},
        "rank": {"rrf": {"rank_constant": 60, "rank_window_size": 20}},
        "size": 10,
    })["hits"]
    es8 = engine.es_search({
        "retriever": {"rrf": {
            "retrievers": [
                {"standard": {"query": {"match": {"text": "spark stream"}}}},
                {"knn": {"field": "embedding", "query_vector": vec,
                         "k": 20, "num_candidates": 100}},
            ],
            "rank_constant": 60, "rank_window_size": 20,
        }},
        "size": 10,
    })["hits"]
    assert rows(legacy) == rows(es8) and rows(es8)
    with pytest.raises(UnsupportedEsQuery, match="retriever"):
        engine.es_search({"retriever": {"linear": {"retrievers": []}}})
    with pytest.raises(UnsupportedEsQuery, match="arms"):
        engine.es_search({"retriever": {"rrf": {"retrievers": [
            {"knn": {"field": "embedding", "query_vector": vec, "k": 5}}]}}})
