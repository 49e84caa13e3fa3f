"""Round-13 regression suite: the r12 judge's confirmed defect
(Engine.knn silently ignored unknown knn-spec keys — a `filter` body
returned UNfiltered neighbors) plus the five r12 advisor findings and
the two new compositions (highlight × field-sort, scored-route
search_after for bool / multi-field multi_match)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandemic_knowledge_spark.engine import Engine
from pandemic_knowledge_spark.operators.esdsl import (
    UnsupportedEsQuery,
    es_query,
)
from pandemic_knowledge_spark.tables import load


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark, sf_dir)


def rows(df):
    return [tuple(r) for r in df.collect()]


# ------------------------------------------------------- knn spec gating


def test_knn_spec_rejects_unknown_keys(engine):
    """The r12 judge repro, gated: unknown keys inside the knn spec must
    raise with the $.knn path — `similarity`/`boost` change ranking
    semantics and must never be silently dropped."""
    emb = engine.table("embeddings")
    vec = emb.first()["embedding"]
    for bad in ("similarity", "boost", "inner_hits"):
        with pytest.raises(UnsupportedEsQuery, match=r"\$\.knn"):
            engine.knn({"field": "embedding", "query_vector": vec,
                        "k": 5, bad: 0.5})


def test_knn_spec_missing_query_vector_is_pathed(engine):
    """A missing query_vector is a pathed UnsupportedEsQuery, not a raw
    KeyError (r12 judge finding)."""
    with pytest.raises(UnsupportedEsQuery, match=r"\$\.knn"):
        engine.knn({"field": "embedding", "k": 5})


def test_knn_num_candidates_accepted(engine):
    """num_candidates is validated and subsumed (the exact tier is its
    ∞ limit) — identical results with and without it."""
    emb = engine.table("embeddings")
    vec = emb.first()["embedding"]
    base = engine.knn({"field": "embedding", "query_vector": vec, "k": 5})
    with_nc = engine.knn({"field": "embedding", "query_vector": vec,
                          "k": 5, "num_candidates": 50})
    assert rows(base) == rows(with_nc) and rows(base)


def test_knn_filter_prefilters_neighbors(engine, spark, sf_dir):
    """ES filtered kNN: neighbors restricted to docs matching the filter
    BEFORE the top-k — exactly k qualifying rows, and every returned id
    satisfies the predicate."""
    from pandemic_knowledge_spark.operators.similarity import (
        knn_brute_force,
    )

    emb = engine.table("embeddings")
    docs = engine.table("documents")
    vec = emb.first()["embedding"]
    got = engine.knn({"field": "embedding", "query_vector": vec, "k": 5,
                      "filter": {"term": {"lang": "en"}}})
    allowed = docs.where(F.col("lang") == "en").select(
        F.col("doc_id").alias("vec_id"))
    want = knn_brute_force(emb.join(allowed, "vec_id", "left_semi"),
                           "embedding", "vec_id", vec, k=5)
    assert rows(got) == rows(want) and rows(got)
    en_ids = {r[0] for r in allowed.collect()}
    assert all(r[0] in en_ids for r in rows(got))
    # array form = clauses ANDed
    got2 = engine.knn({"field": "embedding", "query_vector": vec, "k": 5,
                       "filter": [{"term": {"lang": "en"}},
                                  {"range": {"n_chars": {"gte": 0}}}]})
    assert rows(got2) == rows(want)
    # empty array is loud
    with pytest.raises(UnsupportedEsQuery, match=r"\$\.knn\.filter"):
        engine.knn({"field": "embedding", "query_vector": vec, "k": 5,
                    "filter": []})


def test_knn_filter_via_es_search_and_hybrid(engine):
    """The body-door route: es_search({"knn": {..., "filter": ...}})
    takes the pre-filter; in hybrid bodies the filter restricts ONLY the
    knn arm (ES scope) — the BM25 arm still ranks the whole corpus."""
    from pandemic_knowledge_spark.operators.search import (
        bm25_search,
        rrf_fuse,
    )
    from pandemic_knowledge_spark.operators.similarity import (
        knn_brute_force,
    )

    emb = engine.table("embeddings")
    docs = engine.table("documents")
    vec = emb.first()["embedding"]
    body = {"knn": {"field": "embedding", "query_vector": vec, "k": 5,
                    "filter": {"term": {"lang": "en"}}}, "size": 5}
    got = engine.es_search(body)["hits"]
    allowed = docs.where(F.col("lang") == "en").select(
        F.col("doc_id").alias("vec_id"))
    femb = emb.join(allowed, "vec_id", "left_semi")
    want = knn_brute_force(femb, "embedding", "vec_id", vec, k=5)
    assert rows(got) == rows(want) and rows(got)

    hybrid = engine.es_search({
        "knn": {"field": "embedding", "query_vector": vec, "k": 10,
                "filter": {"term": {"lang": "en"}}},
        "query": {"match": {"text": "spark stream"}},
        "rank": {"rrf": {"rank_constant": 60, "rank_window_size": 10}},
        "size": 5,
    })["hits"]
    text_hits = bm25_search(docs, "doc_id", "text", "spark stream", k=10)
    vec_hits = knn_brute_force(femb, "embedding", "vec_id", vec, k=10)
    want_h = rrf_fuse([(text_hits, "doc_id", "score"),
                       (vec_hits, "vec_id", "cos_sim")],
                      rank_const=60, k=5)
    assert rows(hybrid) == rows(want_h) and rows(hybrid)


def test_retriever_knn_arm_rejects_unknown_keys(engine):
    """The retriever tree's knn arm rides the same gated spec."""
    emb = engine.table("embeddings")
    vec = emb.first()["embedding"]
    with pytest.raises(UnsupportedEsQuery, match=r"\$\.knn"):
        engine.es_search({"retriever": {"rrf": {"retrievers": [
            {"standard": {"query": {"match": {"text": "spark"}}}},
            {"knn": {"field": "embedding", "query_vector": vec, "k": 5,
                     "similarity": 0.4}},
        ]}}, "size": 5})


# -------------------------------------------- r12 advisor: silent drops


def test_collapse_plus_rescore_is_loud(engine, spark, sf_dir):
    """collapse+rescore used to take the collapse branch and silently
    skip the rescore phase (ES rejects the pair)."""
    docs = load(spark, sf_dir, "documents")
    with pytest.raises(UnsupportedEsQuery, match=r"\$\.collapse"):
        es_query(docs, "doc_id", "text", {
            "query": {"match": {"text": "spark"}},
            "collapse": {"field": "lang"},
            "rescore": {"query": {"rescore_query": {
                "match_phrase": {"text": "fast scan"}}}},
        })


def test_agg_named_hits_is_loud(engine):
    """An aggregation named like an earlier response section would
    silently clobber that frame in the flat response dict."""
    with pytest.raises(UnsupportedEsQuery, match="collide"):
        engine.es_search({
            "query": {"match": {"text": "spark"}}, "size": 3,
            "aggs": {"hits": {"terms": {"field": "lang", "size": 3}}},
        })


def test_malformed_keyset_cursor_is_loud(spark, sf_dir):
    """An uncastable search_after cursor value must raise with the path,
    never NULL the predicate into a silently empty page."""
    docs = load(spark, sf_dir, "events")
    base = {"query": {"term": {"event_type": "purchase"}},
            "sort": [{"ts": "desc"}], "size": 5}
    # sanity: a well-formed string cursor still works
    first = es_query(docs, "event_id", None, base).collect()
    assert first
    for bad_ts in ("not-a-timestamp", 12.5):
        with pytest.raises(UnsupportedEsQuery, match=r"search_after"):
            es_query(docs, "event_id", None,
                     {**base, "search_after": [bad_ts, 0]}).collect()
    with pytest.raises(UnsupportedEsQuery, match=r"search_after"):
        es_query(docs, "event_id", None,
                 {**base, "search_after": [None, 0]}).collect()
    # numeric sort key given a word
    with pytest.raises(UnsupportedEsQuery, match=r"search_after"):
        es_query(docs, "event_id", None,
                 {"query": {"term": {"event_type": "purchase"}},
                  "sort": [{"value": "desc"}], "size": 5,
                  "search_after": ["abc", 0]}).collect()
    # fractional cursor against an INTEGRAL sort column would silently
    # truncate (lit(12.5).cast(long) -> 12, shifting the keyset bound)
    with pytest.raises(UnsupportedEsQuery, match="integral"):
        es_query(docs, "event_id", None,
                 {"query": {"term": {"event_type": "purchase"}},
                  "sort": [{"user_id": "desc"}], "size": 5,
                  "search_after": [12.5, 0]}).collect()
    # ...but a whole-number float cursor is fine (JSON has one number type)
    ok = es_query(docs, "event_id", None,
                  {"query": {"term": {"event_type": "purchase"}},
                   "sort": [{"user_id": "desc"}], "size": 5,
                   "search_after": [float(10**9), 0]}).collect()
    assert isinstance(ok, list)


def test_keyset_string_timestamp_cursor_pages(spark, sf_dir):
    """A well-formed ISO-string timestamp cursor converts driver-side and
    pages identically to the native-value cursor."""
    docs = load(spark, sf_dir, "events")
    base = {"query": {"term": {"event_type": "purchase"}},
            "sort": [{"ts": "desc"}], "_source": ["ts"], "size": 5}
    p1 = es_query(docs, "event_id", None, base).collect()
    last = p1[-1]
    native = es_query(docs, "event_id", None, {
        **base, "search_after": [last["ts"], last["doc_id"]]}).collect()
    iso = es_query(docs, "event_id", None, {
        **base,
        "search_after": [last["ts"].isoformat(sep=" "), last["doc_id"]],
    }).collect()
    assert [tuple(r) for r in native] == [tuple(r) for r in iso]
    assert native and p1[-1] != native[0]


# ------------------------------------------ highlight × field-sort page


def test_sorted_highlighted_page(spark, sf_dir):
    """The reference's "Latest news" panel shape (SearchUI.js:51,76-97):
    a match query, a date-ish field sort, highlight on the text column —
    page rows in sort order WITH the marked column."""
    docs = load(spark, sf_dir, "documents")
    body = {
        "query": {"match": {"text": "spark"}},
        "sort": [{"n_chars": "desc"}],
        "_source": ["lang"],
        "highlight": {"fields": {"text": {}}},
        "size": 5,
    }
    got = es_query(docs, "doc_id", "text", body)
    assert got.columns == ["doc_id", "lang", "highlighted"]
    out = got.collect()
    assert out
    # sort order: n_chars desc among matching docs, doc_id tiebreak
    from pandemic_knowledge_spark.engine import highlight_pattern
    from pandemic_knowledge_spark.functions.text import tokenize

    pattern = highlight_pattern("spark")
    want = (
        docs.where(F.array_contains(tokenize("text"), "spark"))
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(5)
        .select(
            F.col("doc_id"),
            F.col("lang"),
            F.regexp_replace("text", pattern, "<em>$1</em>")
            .alias("highlighted"),
        )
    )
    assert rows(got) == rows(want)
    assert any("<em>" in (r["highlighted"] or "") for r in out)
    # a sorted body whose query carries no analyzed terms stays loud
    with pytest.raises(UnsupportedEsQuery, match="highlight"):
        es_query(docs, "doc_id", "text", {
            "query": {"term": {"lang": "en"}},
            "sort": [{"n_chars": "desc"}],
            "highlight": {"fields": {"text": {}}},
        })


# --------------------------------- scored-route search_after extensions


def _page_walk(docs, body, size, pages):
    """Walk `pages` pages of `size` via search_after cursors; return the
    concatenated rows."""
    out, cursor = [], None
    for _ in range(pages):
        b = dict(body, size=size)
        if cursor is not None:
            b["search_after"] = list(cursor)
        page = [tuple(r) for r in
                es_query(docs, "doc_id", "text", b).collect()]
        if not page:
            break
        out.extend(page)
        cursor = (page[-1][1], page[-1][0])
    return out


def test_search_after_bool_query(spark, sf_dir):
    """Keyset pages of a filtered bool search stitch to exactly the
    one-shot top-N ranking (the 'next page of a filtered search' body)."""
    docs = load(spark, sf_dir, "documents")
    body = {"query": {"bool": {
        "must": [{"match": {"text": "spark stream"}}],
        "filter": [{"range": {"n_chars": {"gte": 100}}}],
    }}}
    walked = _page_walk(docs, body, size=4, pages=3)
    one_shot = [tuple(r) for r in
                es_query(docs, "doc_id", "text",
                         dict(body, size=12)).collect()]
    assert walked == one_shot[:len(walked)] and len(walked) >= 8


def test_search_after_multi_match_fields(spark, sf_dir):
    """Keyset pages for multi-field best_fields/most_fields stitch to the
    one-shot ranking."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("substr(text, 1, 80)").alias("title"),
        F.expr("substr(text, 81)").alias("body"),
    )
    for mm_type in ("best_fields", "most_fields"):
        body = {"query": {"multi_match": {
            "query": "spark join stream window",
            "type": mm_type, "fields": ["title", "body"],
        }}}
        walked = _page_walk(d, body, size=4, pages=3)
        one_shot = [tuple(r) for r in
                    es_query(d, "doc_id", "title",
                             dict(body, size=12)).collect()]
        assert walked == one_shot[:len(walked)] and len(walked) >= 8


def test_search_after_dis_max_and_function_score(spark, sf_dir):
    """The compound scorers' keyset tiers: pages stitch to the one-shot
    ranking for dis_max and function_score too."""
    docs = load(spark, sf_dir, "documents")
    for body in (
        {"query": {"dis_max": {"queries": [
            {"match": {"text": "spark stream"}},
            {"match": {"text": "window join"}}],
            "tie_breaker": 0.3}}},
        {"query": {"function_score": {
            "query": {"match": {"text": "spark stream"}},
            "functions": [{"field_value_factor": {
                "field": "n_chars", "factor": 0.001,
                "modifier": "log1p"}}]}}},
    ):
        walked = _page_walk(docs, body, size=4, pages=3)
        one_shot = [tuple(r) for r in
                    es_query(docs, "doc_id", "text",
                             dict(body, size=12)).collect()]
        assert walked == one_shot[:len(walked)] and len(walked) >= 8


def test_search_after_unsupported_scored_shapes_are_loud(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    with pytest.raises(UnsupportedEsQuery, match="search_after"):
        es_query(docs, "doc_id", "text", {
            "query": {"wildcard": {"text": "spar*"}},
            "search_after": [1.0, 0], "size": 5})
    with pytest.raises(UnsupportedEsQuery, match="search_after"):
        es_query(docs, "doc_id", "text", {
            "query": {"multi_match": {"query": "spark", "type": "phrase",
                                      "fields": ["text"]}},
            "search_after": [1.0, 0], "size": 5})
    # non-numeric cursor score is loud
    with pytest.raises(UnsupportedEsQuery, match="search_after"):
        es_query(docs, "doc_id", "text", {
            "query": {"match": {"text": "spark"}},
            "search_after": ["high", 0], "size": 5})


# ------------------------------------------------------ retriever.linear


def test_retriever_linear(engine):
    """ES 8.18 linear retriever: per-arm minmax normalization within the
    window, weighted sum, absent arm contributes 0 — verified against an
    independent Spark computation; normalizer anything-but-minmax (incl.
    ES's raw-sum default `none`) and unknown arm keys stay loud."""
    from pyspark.sql import Window as W

    from pandemic_knowledge_spark.operators.search import (
        bm25_search,
        linear_fuse,
    )
    from pandemic_knowledge_spark.operators.similarity import (
        knn_brute_force,
    )

    emb = engine.table("embeddings")
    docs = engine.table("documents")
    vec = emb.first()["embedding"]
    got = engine.es_search({
        "retriever": {"linear": {
            "retrievers": [
                {"retriever": {"standard": {"query": {
                    "match": {"text": "spark stream"}}}},
                 "weight": 2.0, "normalizer": "minmax"},
                {"retriever": {"knn": {"field": "embedding",
                                       "query_vector": vec, "k": 20}},
                 "weight": 1.0, "normalizer": "minmax"},
            ],
            "rank_window_size": 20,
        }},
        "size": 10,
    })["hits"]
    text_hits = bm25_search(docs, "doc_id", "text", "spark stream", k=20)
    vec_hits = knn_brute_force(emb, "embedding", "vec_id", vec, k=20)
    want = linear_fuse([(text_hits, "doc_id", "score", 2.0),
                        (vec_hits, "vec_id", "cos_sim", 1.0)], k=10)
    assert rows(got) == rows(want) and rows(got)
    # hand-check one fused score: weighted minmax of the two arms
    t = {r["doc_id"]: r["score"] for r in text_hits.collect()}
    v = {r["vec_id"]: r["cos_sim"] for r in vec_hits.collect()}
    tmn, tmx = min(t.values()), max(t.values())
    vmn, vmx = min(v.values()), max(v.values())
    top = rows(got)[0]
    expect = 0.0
    if top[0] in t:
        expect += 2.0 * (t[top[0]] - tmn) / (tmx - tmn)
    if top[0] in v:
        expect += 1.0 * (v[top[0]] - vmn) / (vmx - vmn)
    assert abs(top[1] - expect) < 1e-6

    base_arm = {"retriever": {"standard": {"query": {
        "match": {"text": "spark"}}}}, "normalizer": "minmax"}
    knn_arm = {"retriever": {"knn": {"field": "embedding",
                                     "query_vector": vec, "k": 5}},
               "normalizer": "minmax"}
    # normalizer none / absent = raw-score sum — refused with rationale
    with pytest.raises(UnsupportedEsQuery, match="minmax"):
        engine.es_search({"retriever": {"linear": {"retrievers": [
            {**base_arm, "normalizer": "none"}, knn_arm]}}})
    with pytest.raises(UnsupportedEsQuery, match="normalizer"):
        engine.es_search({"retriever": {"linear": {"retrievers": [
            {"retriever": base_arm["retriever"]}, knn_arm]}}})
    # unknown arm keys are loud
    with pytest.raises(UnsupportedEsQuery, match="unsupported"):
        engine.es_search({"retriever": {"linear": {"retrievers": [
            {**base_arm, "rescorer": {}}, knn_arm]}}})


# ------------------------------------- composition wave: collapse & pals


def test_collapse_with_source_highlight_min_score(spark, sf_dir):
    """collapse now composes with _source / highlight / min_score on the
    scored route: the representatives page keeps collapse_key, gains the
    projected columns and the marked text, and sub-threshold groups
    vanish (monotone gate)."""
    from pandemic_knowledge_spark.engine import highlight_pattern
    from pandemic_knowledge_spark.operators.boolquery import (
        collapse_search,
    )

    docs = load(spark, sf_dir, "documents")
    body = {
        "query": {"match": {"text": "spark stream"}},
        "collapse": {"field": "lang"},
        "_source": ["source"],
        "highlight": {"fields": {"text": {}}},
        "size": 5,
    }
    got = es_query(docs, "doc_id", "text", body)
    assert got.columns == ["collapse_key", "doc_id", "score", "source",
                           "highlighted"]
    reps = collapse_search(docs, "doc_id", "text", "spark stream", "lang",
                           k=5)
    pattern = highlight_pattern("spark stream")
    want = (
        docs.select("doc_id", "source",
                    F.regexp_replace("text", pattern, "<em>$1</em>")
                    .alias("highlighted"))
        .join(reps, "doc_id")
        .select("collapse_key", "doc_id", "score", "source", "highlighted")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
    assert rows(got) == rows(want) and rows(got)
    # min_score: pick a threshold between reps' scores, groups vanish
    scores = sorted((r["score"] for r in reps.collect()), reverse=True)
    if len(set(scores)) > 1:
        cut = scores[1]
        kept = es_query(docs, "doc_id", "text",
                        {**body, "min_score": cut}).collect()
        assert all(r["score"] >= cut for r in kept)
        assert len(kept) < len(scores) or scores[0] == scores[-1]


def test_collapse_under_field_sort(spark, sf_dir):
    """The news app's 'latest per source' shape: collapse under a field
    sort keeps each group's FIRST hit in the sort order, page ordered by
    the same sort."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    got = es_query(ev, "event_id", None, {
        "query": {"match_all": {}},
        "sort": [{"ts": "desc"}],
        "collapse": {"field": "event_type"},
        "_source": ["event_type", "ts"],
        "size": 5,
    })
    w = W.partitionBy("event_type").orderBy(F.desc("ts"),
                                            F.asc("event_id"))
    want = (
        ev.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .orderBy(F.desc("ts"), F.asc("event_id"))
        .limit(5)
        .select(F.col("event_id").alias("doc_id"), "event_type", "ts")
    )
    assert rows(got) == rows(want) and rows(got)
    # collapse × search_after pages the REPRESENTATIVES: page 2 via the
    # last rep's cursor == the one-shot rep list's next rows
    all_reps = es_query(ev, "event_id", None, {
        "query": {"match_all": {}}, "sort": [{"ts": "desc"}],
        "collapse": {"field": "event_type"},
        "_source": ["event_type", "ts"], "size": 10,
    }).collect()
    if len(all_reps) > 2:
        cur = [all_reps[1]["ts"], all_reps[1]["doc_id"]]
        page2 = es_query(ev, "event_id", None, {
            "query": {"match_all": {}}, "sort": [{"ts": "desc"}],
            "collapse": {"field": "event_type"},
            "_source": ["event_type", "ts"], "size": 10,
            "search_after": cur,
        }).collect()
        assert [tuple(r) for r in page2] == [tuple(r)
                                             for r in all_reps[2:]]


def test_collapse_scored_search_after(spark, sf_dir):
    """Scored collapse pages by the representatives' [score, doc_id]."""
    docs = load(spark, sf_dir, "documents")
    base = {"query": {"match": {"text": "spark stream"}},
            "collapse": {"field": "lang"}, "size": 10}
    reps = es_query(docs, "doc_id", "text", base).collect()
    assert len(reps) >= 2
    cur = [reps[0]["score"], reps[0]["doc_id"]]
    page2 = es_query(docs, "doc_id", "text",
                     {**base, "search_after": cur}).collect()
    assert [tuple(r) for r in page2] == [tuple(r) for r in reps[1:]]


def test_terms_min_doc_count(spark, sf_dir):
    """terms min_doc_count >= 1 prunes buckets before the size cut;
    0 (unmatched-value buckets) and nested uses stay loud."""
    from pandemic_knowledge_spark.operators.esdsl import es_aggs

    ev = load(spark, sf_dir, "events")
    full = es_aggs(ev, {"aggs": {"t": {"terms": {
        "field": "event_type", "size": 10}}}})["t"].collect()
    assert full
    cut = sorted(r["doc_count"] for r in full)[len(full) // 2]
    pruned = es_aggs(ev, {"aggs": {"t": {"terms": {
        "field": "event_type", "size": 10,
        "min_doc_count": int(cut)}}}})["t"].collect()
    assert pruned == [r for r in full if r["doc_count"] >= cut]
    with pytest.raises(UnsupportedEsQuery, match="min_doc_count"):
        es_aggs(ev, {"aggs": {"t": {"terms": {
            "field": "event_type", "min_doc_count": 0}}}})
    # nested parent: min_doc_count prunes by the parent's TOTAL before
    # the size cut (r13 — was loud; the dense 0 form stays loud)
    totals = {r["key"]: r["doc_count"] for r in full}
    floor_ = sorted(totals.values())[len(totals) // 2]
    nested = es_aggs(ev, {"aggs": {"t": {
        "terms": {"field": "event_type", "size": 10,
                  "min_doc_count": int(floor_)},
        "aggs": {"m": {"date_histogram": {
            "field": "ts", "calendar_interval": "month"}}}}}})["t"]
    assert {r["key"] for r in nested.collect()} == {
        k for k, v in totals.items() if v >= floor_}


def test_engine_count(engine):
    """The _count API: membership count, match_all default."""
    docs = engine.table("documents")
    n_all = engine.count().collect()[0]["count"]
    assert n_all == docs.count()
    n_en = engine.count({"term": {"lang": "en"}}).collect()[0]["count"]
    assert n_en == docs.where(F.col("lang") == "en").count()
    n_bool = engine.count({"bool": {
        "must": [{"match": {"text": "spark"}}],
        "filter": [{"range": {"n_chars": {"gte": 100}}}],
    }}).collect()[0]["count"]
    assert 0 < n_bool <= n_all


def test_search_after_with_post_filter(spark, sf_dir):
    """post_filter × search_after: the fold rewrites the query as
    bool{must, filter}, whose keyset tier pages the post-filtered ranked
    list — pages stitch to the folded bool one-shot."""
    docs = load(spark, sf_dir, "documents")
    pf_body = {"query": {"match": {"text": "spark stream"}},
               "post_filter": {"range": {"n_chars": {"gte": 100}}}}
    bool_body = {"query": {"bool": {
        "must": [{"match": {"text": "spark stream"}}],
        "filter": [{"range": {"n_chars": {"gte": 100}}}]}}}
    one_shot = [tuple(r) for r in
                es_query(docs, "doc_id", "text",
                         dict(bool_body, size=12)).collect()]
    walked = _page_walk(docs, pf_body, size=4, pages=3)
    assert walked == one_shot[:len(walked)] and len(walked) >= 8


def test_min_score_with_search_after(spark, sf_dir):
    """min_score × search_after on the plain-match keyset tier: the gate
    drops a suffix of the cursor-pruned heap."""
    docs = load(spark, sf_dir, "documents")
    base = {"query": {"match": {"text": "spark stream"}}, "size": 50}
    all_rows = es_query(docs, "doc_id", "text", base).collect()
    assert len(all_rows) >= 6
    cursor = (all_rows[1]["score"], all_rows[1]["doc_id"])
    cut = all_rows[len(all_rows) // 2]["score"]
    got = es_query(docs, "doc_id", "text", {
        **base, "search_after": list(cursor), "min_score": cut,
    }).collect()
    want = [(r["doc_id"], r["score"]) for r in all_rows[2:]
            if r["score"] >= cut][:50]
    assert [(r["doc_id"], r["score"]) for r in got] == want


# ---------------------------------------------------------- bucket_script


def test_bucket_script(spark, sf_dir):
    """Kibana's per-bucket arithmetic (filter-ratio / TSVB math): the
    restricted params-arithmetic grammar over sibling metrics, guarded
    division, selectors able to reference the scripted column."""
    from pandemic_knowledge_spark.operators.esdsl import es_aggs

    ev = load(spark, sf_dir, "events")
    out = es_aggs(ev, {"aggs": {"t": {
        "terms": {"field": "event_type", "size": 5},
        "aggs": {
            "vmax": {"max": {"field": "value"}},
            "per_doc": {"bucket_script": {
                "buckets_path": {"m": "vmax", "c": "_count"},
                "script": "params.m / params.c"}},
            "fancy": {"bucket_script": {
                "buckets_path": {"m": "vmax", "c": "_count"},
                "script": "(params.m * 2 + 1) / (params.c - 0.5)"}},
        }}}})["t"].collect()
    assert out
    for r in out:
        assert r["per_doc"] == pytest.approx(
            float(r["vmax"]) / float(r["doc_count"]))
        assert r["fancy"] == pytest.approx(
            (float(r["vmax"]) * 2 + 1) / (float(r["doc_count"]) - 0.5))
    # a selector referencing the scripted column (scripts run first)
    cut = sorted(r["per_doc"] for r in out)[len(out) // 2]
    gated = es_aggs(ev, {"aggs": {"t": {
        "terms": {"field": "event_type", "size": 5},
        "aggs": {
            "vmax": {"max": {"field": "value"}},
            "per_doc": {"bucket_script": {
                "buckets_path": {"m": "vmax", "c": "_count"},
                "script": "params.m / params.c"}},
            "gate": {"bucket_selector": {
                "buckets_path": {"r": "per_doc"},
                "script": f"params.r >= {cut}"}},
        }}}})["t"].collect()
    assert gated and all(r["per_doc"] >= cut for r in gated)
    assert len(gated) < len(out) or all(r["per_doc"] >= cut for r in out)
    # real Painless stays loud
    from pandemic_knowledge_spark.operators.esdsl import UnsupportedEsQuery
    for bad in ("Math.log(params.m)", "params.m > 1 ? 1 : 0",
                "params.unbound + 1"):
        with pytest.raises(UnsupportedEsQuery, match="bucket_script"):
            es_aggs(ev, {"aggs": {"t": {
                "terms": {"field": "event_type", "size": 5},
                "aggs": {
                    "vmax": {"max": {"field": "value"}},
                    "x": {"bucket_script": {
                        "buckets_path": {"m": "vmax"},
                        "script": bad}}}}}})["t"].collect()
    # division by a zero-capable expression raises AT EVALUATION
    import py4j.protocol
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    with pytest.raises(Exception, match="division by zero"):
        es_aggs(ev, {"aggs": {"t": {
            "terms": {"field": "event_type", "size": 5},
            "aggs": {
                "vmax": {"max": {"field": "value"}},
                "x": {"bucket_script": {
                    "buckets_path": {"m": "vmax", "c": "_count"},
                    "script": "params.m / (params.c - params.c)"}}}}}},
        )["t"].collect()


def test_shard_size_subsumed(spark, sf_dir):
    """Kibana sends shard_size on terms / significant_terms panels; this
    engine's counts are exact global aggregates (the shard_size→∞
    limit), so the knob is accepted and results are identical with and
    without it."""
    from pandemic_knowledge_spark.operators.esdsl import es_aggs

    ev = load(spark, sf_dir, "events")
    base = {"aggs": {"t": {"terms": {"field": "event_type", "size": 3}}}}
    with_ss = {"aggs": {"t": {"terms": {
        "field": "event_type", "size": 3, "shard_size": 25}}}}
    assert rows(es_aggs(ev, base)["t"]) == rows(es_aggs(ev, with_ss)["t"])

    docs = load(spark, sf_dir, "documents")
    sig = {"query": {"range": {"n_chars": {"gte": 400}}},
           "aggs": {"s": {"significant_terms": {
               "field": "lang", "size": 5, "min_doc_count": 1}}}}
    sig_ss = {**sig, "aggs": {"s": {"significant_terms": {
        "field": "lang", "size": 5, "min_doc_count": 1,
        "shard_size": 50}}}}
    a = es_aggs(docs, sig, text_col="text")["s"]
    b = es_aggs(docs, sig_ss, text_col="text")["s"]
    assert rows(a) == rows(b) and rows(a)


def test_top_level_metric_aggs(spark, sf_dir):
    """The Kibana single-stat panel: a top-level metric agg is one
    ungrouped scan-side aggregate — same expressions as the bucketed
    paths, DuckDB-parity-checked."""
    from tests.oracle_harness import compare_query

    def fn_avg(spark, sf_dir):
        from pandemic_knowledge_spark.operators.esdsl import es_aggs

        return es_aggs(load(spark, sf_dir, "events"), {
            "query": {"term": {"event_type": "purchase"}},
            "aggs": {"avg_value": {"avg": {"field": "value"}}},
        })["avg_value"]

    errs, cnt = compare_query(spark, sf_dir, fn_avg, """
SELECT avg(value) AS avg_value FROM events WHERE event_type = 'purchase'
""")
    assert not errs and cnt == 1

    def fn_stats(spark, sf_dir):
        from pandemic_knowledge_spark.operators.esdsl import es_aggs

        return es_aggs(load(spark, sf_dir, "orders"), {
            "aggs": {"s": {"stats": {"field": "o_custkey"}}},
        })["s"]

    errs, cnt = compare_query(spark, sf_dir, fn_stats, """
SELECT CAST(count(o_custkey) AS BIGINT) AS s_count,
       min(o_custkey) AS s_min, max(o_custkey) AS s_max,
       CAST(sum(o_custkey) AS BIGINT) AS s_sum,
       avg(CAST(o_custkey AS DOUBLE)) AS s_avg
FROM orders
""")
    assert not errs and cnt == 1

    from pandemic_knowledge_spark.operators.esdsl import (
        UnsupportedEsQuery,
        es_aggs,
    )
    ev = load(spark, sf_dir, "events")
    with pytest.raises(UnsupportedEsQuery, match="sub-aggregations"):
        es_aggs(ev, {"aggs": {"a": {"avg": {"field": "value"},
                                    "aggs": {"b": {"max": {
                                        "field": "value"}}}}}})
    with pytest.raises(UnsupportedEsQuery, match="top level"):
        es_aggs(ev, {"aggs": {"m": {"median_absolute_deviation": {
            "field": "value"}}}})


def test_range_epoch_millis_and_date_math(spark, sf_dir):
    """Kibana time-picker bodies: range with format epoch_millis
    converts driver-side to typed timestamp literals (identical rows to
    the ISO spelling); date-math strings and unknown formats raise with
    the path instead of a mid-job cast error."""
    from pandemic_knowledge_spark.operators.esdsl import es_aggs

    ev = load(spark, sf_dir, "events")
    lo_ms, hi_ms = 1577836800000, 1893456000000  # 2020..2030 UTC
    body = {"query": {"range": {"ts": {
        "gte": lo_ms, "lte": hi_ms, "format": "epoch_millis"}}},
        "aggs": {"d": {"date_histogram": {"field": "ts",
                                          "calendar_interval": "month"}}}}
    got = es_aggs(ev, body)["d"].collect()
    iso = es_aggs(ev, {"query": {"range": {"ts": {
        "gte": "2020-01-01 00:00:00", "lte": "2030-01-01 00:00:00",
        "format": "strict_date_optional_time"}}},
        "aggs": {"d": {"date_histogram": {"field": "ts",
                                          "calendar_interval": "month"}}}}
    )["d"].collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in iso] and got
    # now-anchored math stays refused (non-deterministic server clock);
    # ANCHORED ||-math is implemented since the r13 late wave and is
    # covered by tests/test_es_datemath_r13.py
    for bad in ({"gte": "now-7d/d"},
                {"gte": 1, "format": "basic_date"}):
        with pytest.raises(UnsupportedEsQuery,
                           match="date math|format"):
            es_aggs(ev, {"query": {"range": {"ts": bad}},
                         "aggs": {"d": {"date_histogram": {
                             "field": "ts",
                             "calendar_interval": "month"}}}})
    # the scored/filter context takes the same normalization
    out = es_query(ev, "event_id", None, {
        "query": {"bool": {"filter": [
            {"range": {"ts": {"gte": lo_ms, "format": "epoch_millis"}}},
            {"term": {"event_type": "purchase"}}]}},
        "sort": [{"ts": "desc"}], "size": 3})
    assert out.count() == 3


def test_fixed_interval_widths(spark, sf_dir):
    """Kibana auto-interval histograms: arbitrary fixed_interval widths
    bucket at floor(epoch/w)·w (epoch-anchored, ES semantics), ride the
    dense spine + pipeline machinery unchanged, and DuckDB-parity-check
    bit-exact."""
    from tests.oracle_harness import compare_query

    def fn(spark, sf_dir):
        from pandemic_knowledge_spark.operators.esdsl import es_aggs

        return es_aggs(load(spark, sf_dir, "events"), {"aggs": {"d": {
            "date_histogram": {"field": "ts", "fixed_interval": "12h"},
            "aggs": {"v": {"max": {"field": "value"}}},
        }}})["d"]

    errs, cnt = compare_query(spark, sf_dir, fn, """
SELECT CAST(to_timestamp(floor(epoch(ts) / 43200) * 43200) AS TIMESTAMP)
         AS key,
       CAST(count(*) AS BIGINT) AS doc_count, max(value) AS v
FROM events GROUP BY 1 ORDER BY key
""")
    assert not errs and cnt > 0
