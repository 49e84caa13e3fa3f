"""Wave-5 ES surface (r10): span_near proximity (ordered + unordered),
the percolate reverse-search door (batch join tier + the percolate_mark
streaming form), range/exists metadata gates, constant_score wrapped
membership, phrase slop in every phrase context, match operator /
term-level minimum_should_match, and the round's review-regression pins
(indexed-door option parity, NULL-safe must_not, analyzed negations).
Oracle parity runs through the same harness the driver uses; semantics
pinned on synthetic corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandemic_knowledge_spark.engine import Engine
from pandemic_knowledge_spark.operators.boolquery import (
    bool_search,
    sql_bool_search,
)
from pandemic_knowledge_spark.operators.search import (
    percolate,
    phrase_search,
    span_near_search,
    sql_percolate,
    sql_span_near_search,
)
from pandemic_knowledge_spark.tables import load
from tests.oracle_harness import compare_query


# --------------------------------------------------------------- span_near


@pytest.mark.parametrize(
    "query,slop",
    [("spark stream", 0), ("spark stream", 2), ("fast table scan", 3)],
)
def test_span_near_matches_duckdb(spark, sf_dir, query, slop):
    fn = lambda s, d: span_near_search(
        load(s, d, "documents"), "doc_id", "text", query, slop=slop, k=25
    )
    problems, n = compare_query(
        spark, sf_dir, fn,
        sql_span_near_search("documents", "doc_id", "text", query,
                             slop=slop, k=25),
    )
    assert problems == []


def test_span_near_slop0_is_exact_phrase(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    ph = sorted(
        tuple(r) for r in
        phrase_search(docs, "doc_id", "text", "fast scan", k=100).collect()
    )
    sn = sorted(
        tuple(r) for r in
        span_near_search(docs, "doc_id", "text", "fast scan",
                         slop=0, k=100).collect()
    )
    assert ph == sn and ph  # non-vacuous


def test_span_near_semantics_pinned(spark):
    docs = spark.createDataFrame(
        [
            (1, "a x b"),        # gap 1 — needs slop >= 1
            (2, "a b"),          # consecutive
            (3, "b a"),          # out of order — never matches (in_order)
            (4, "a x x x b"),    # gap 3 — needs slop >= 3
            (5, "a x b a b"),    # two qualifying starts at slop >= 1
        ],
        "doc_id long, text string",
    )

    def hits(slop):
        return {
            r["doc_id"]: r["span_count"]
            for r in span_near_search(
                docs, "doc_id", "text", "a b", slop=slop, k=10
            ).collect()
        }

    assert hits(0) == {2: 1, 5: 1}
    assert hits(1) == {1: 1, 2: 1, 5: 2}
    assert hits(3) == {1: 1, 2: 1, 4: 1, 5: 2}


def test_span_near_window_is_slack_not_distance_per_gap(spark):
    # total slack across ALL gaps: 'a x b x c' has slack 2, so slop=1 misses
    docs = spark.createDataFrame(
        [(1, "a x b x c"), (2, "a b x c"), (3, "a b c")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]
        for r in span_near_search(
            docs, "doc_id", "text", "a b c", slop=1, k=10
        ).collect()
    }
    assert got == {2, 3}


@pytest.mark.parametrize(
    "query,slop",
    [("spark stream", 1), ("fast table scan", 2)],
)
def test_span_near_unordered_matches_duckdb(spark, sf_dir, query, slop):
    fn = lambda s, d: span_near_search(
        load(s, d, "documents"), "doc_id", "text", query,
        slop=slop, k=25, in_order=False,
    )
    problems, n = compare_query(
        spark, sf_dir, fn,
        sql_span_near_search("documents", "doc_id", "text", query,
                             slop=slop, k=25, in_order=False),
    )
    assert problems == [] and n > 0


def test_span_near_unordered_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "b a"),          # reversed — unordered matches, ordered not
            (2, "a b"),
            (3, "b x a"),        # reversed with gap 1
            (4, "a x x b"),      # ordered gap 2
            (5, "b c"),          # missing 'a'
        ],
        "doc_id long, text string",
    )

    def hits(slop, in_order):
        return {
            r["doc_id"]
            for r in span_near_search(
                docs, "doc_id", "text", "a b", slop=slop, k=10,
                in_order=in_order,
            ).collect()
        }

    assert hits(0, True) == {2}
    assert hits(0, False) == {1, 2}       # reversal is free when unordered
    assert hits(1, False) == {1, 2, 3}
    assert hits(2, False) == {1, 2, 3, 4}
    with pytest.raises(ValueError, match="distinct"):
        span_near_search(docs, "doc_id", "text", "a a", in_order=False)
    with pytest.raises(ValueError, match="distinct"):
        sql_span_near_search("documents", "doc_id", "text", "a a",
                             in_order=False)


def test_span_near_validation(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="2 tokenizable"):
        span_near_search(docs, "doc_id", "text", "solo", slop=1)
    with pytest.raises(ValueError, match="slop"):
        span_near_search(docs, "doc_id", "text", "a b", slop=-1)
    with pytest.raises(ValueError, match="2 tokenizable"):
        sql_span_near_search("documents", "doc_id", "text", "solo", slop=1)


def test_span_near_engine_facade(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    via_engine = sorted(
        tuple(r)
        for r in eng.span_near("spark stream", slop=3, k=15).collect()
    )
    direct = sorted(
        tuple(r)
        for r in span_near_search(
            load(spark, sf_dir, "documents"), "doc_id", "text",
            "spark stream", slop=3, k=15,
        ).collect()
    )
    assert via_engine == direct


# --------------------------------------------------------------- percolate

_REG = [
    ("alert_stream_join", "stream join"),
    ("alert_fast_scan_table", "fast scan table"),
    ("alert_spark", "spark"),
]


def test_percolate_matches_duckdb(spark, sf_dir):
    fn = lambda s, d: percolate(load(s, d, "documents"), "doc_id", "text", _REG)
    problems, n = compare_query(
        spark, sf_dir, fn,
        sql_percolate("documents", "doc_id", "text", _REG),
    )
    assert problems == [] and n > 0


def test_percolate_is_conjunctive(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark streams data"),
            (2, "spark and flink stream side by side"),
            (3, "flink only"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["query_id"], r["doc_id"])
        for r in percolate(
            docs, "doc_id", "text",
            [("q_both", "spark stream"), ("q_flink", "flink")],
        ).collect()
    }
    # doc 1 holds 'spark' but not the token 'stream' (no stemming — the
    # analyzed token is 'streams'): conjunctive match requires ALL terms
    assert got == {("q_both", 2), ("q_flink", 2), ("q_flink", 3)}


def test_percolate_validation(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="at least one"):
        percolate(docs, "doc_id", "text", [])
    with pytest.raises(ValueError, match="no tokenizable"):
        percolate(docs, "doc_id", "text", [("bad", "~~")])
    with pytest.raises(ValueError, match="no tokenizable"):
        sql_percolate("documents", "doc_id", "text", [("bad", "...")])
    # duplicate ids would merge term rows into one unreachable conjunctive
    # count (a silent never-matches) — rejected on both engines
    with pytest.raises(ValueError, match="unique"):
        percolate(docs, "doc_id", "text", [("q", "a"), ("q", "b")])
    with pytest.raises(ValueError, match="unique"):
        sql_percolate("documents", "doc_id", "text", [("q", "a"), ("q", "b")])


def test_percolate_mark_equals_percolate(spark, sf_dir):
    """The scan-side streaming form must agree with the broadcast-join
    batch tier: exploding matched_queries == percolate()'s rows. Also pins
    the single-tokenize plan (the multi-reference CollapseProject guard)."""
    from pandemic_knowledge_spark.operators.search import percolate_mark

    docs = load(spark, sf_dir, "documents")
    marked = percolate_mark(docs, "text", _REG)
    via_mark = {
        (r["query_id"], r["doc_id"])
        for r in marked.select(
            "doc_id", F.explode("matched_queries").alias("query_id")
        ).collect()
    }
    via_join = {
        (r["query_id"], r["doc_id"])
        for r in percolate(docs, "doc_id", "text", _REG).collect()
    }
    assert via_mark == via_join and via_mark
    plan = marked._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("regexp_extract_all") == 1
    assert "element_at(regexp_extract_all(" not in plan
    # single-query registration must keep the materialized column too
    one = percolate_mark(docs, "text", [("solo", "spark stream")])
    p1 = one._jdf.queryExecution().optimizedPlan().toString()
    assert p1.count("regexp_extract_all") == 1


def test_percolate_mark_streaming_append(spark, tmp_path):
    """percolate-at-ingest: the transform runs on a file stream in APPEND
    mode (stateless — no watermark, no aggregation) and the landed marks
    equal the batch run over the same rows."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from pandemic_knowledge_spark.operators.search import percolate_mark
    from pandemic_knowledge_spark.streaming import file_stream

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    rows = [
        (1, "spark streams data quickly"),
        (2, "spark and flink stream side by side"),
        (3, "flink only here"),
        (4, None),
    ]
    reg = [("q_both", "spark stream"), ("q_flink", "flink")]
    landing = str(tmp_path / "landing")
    df = spark.createDataFrame(rows[:2], schema)
    df.coalesce(1).write.parquet(landing)
    spark.createDataFrame(rows[2:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(landing)

    stream = file_stream(spark, landing, schema, max_files_per_trigger=1)
    out = str(tmp_path / "marks")
    q = (
        percolate_mark(stream, "text", reg)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (None if r["matched_queries"] is None
                      else tuple(r["matched_queries"]))
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        r["doc_id"]: (None if r["matched_queries"] is None
                      else tuple(r["matched_queries"]))
        for r in percolate_mark(
            spark.createDataFrame(rows, schema), "text", reg
        ).collect()
    }
    assert got == batch
    assert got[2] == ("q_both", "q_flink") and got[3] == ("q_flink",)
    assert got[1] == () and got[4] is None


def test_percolate_engine_facade(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    via_engine = sorted(
        tuple(r) for r in eng.percolate(_REG).collect()
    )
    direct = sorted(
        tuple(r)
        for r in percolate(
            load(spark, sf_dir, "documents"), "doc_id", "text", _REG
        ).collect()
    )
    assert via_engine == direct


# ------------------------------------------------- bool range/exists gates

_BQ = dict(
    must=[{"match": "spark stream"}],
    filter=[
        {"range": {"n_chars": {"gte": 120, "lt": 420}}},
        {"exists": {"field": "lang"}},
    ],
    must_not=[{"term": "vector"}],
    k=12,
)


def test_bool_range_exists_matches_duckdb(spark, sf_dir):
    fn = lambda s, d: bool_search(load(s, d, "documents"), "doc_id", "text", **_BQ)
    problems, n = compare_query(
        spark, sf_dir, fn,
        sql_bool_search("documents", "doc_id", "text", **_BQ),
    )
    assert problems == [] and n > 0


def test_bool_range_gates_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple pie", 100, "en"),
            (2, "apple tart", 250, None),
            (3, "apple cake", 250, "fr"),
            (4, "pear cake", 250, "en"),
        ],
        "doc_id long, text string, n_chars long, lang string",
    )
    got = {
        r["doc_id"]
        for r in bool_search(
            docs, "doc_id", "text",
            must=[{"match": "apple"}],
            filter=[
                {"range": {"n_chars": {"gt": 100}}},
                {"exists": {"field": "lang"}},
            ],
            k=10,
        ).collect()
    }
    # 1 fails gt-100, 2 fails exists, 4 fails the must — only 3 qualifies
    assert got == {3}


def test_bool_range_must_not_and_string_bounds(spark):
    docs = spark.createDataFrame(
        [(1, "apple", "en"), (2, "apple", "fr"), (3, "apple", "de")],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]
        for r in bool_search(
            docs, "doc_id", "text",
            must=[{"match": "apple"}],
            must_not=[{"range": {"lang": {"gte": "en"}}}],  # lexicographic
            k=10,
        ).collect()
    }
    assert got == {3}  # 'de' < 'en'; 'en' and 'fr' excluded


_BQ_PHRASE_GATES = dict(
    must=[{"match": "spark stream"}],
    filter=[{"phrase": "fast scan"}, {"range": {"n_chars": {"gte": 100}}}],
    must_not=[{"phrase": "big vector"}],
    k=12,
)


def test_bool_phrase_member_gates_match_duckdb(spark, sf_dir):
    # phrase clauses in filter/must_not context take the checkpointed
    # preds scan (materialized tokens — the per-position re-tokenize
    # regression); combined here with a range gate so the field-column
    # projection and the token projection coexist in one preds base
    fn = lambda s, d: bool_search(
        load(s, d, "documents"), "doc_id", "text", **_BQ_PHRASE_GATES
    )
    problems, n = compare_query(
        spark, sf_dir, fn,
        sql_bool_search("documents", "doc_id", "text", **_BQ_PHRASE_GATES),
    )
    assert problems == [] and n > 0


# ---------------------------------------------------- phrase slop everywhere

_BQ_SLOP = dict(
    must=[{"phrase": "spark stream", "slop": 3, "boost": 1.5}],
    should=[{"match": "window join"}],
    filter=[{"phrase": "fast scan", "slop": 2}],
    k=12,
)


def test_phrase_slop_scored_and_filter_match_duckdb(spark, sf_dir):
    # slop phrases in a scored must AND a membership filter, one query
    fn = lambda s, d: bool_search(load(s, d, "documents"), "doc_id", "text",
                                  **_BQ_SLOP)
    problems, n = compare_query(
        spark, sf_dir, fn,
        sql_bool_search("documents", "doc_id", "text", **_BQ_SLOP),
    )
    assert problems == [] and n > 0


def test_phrase_slop_zero_is_unchanged(spark, sf_dir):
    # {"phrase": p} and {"phrase": p, "slop": 0} must be the same query
    docs = load(spark, sf_dir, "documents")
    a = bool_search(docs, "doc_id", "text",
                    must=[{"phrase": "fast scan"}], k=20).collect()
    b = bool_search(docs, "doc_id", "text",
                    must=[{"phrase": "fast scan", "slop": 0}], k=20).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_query_string_phrase_slop(spark, sf_dir):
    from pandemic_knowledge_spark.operators.boolquery import (
        parse_query_string,
        query_string_search,
    )

    qs = '+spark "fast scan"~2 -vector'
    parsed = parse_query_string(qs)
    assert {"phrase": "fast scan", "slop": 2} in parsed["should"]
    fn = lambda s, d: query_string_search(
        load(s, d, "documents"), "doc_id", "text", qs, k=10
    )
    problems, n = compare_query(
        spark, sf_dir, fn,
        sql_bool_search("documents", "doc_id", "text", k=10, **parsed),
    )
    assert problems == [] and n > 0


def test_phrase_slop_validation(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="slop"):
        bool_search(docs, "doc_id", "text",
                    must=[{"phrase": "a b", "slop": -1}], k=5)
    with pytest.raises(ValueError, match="slop"):
        sql_bool_search("documents", "doc_id", "text",
                        must=[{"phrase": "a b", "slop": -1}], k=5)


# ----------------------------------------------- match operator / term msm

_BQ_MATCH_AND = dict(
    must=[{"match": "spark stream table", "operator": "and"}],
    should=[{"match": "window join fast", "minimum_should_match": 2}],
    filter=[{"match": "scan query", "operator": "and"}],
    k=12,
)


def test_match_operator_and_msm_match_duckdb(spark, sf_dir):
    # term-level matching control in scored AND membership contexts
    fn = lambda s, d: bool_search(load(s, d, "documents"), "doc_id", "text",
                                  **_BQ_MATCH_AND)
    problems, n = compare_query(
        spark, sf_dir, fn,
        sql_bool_search("documents", "doc_id", "text", **_BQ_MATCH_AND),
    )
    assert problems == [] and n > 0


def test_match_operator_semantics(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "a"), (4, "c")],
        "doc_id long, text string",
    )

    def ids(clause):
        return {
            r["doc_id"]
            for r in bool_search(docs, "doc_id", "text",
                                 must=[clause], k=10).collect()
        }

    assert ids({"match": "a b c"}) == {1, 2, 3, 4}          # OR default
    assert ids({"match": "a b c", "operator": "and"}) == {1}
    assert ids({"match": "a b c", "minimum_should_match": 2}) == {1, 2}
    # msm clamps to the term count, as ES does
    assert ids({"match": "a b", "minimum_should_match": 9}) == {1, 2}


def test_match_operator_validation(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="'or' or 'and'"):
        bool_search(docs, "doc_id", "text",
                    must=[{"match": "a", "operator": "not"}], k=5)
    with pytest.raises(ValueError, match="operator='and' OR"):
        bool_search(docs, "doc_id", "text",
                    must=[{"match": "a b", "operator": "and",
                           "minimum_should_match": 2}], k=5)
    with pytest.raises(ValueError, match=">= 1"):
        sql_bool_search("documents", "doc_id", "text",
                        must=[{"match": "a b", "minimum_should_match": 0}],
                        k=5)


# ----------------------------------------------------------- constant_score

_BQ_CONST = dict(
    must=[{"match": "spark stream"}],
    should=[
        {"constant_score": {"term": "table"}, "boost": 2.0},
        {"constant_score": {"range": {"n_chars": {"gte": 300}}}, "boost": 0.5},
    ],
    k=12,
)


def test_constant_score_clauses_match_duckdb(spark, sf_dir):
    fn = lambda s, d: bool_search(load(s, d, "documents"), "doc_id", "text",
                                  **_BQ_CONST)
    problems, n = compare_query(
        spark, sf_dir, fn,
        sql_bool_search("documents", "doc_id", "text", **_BQ_CONST),
    )
    assert problems == [] and n > 0


def test_constant_score_dis_max_matches_duckdb(spark, sf_dir):
    from pandemic_knowledge_spark.operators.boolquery import (
        dis_max_search,
        sql_dis_max_search,
    )

    clauses = [
        {"match": "spark stream"},
        {"constant_score": {"phrase": "fast scan"}, "boost": 3.0},
    ]
    fn = lambda s, d: dis_max_search(
        load(s, d, "documents"), "doc_id", "text", clauses,
        tie_breaker=0.4, k=12,
    )
    problems, n = compare_query(
        spark, sf_dir, fn,
        sql_dis_max_search("documents", "doc_id", "text", clauses,
                           tie_breaker=0.4, k=12),
    )
    assert problems == [] and n > 0


def test_constant_score_semantics(spark):
    docs = spark.createDataFrame(
        [(1, "apple pie"), (2, "apple table"), (3, "pear table")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["score"]
        for r in bool_search(
            docs, "doc_id", "text",
            should=[{"constant_score": {"term": "table"}, "boost": 2.5}],
            minimum_should_match=1, k=10,
        ).collect()
    }
    assert got == {2: 2.5, 3: 2.5}  # flat boost, no idf/tf shaping


def test_range_exists_validation():
    from pandemic_knowledge_spark.operators.boolquery import (
        _member_pred,
        _sql_member_pred,
    )

    with pytest.raises(ValueError, match="exactly one field"):
        _member_pred(None, {"range": {"a": {"gte": 1}, "b": {"gte": 2}}})
    with pytest.raises(ValueError, match="non-empty subset"):
        _member_pred(None, {"range": {"a": {}}})
    with pytest.raises(ValueError, match="non-empty subset"):
        _member_pred(None, {"range": {"a": {"between": (1, 2)}}})
    # SQL twin: field clauses only valid where raw columns are in scope
    with pytest.raises(ValueError, match="filter/must_not context"):
        _sql_member_pred({"range": {"a": {"gte": 1}}})
    with pytest.raises(ValueError, match="filter/must_not context"):
        _sql_member_pred({"exists": {"field": "a"}})
    with pytest.raises(ValueError, match="numbers or strings"):
        _sql_member_pred({"range": {"a": {"gte": True}}}, "_r")


# -------------------------------------------------- r10 review regressions


def test_indexed_door_honors_new_clause_options(spark):
    """The indexed bool door must stay row-identical to the corpus door
    for the r10 clause options (match operator/minimum_should_match,
    phrase slop, constant_score) — it previously ignored them silently —
    and must REJECT range/exists cleanly (raw fields are not index
    artifacts)."""
    from pandemic_knowledge_spark.operators.boolquery import (
        bool_search_from_index,
    )
    from pandemic_knowledge_spark.operators.search import SearchIndex

    docs = spark.createDataFrame(
        [
            (1, "spark stream fast scan"),
            (2, "spark slow scan"),
            (3, "stream of data"),
            (4, "spark x stream"),
            (5, "fast spark stream scan table"),
        ],
        "doc_id long, text string",
    )
    idx = SearchIndex.build(docs, "doc_id", "text", cache=False,
                            positional=True)
    cases = [
        dict(must=[{"match": "spark stream", "operator": "and"}], k=10),
        dict(must=[{"match": "spark stream scan",
                    "minimum_should_match": 2}], k=10),
        dict(must=[{"phrase": "spark stream", "slop": 1}], k=10),
        dict(must=[{"match": "spark"}],
             filter=[{"phrase": "fast scan", "slop": 2}], k=10),
        dict(should=[{"constant_score": {"term": "table"}, "boost": 2.0},
                     {"match": "spark"}],
             minimum_should_match=1, k=10),
    ]
    for case in cases:
        via_corpus = sorted(
            map(tuple, bool_search(docs, "doc_id", "text", **case).collect())
        )
        via_index = sorted(
            map(tuple, bool_search_from_index(idx, **case).collect())
        )
        assert via_index == via_corpus, case
    with pytest.raises(ValueError, match="corpus door"):
        bool_search_from_index(
            idx, must=[{"match": "spark"}],
            filter=[{"range": {"n_chars": {"gte": 1}}}],
        ).collect()


def test_must_not_missing_field_keeps_doc(spark, tmp_path):
    """ES semantics: a doc whose field is NULL does not MATCH a range (or
    term-over-null-text) query, so a must_not must KEEP it — bare ~NULL
    dropped it under three-valued logic (r10 review find). Pinned on both
    engines over the same parquet."""
    import duckdb

    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "apple pie", 500), (2, "apple tart", None), (3, "apple", 10)],
        "doc_id long, text string, n_chars long",
    ).coalesce(1).write.parquet(path)
    docs = spark.read.parquet(path)
    bq = dict(must=[{"match": "apple"}],
              must_not=[{"range": {"n_chars": {"gte": 100}}}], k=10)
    got = {r["doc_id"] for r in
           bool_search(docs, "doc_id", "text", **bq).collect()}
    assert got == {2, 3}  # 2 has NULL n_chars: kept, not dropped
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}/*.parquet'")
    oracle = {r[0] for r in con.execute(
        sql_bool_search("documents", "doc_id", "text", **bq)).fetchall()}
    assert oracle == got


def test_query_string_negated_punctuated_token_excludes(spark):
    """'-covid-19' must exclude docs holding the ANALYZED tokens (covid,
    19) — the raw punctuated term could never equal a corpus token and
    the exclusion was a silent no-op (r10 review find)."""
    from pandemic_knowledge_spark.operators.boolquery import (
        parse_query_string,
        query_string_search,
    )

    parsed = parse_query_string("apple -covid-19")
    assert parsed["must_not"] == [{"match": "covid 19"}]
    docs = spark.createDataFrame(
        [(1, "apple covid-19 report"), (2, "apple sauce"), (3, "apple 19")],
        "doc_id long, text string",
    )
    got = {r["doc_id"] for r in query_string_search(
        docs, "doc_id", "text", "apple -covid-19", k=10).collect()}
    assert got == {2}  # 1 holds covid AND 19; 3 holds the sub-term 19


# ------------------------------------------------ nested membership bool

_BQ_NESTED = dict(
    must=[{"match": "spark stream"}],
    filter=[{
        "bool": {
            "should": [
                {"term": "table"},
                {"bool": {"must": [{"prefix": "quer"},
                                   {"range": {"n_chars": {"gte": 200}}}]}},
            ],
            "minimum_should_match": 1,
        }
    }],
    must_not=[{"bool": {"must": [{"term": "vector"},
                                 {"term": "window"}]}}],
    k=15,
)


def test_nested_membership_bool_matches_duckdb(spark, sf_dir):
    """ES filter trees: bool nested inside filter/must_not composes as
    pure boolean algebra (OR-of-filters, AND-groups, two levels deep,
    range leaves included) — identical on both engines."""
    fn = lambda s, d: bool_search(load(s, d, "documents"), "doc_id", "text",
                                  **_BQ_NESTED)
    problems, n = compare_query(
        spark, sf_dir, fn,
        sql_bool_search("documents", "doc_id", "text", **_BQ_NESTED),
    )
    assert problems == [] and n > 0


def test_nested_bool_semantics_and_null_safety(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple pie", 10),
            (2, "apple tart", None),
            (3, "apple cake", 300),
            (4, "apple", 300),
        ],
        "doc_id long, text string, n long",
    )
    got = {
        r["doc_id"]
        for r in bool_search(
            docs, "doc_id", "text",
            must=[{"match": "apple"}],
            filter=[{"bool": {"should": [
                {"term": "pie"},
                {"bool": {"must": [{"range": {"n": {"gte": 100}}},
                                   {"term": "cake"}]}},
            ]}}],
            k=10,
        ).collect()
    }
    # 1 via 'pie'; 3 via (n>=100 AND cake); 2's NULL n coalesces to a
    # non-match inside the OR (not a query-killing NULL); 4 matches neither
    assert got == {1, 3}
    with pytest.raises(ValueError, match="at least one clause"):
        bool_search(docs, "doc_id", "text", must=[{"match": "apple"}],
                    filter=[{"bool": {}}], k=5)


def test_nested_bool_rejected_by_indexed_door(spark):
    from pandemic_knowledge_spark.operators.boolquery import (
        bool_search_from_index,
    )
    from pandemic_knowledge_spark.operators.search import SearchIndex

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    idx = SearchIndex.build(docs, "doc_id", "text", cache=False)
    with pytest.raises(ValueError, match="corpus door"):
        bool_search_from_index(
            idx, must=[{"match": "a"}],
            filter=[{"bool": {"must": [{"term": "b"}]}}],
        ).collect()


def test_es_body_nested_bool_filter(spark, sf_dir):
    from pandemic_knowledge_spark.operators.esdsl import es_query

    docs = load(spark, sf_dir, "documents")
    body = {"query": {"bool": {
        "must": [{"match": {"text": "spark stream"}}],
        "filter": [{"bool": {"should": [
            {"term": {"text": "table"}},
            {"range": {"n_chars": {"gte": 400}}},
        ]}}],
    }}, "size": 12}
    got = sorted(map(tuple, es_query(docs, "doc_id", "text", body).collect()))
    want = sorted(map(tuple, bool_search(
        docs, "doc_id", "text",
        must=[{"match": "spark stream"}],
        filter=[{"bool": {"should": [{"term": "table"},
                                     {"range": {"n_chars": {"gte": 400}}}],
                          "must": [], "must_not": [], "filter": []}}],
        k=12,
    ).collect()))
    assert got == want and got
