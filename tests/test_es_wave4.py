"""Wave-4 ES surface (r10): function_score compound query, the ES-8
hybrid query+knn retriever door, and the phrase suggester — r9 verdict
tasks #5–7. Oracle parity runs through the same harness the driver uses;
semantics pinned on synthetic corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandemic_knowledge_spark.engine import Engine
from pandemic_knowledge_spark.operators.boolquery import (
    function_score_search,
    sql_function_score_search,
)
from pandemic_knowledge_spark.operators.search import (
    phrase_suggest,
    sql_phrase_suggest,
)
from pandemic_knowledge_spark.tables import load
from tests.oracle_harness import compare_query

_FS_QUERY = {"match": "spark stream"}
_FS_FUNCTIONS = [
    {
        "field_value_factor": {
            "field": "n_chars", "factor": 0.01, "modifier": "log1p",
            "missing": 1.0,
        }
    },
    {"weight": 2.0, "filter": {"term": "table"}},
]


# ----------------------------------------------------------- function_score


@pytest.mark.parametrize(
    "modes",
    [
        dict(score_mode="multiply", boost_mode="multiply", max_boost=8.0),
        dict(score_mode="sum", boost_mode="sum", max_boost=None),
        dict(score_mode="multiply", boost_mode="sum", max_boost=2.5),
    ],
)
def test_function_score_matches_duckdb(spark, sf_dir, modes):
    fn = lambda s, d: function_score_search(
        load(s, d, "documents"), "doc_id", "text", _FS_QUERY, _FS_FUNCTIONS,
        k=10, **modes,
    )
    problems, n = compare_query(
        spark, sf_dir, fn,
        sql_function_score_search(
            "documents", "doc_id", "text", _FS_QUERY, _FS_FUNCTIONS,
            k=10, **modes,
        ),
    )
    assert problems == [] and n == 10


def test_function_score_weight_filter_and_max_boost(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple fresh", 100),
            (2, "apple stale", 100),
            (3, "apple apple", 100),
        ],
        "doc_id long, text string, pop long",
    )
    base = {
        r["doc_id"]: r["score"]
        for r in function_score_search(
            docs, "doc_id", "text", {"match": "apple"},
            [{"weight": 1.0}], k=10,
        ).collect()
    }
    # a filtered ×3 weight triples exactly the matching doc's score
    out = {
        r["doc_id"]: r["score"]
        for r in function_score_search(
            docs, "doc_id", "text", {"match": "apple"},
            [{"weight": 3.0, "filter": {"term": "fresh"}}], k=10,
        ).collect()
    }
    assert out[1] == pytest.approx(3 * base[1], abs=2e-4)
    assert out[2] == pytest.approx(base[2], abs=2e-4)  # neutral 1.0
    # max_boost caps the function value, not the query score
    capped = {
        r["doc_id"]: r["score"]
        for r in function_score_search(
            docs, "doc_id", "text", {"match": "apple"},
            [{"weight": 3.0, "filter": {"term": "fresh"}}],
            max_boost=2.0, k=10,
        ).collect()
    }
    assert capped[1] == pytest.approx(2 * base[1], abs=2e-4)


def test_function_score_field_value_factor_missing(spark):
    docs = spark.createDataFrame(
        [(1, "apple", 9.0), (2, "apple", None)],
        "doc_id long, text string, pop double",
    )
    out = {
        r["doc_id"]: r["score"]
        for r in function_score_search(
            docs, "doc_id", "text", {"match": "apple"},
            [{"field_value_factor": {"field": "pop", "factor": 1.0,
                                     "modifier": "sqrt", "missing": 4.0}}],
            k=10,
        ).collect()
    }
    # same base score; sqrt(9)=3 vs sqrt(missing 4)=2
    assert out[1] == pytest.approx(out[2] * 1.5, abs=2e-4)


def test_function_score_validation(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="at least one function"):
        function_score_search(docs, "doc_id", "text", {"match": "a"}, [])
    with pytest.raises(ValueError, match="modifier"):
        function_score_search(
            docs, "doc_id", "text", {"match": "a"},
            [{"field_value_factor": {"field": "x", "modifier": "square"}}],
        )
    with pytest.raises(ValueError, match="score_mode"):
        function_score_search(
            docs, "doc_id", "text", {"match": "a"},
            [{"weight": 1.0}], score_mode="avg",
        )
    with pytest.raises(ValueError, match="field_value_factor or weight"):
        function_score_search(
            docs, "doc_id", "text", {"match": "a"}, [{"gauss": {}}],
        )


def test_engine_function_score_facade(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    out = eng.function_score(
        _FS_QUERY, _FS_FUNCTIONS, max_boost=8.0, k=5
    ).collect()
    assert len(out) == 5 and all(r["score"] > 0 for r in out)


# ----------------------------------------------------------- phrase suggest


def test_phrase_suggest_matches_duckdb(spark, sf_dir):
    fn = lambda s, d: phrase_suggest(
        load(s, d, "documents"), "doc_id", "text", "sparc strean", k=4
    )
    problems, n = compare_query(
        spark, sf_dir, fn,
        sql_phrase_suggest("documents", "doc_id", "text", "sparc strean", k=4),
    )
    assert problems == [] and n == 4


def test_phrase_suggest_corrects_planted_double_typo(spark):
    """The planted-typo fixture (r9 verdict task #7): a corpus where
    'spark stream' is the dominant bigram; the query typos BOTH tokens.
    Only a double substitution reaches the likely bigram — the corrected
    phrase must outrank every single-fix candidate and the input."""
    rows = [(i, "spark stream processing engine") for i in range(30)]
    rows += [(100, "sparc chip"), (101, "strean word")]  # typo terms exist
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = phrase_suggest(docs, "doc_id", "text", "sparc strean", k=5).collect()
    assert out[0]["suggestion"] == "spark stream"
    xents = {r["suggestion"]: r["xent_nats"] for r in out}
    assert xents["spark stream"] < xents.get("sparc strean", float("inf"))


def test_phrase_suggest_keeps_likely_input_first(spark):
    """When the input phrase IS the corpus-likely phrase, it ranks first —
    the 'your query is already right' signal ES exposes via confidence."""
    rows = [(i, "spark stream processing") for i in range(20)]
    rows += [(50, "spork stroam")]  # near-miss vocabulary to tempt it
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = phrase_suggest(docs, "doc_id", "text", "spark stream", k=3).collect()
    assert out[0]["suggestion"] == "spark stream"


def test_phrase_suggest_single_term_raises(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="multi-term"):
        phrase_suggest(docs, "doc_id", "text", "spark")
    with pytest.raises(ValueError, match="max_errors"):
        phrase_suggest(docs, "doc_id", "text", "a b", max_errors=3)


def test_engine_phrase_suggest_facade(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    out = eng.phrase_suggest("sparc strean", k=3).collect()
    assert len(out) == 3
    assert out[0]["xent_nats"] <= out[-1]["xent_nats"]


# -------------------------------------------------------------- Engine.knn


def test_engine_knn_pure_vector(spark, sf_dir):
    from pandemic_knowledge_spark.operators.similarity import knn_brute_force
    from pandemic_knowledge_spark.plans.catalog import QUERY_VEC

    eng = Engine(spark, sf_dir)
    out = eng.knn({"query_vector": QUERY_VEC, "k": 5}).collect()
    direct = knn_brute_force(
        load(spark, sf_dir, "embeddings"), "embedding", "vec_id", QUERY_VEC, k=5
    ).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in direct]


def test_engine_knn_hybrid_equals_catalog_row(spark, sf_dir):
    """The facade routing (knn + query + rank.rrf → BM25 ⊕ IVF ⊕ RRF) is
    exactly the search_hybrid_knn_ivf composition."""
    from pandemic_knowledge_spark.plans.catalog import (
        _BM25_QUERY,
        _RRF_K,
        QUERY_VEC,
        search_hybrid_knn_ivf,
    )

    eng = Engine(spark, sf_dir)
    via_door = eng.knn(
        {"query_vector": QUERY_VEC, "k": _RRF_K, "nprobe": 2},
        query=_BM25_QUERY,
        rank={"rrf": {"rank_constant": 60, "rank_window_size": _RRF_K}},
        k=10,
    ).collect()
    via_row = search_hybrid_knn_ivf(spark, sf_dir).collect()
    assert [tuple(r) for r in via_door] == [tuple(r) for r in via_row]


def test_engine_knn_hybrid_without_rrf_refused(spark, sf_dir):
    from pandemic_knowledge_spark.plans.catalog import QUERY_VEC

    eng = Engine(spark, sf_dir)
    with pytest.raises(ValueError, match="rrf"):
        eng.knn({"query_vector": QUERY_VEC, "k": 5}, query="spark stream")
