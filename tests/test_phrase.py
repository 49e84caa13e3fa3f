"""Phrase search (operators.search positional postings): the indexed probe
must equal the direct scan on every corpus, including repeated-term and
self-overlapping phrases — the cases where naive regex counting breaks."""

from __future__ import annotations

from pandemic_knowledge_spark.operators.search import (
    build_positional_postings,
    phrase_search,
    phrase_search_from_postings,
)


def _both(spark, rows, phrase, k=10):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    direct = phrase_search(docs, "doc_id", "text", phrase, k).collect()
    pp = build_positional_postings(docs, "doc_id", "text")
    indexed = phrase_search_from_postings(pp, phrase, k).collect()
    assert direct == indexed, (direct, indexed)
    return [(r.doc_id, r.phrase_count) for r in direct]


def test_basic_phrase_hit_and_ranking(spark):
    rows = [
        (0, "spark window functions are spark window magic"),
        (1, "a spark window here"),
        (2, "window spark reversed order"),
        (3, "no relevant words"),
    ]
    assert _both(spark, rows, "spark window") == [(0, 2), (1, 1)]


def test_punctuation_separated_tokens_still_match(spark):
    rows = [(0, "Spark; window!! functions"), (1, "spark-window")]
    # tokenizer splits on non-alphanumerics: both are consecutive tokens
    assert _both(spark, rows, "spark window") == [(0, 1), (1, 1)]


def test_self_overlapping_phrase_counts_every_start(spark):
    rows = [(0, "a a a a"), (1, "a a")]
    # starts at 0,1,2 in doc 0 — overlapping occurrences all count
    assert _both(spark, rows, "a a") == [(0, 3), (1, 1)]


def test_repeated_term_phrase(spark):
    rows = [(0, "go go again go go"), (1, "go stop go")]
    assert _both(spark, rows, "go go") == [(0, 2)]


def test_three_token_phrase_and_boundaries(spark):
    rows = [
        (0, "alpha beta gamma"),               # exact doc == phrase
        (1, "x alpha beta gamma y"),           # interior
        (2, "alpha beta delta gamma"),         # broken
        (3, "beta gamma alpha"),               # wrong order
    ]
    assert _both(spark, rows, "alpha beta gamma") == [(0, 1), (1, 1)]


def test_absent_phrase_empty(spark):
    rows = [(0, "nothing to see"), (1, "move along")]
    assert _both(spark, rows, "missing phrase") == []


def test_engine_phrase_search_cached_index(spark):
    from pandemic_knowledge_spark.engine import Engine

    eng = Engine(spark, "/root/testdata/sf0.001")
    a = eng.phrase_search("window table", k=5).collect()
    # second call probes the cached positional postings (no rebuild)
    idx_before = dict(eng._positional_indexes)
    b = eng.phrase_search("window table", k=5).collect()
    assert a == b and dict(eng._positional_indexes) == idx_before
    assert all(r.phrase_count >= 1 for r in a)


def test_punctuated_query_analyzed_like_corpus(spark):
    """Query strings pass through the corpus tokenizer: 'covid-19' must
    match documents containing 'covid 19' as consecutive tokens (ES
    analyzes queries with the index analyzer; a whitespace split made any
    punctuated query unmatchable)."""
    from pandemic_knowledge_spark.operators.search import bm25_search

    rows = [(0, "new covid-19 wave reported"), (1, "unrelated text entirely")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert _both(spark, rows, "covid-19") == [(0, 1)]
    hits = bm25_search(docs, "doc_id", "text", "COVID-19!", k=5).collect()
    assert [r.doc_id for r in hits] == [0]
