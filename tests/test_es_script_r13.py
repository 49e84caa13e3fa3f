"""Round-13 wave: doc-level restricted-Painless scripts in the ES door.

Three surfaces, each with DuckDB parity where values flow:

- scripted METRIC aggs ({"avg": {"script": ...}} — Kibana's JSON-input /
  TSVB math metric) over the simple family;
- the metric-level ``missing`` parameter (was SILENTLY IGNORED pre-r13 —
  the same drop-class seam the r11/r12 verdicts closed at the body and
  knn levels; now implemented with a type gate);
- ``runtime_mappings`` (the search-time script columns Kibana's field
  editor emits) compiled onto the frame so query/sort/_source all see
  the runtime field as a real column.

Reference spec: ES metric-agg `script`/`missing` params and the
runtime-fields chapter of the ES docs; the reference repo itself only
ever queries ES (flow/scripts/*.py) — this is the delegated surface
implemented natively.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from pandemic_knowledge_spark.engine import Engine
from pandemic_knowledge_spark.operators.esdsl import (
    UnsupportedEsQuery,
    apply_runtime_mappings,
    es_aggs,
    es_query,
)
from pandemic_knowledge_spark.tables import load
from tests.oracle_harness import compare_query


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark, sf_dir)


@pytest.fixture(scope="module")
def nullframe(spark):
    """A frame with GENUINE nulls (testdata has none) for `missing`."""
    return spark.createDataFrame(
        [
            Row(k="a", x=1.0, n=10),
            Row(k="a", x=None, n=20),
            Row(k="b", x=3.0, n=30),
            Row(k="b", x=None, n=40),
            Row(k="b", x=5.0, n=None),
        ]
    )


def rows(df):
    return [tuple(r) for r in df.collect()]


# ------------------------------------------------ scripted metric aggs


def test_scripted_metrics_duckdb_parity(spark, sf_dir):
    """max/min/value_count over a double script and sum over a long
    script, inside a terms bucket — vs the DuckDB twin. max/min are
    order-free selections (bit-exact doubles); the sum stays in exact
    long arithmetic."""
    expr = "doc['l_extendedprice'].value * (1 - doc['l_discount'].value)"
    sdf = es_aggs(
        load(spark, sf_dir, "lineitem"),
        {"aggs": {"flags": {
            "terms": {"field": "l_returnflag"},
            "aggs": {
                "mx_rev": {"max": {"script": expr}},
                "mn_rev": {"min": {"script": {"source": expr}}},
                "key_sum": {"sum": {
                    "script": "doc['l_orderkey'].value * 2 "
                              "+ doc['l_suppkey'].value"}},
                "n_rev": {"value_count": {"script": expr}},
            },
        }}},
    )["flags"]
    problems, n = compare_query(spark, sf_dir, None, """
SELECT l_returnflag AS key, CAST(count(*) AS BIGINT) AS doc_count,
       max(l_extendedprice * (1 - l_discount)) AS mx_rev,
       min(l_extendedprice * (1 - l_discount)) AS mn_rev,
       CAST(sum(l_orderkey * 2 + l_suppkey) AS BIGINT) AS key_sum,
       CAST(count(*) AS BIGINT) AS n_rev
FROM lineitem GROUP BY 1 ORDER BY doc_count DESC, key LIMIT 10
""", sdf=sdf)
    assert not problems and n > 0, problems


def test_scripted_avg_with_params(spark, sf_dir):
    """params.<name> binds a literal; avg over a long script divides the
    exact long sum — bit-identical to the SQL twin."""
    sdf = es_aggs(
        load(spark, sf_dir, "orders"),
        {"aggs": {"st": {
            "terms": {"field": "o_orderstatus"},
            "aggs": {"scaled": {"avg": {"script": {
                "source": "doc['o_orderkey'].value * params.m",
                "params": {"m": 3},
            }}}},
        }}},
    )["st"]
    problems, n = compare_query(spark, sf_dir, None, """
SELECT o_orderstatus AS key, CAST(count(*) AS BIGINT) AS doc_count,
       CAST(sum(o_orderkey * 3) AS DOUBLE) / count(o_orderkey) AS scaled
FROM orders GROUP BY 1 ORDER BY doc_count DESC, key LIMIT 10
""", sdf=sdf)
    assert not problems and n > 0, problems


def test_script_math_functions(spark, sf_dir):
    """Math.sqrt / Math.max compile to the JVM builtins (double kind)."""
    sdf = es_aggs(
        load(spark, sf_dir, "events"),
        {"aggs": {"m": {"max": {"script":
            "Math.sqrt(Math.max(doc['value'].value, 1.0))"}}}},
    )["m"]
    problems, n = compare_query(spark, sf_dir, None, """
SELECT max(sqrt(CASE WHEN value >= 1.0 THEN value ELSE 1.0 END)) AS m
FROM events
""", sdf=sdf)
    assert not problems and n == 1, problems


def test_script_rejections(spark, sf_dir):
    """The loud edges: non-arithmetic Painless, integer/integer
    division, unknown Math fn, unbound params, non-numeric and unknown
    doc fields, scripts on non-simple metrics."""
    ev = load(spark, sf_dir, "events")

    def agg(script, mtype="avg"):
        return es_aggs(ev, {"aggs": {"a": {mtype: {"script": script}}}})

    for script, frag in [
        ("doc['value'].value > 1 ? 1 : 0", "trailing|arithmetic"),
        ("doc['event_id'].value / doc['user_id'].value", "truncates"),
        ("Math.tanh(doc['value'].value)", "Math.tanh"),
        ("params.k * doc['value'].value", "params.k"),
        ("doc['event_type'].value + 1", "non-numeric"),
        ("doc['nope'].value", "not a column"),
        ("doc['value'].value.toString()", "trailing"),
    ]:
        with pytest.raises(UnsupportedEsQuery, match=frag):
            agg(script)
    with pytest.raises(UnsupportedEsQuery, match="script metrics"):
        agg("doc['value'].value", mtype="percentiles")
    # script next to field/missing has no ES meaning the door models
    with pytest.raises(UnsupportedEsQuery, match="unsupported options"):
        es_aggs(ev, {"aggs": {"a": {"avg": {
            "field": "value", "script": "doc['value'].value"}}}})
    # lang: expression is a DIFFERENT grammar — never silently parsed
    with pytest.raises(UnsupportedEsQuery, match="lang"):
        es_aggs(ev, {"aggs": {"a": {"avg": {"script": {
            "source": "doc['value'].value", "lang": "expression"}}}}})


def test_script_division_by_zero_raises_at_eval(spark, sf_dir):
    """A zero denominator raises at evaluation (Painless yields
    Infinity, SQL yields NULL — neither silently produced)."""
    ev = load(spark, sf_dir, "events")
    out = es_aggs(ev, {"aggs": {"a": {"avg": {"script":
        "1.0 / (doc['value'].value - doc['value'].value)"}}}})["a"]
    with pytest.raises(Exception, match="division by zero"):
        out.collect()


# ----------------------------------------------------- metric `missing`


def test_metric_missing_substitutes(spark, nullframe):
    """ES `missing`: docs with a null field aggregate AS the given value
    — avg/sum/min/max/value_count/cardinality all shift accordingly."""
    out = es_aggs(nullframe, {"aggs": {"t": {
        "terms": {"field": "k"},
        "aggs": {
            "a": {"avg": {"field": "x", "missing": 0}},
            "c": {"value_count": {"field": "x", "missing": 0}},
            "mx": {"max": {"field": "n", "missing": 99}},
        },
    }}})["t"].orderBy("key")
    got = {r["key"]: (r["a"], r["c"], r["mx"]) for r in out.collect()}
    assert got["a"] == (0.5, 2, 20)
    assert got["b"] == (8.0 / 3.0, 3, 99)


def test_metric_missing_unchanged_without_nulls(spark, sf_dir):
    """On a null-free column `missing` is the identity — same frame with
    and without it (and the key is ACCEPTED, not dropped: pre-r13 it was
    silently ignored, indistinguishable from this passing test only
    because testdata has no nulls; the nullframe test above is the
    semantic proof)."""
    ev = load(spark, sf_dir, "events")
    base = es_aggs(ev, {"aggs": {"s": {"sum": {"field": "value"}}}})["s"]
    with_m = es_aggs(ev, {"aggs": {"s": {"sum": {
        "field": "value", "missing": 7.5}}}})["s"]
    assert rows(base) == rows(with_m)


def test_metric_missing_type_gate(spark, sf_dir):
    """missing must match the field's type: a string default on a
    numeric field (or vice versa) raises with the path instead of
    failing mid-analysis or silently casting."""
    ev = load(spark, sf_dir, "events")
    with pytest.raises(UnsupportedEsQuery, match="missing"):
        es_aggs(ev, {"aggs": {"s": {"sum": {
            "field": "value", "missing": "zero"}}}})
    docs_missing = {"aggs": {"c": {"cardinality": {
        "field": "event_type", "missing": 0}}}}
    with pytest.raises(UnsupportedEsQuery, match="missing"):
        es_aggs(ev, docs_missing)


def test_metric_unknown_keys_raise(spark, sf_dir):
    """The simple metric family now rejects unknown keys (pre-r13 a
    `format`/`missing` rider was silently dropped — the r11 seam class
    one level deeper). cardinality's precision_threshold is the one
    accepted-and-subsumed rider (exact tier = its infinite limit)."""
    ev = load(spark, sf_dir, "events")
    for mtype in ("avg", "sum", "min", "max", "value_count", "stats"):
        with pytest.raises(UnsupportedEsQuery, match="format"):
            es_aggs(ev, {"aggs": {"a": {mtype: {
                "field": "value", "format": "0.0"}}}})
    base = es_aggs(ev, {"aggs": {"c": {"cardinality": {
        "field": "user_id"}}}})["c"]
    sub = es_aggs(ev, {"aggs": {"c": {"cardinality": {
        "field": "user_id", "precision_threshold": 40000}}}})["c"]
    assert rows(base) == rows(sub)


# --------------------------------------------------- runtime_mappings


def test_runtime_field_query_sort_source(spark, sf_dir, engine):
    """The full es_search composition: a runtime double field feeds the
    range query, the sort, and _source — vs the DuckDB twin."""
    out = engine.es_search({
        "runtime_mappings": {"kchars": {"type": "double", "script": {
            "source": "emit(doc['n_chars'].value / params.k)",
            "params": {"k": 1000.0}}}},
        "query": {"range": {"kchars": {"gte": 0.4}}},
        "sort": [{"kchars": "desc"}, {"doc_id": "asc"}],
        "_source": ["lang", "kchars"],
        "size": 12,
    })["hits"]
    problems, n = compare_query(spark, sf_dir, None, """
SELECT doc_id, lang, n_chars / 1000.0 AS kchars
FROM documents WHERE n_chars / 1000.0 >= 0.4
ORDER BY kchars DESC, doc_id LIMIT 12
""", sdf=out)
    assert not problems and n > 0, problems


def test_runtime_field_chains_and_feeds_aggs(spark, sf_dir, engine):
    """A later runtime field may reference an earlier one (ES insertion-
    order semantics), and aggs see runtime columns."""
    out = engine.es_search({
        "runtime_mappings": {
            "half": {"type": "double",
                     "script": "emit(doc['n_chars'].value / 2.0)"},
            "quarter": {"type": "double",
                        "script": "emit(doc['half'].value / 2.0)"},
        },
        "aggs": {"q_max": {"max": {"field": "quarter"}}},
        "size": 0,
    })
    problems, n = compare_query(spark, sf_dir, None, """
SELECT max(n_chars / 2.0 / 2.0) AS q_max FROM documents
""", sdf=out["q_max"])
    assert not problems and n == 1, problems


def test_runtime_field_long_type(spark, engine):
    """type: long with an integral emit keeps long arithmetic; emitting
    a double expression into a long field raises (a Painless cast error
    in ES too)."""
    out = engine.es_search({
        "runtime_mappings": {"dbl_id": {"type": "long", "script":
            "emit(doc['doc_id'].value * 2)"}},
        "query": {"range": {"dbl_id": {"lte": 10}}},
        "sort": [{"dbl_id": "asc"}],
        "_source": ["dbl_id"],
        "size": 5,
    })["hits"]
    got = rows(out)
    assert all(isinstance(r[1], int) and r[1] == 2 * r[0] for r in got)
    with pytest.raises(UnsupportedEsQuery, match="long"):
        engine.es_search({
            "runtime_mappings": {"bad": {"type": "long", "script":
                "emit(doc['n_chars'].value / 2.0)"}},
            "size": 1,
        })


def test_runtime_mapping_rejections(spark, engine):
    """Loud edges: shadowing an existing column, non-emit scripts,
    unknown field types, unknown cfg keys, and the knn combination."""
    docs = engine.table("documents")
    with pytest.raises(UnsupportedEsQuery, match="shadows"):
        apply_runtime_mappings(docs, {"lang": {"type": "double",
            "script": "emit(doc['n_chars'].value * 1.0)"}})
    with pytest.raises(UnsupportedEsQuery, match="emit"):
        apply_runtime_mappings(docs, {"f": {"type": "double",
            "script": "doc['n_chars'].value * 1.0"}})
    with pytest.raises(UnsupportedEsQuery, match="keyword"):
        apply_runtime_mappings(docs, {"f": {"type": "keyword",
            "script": "emit(doc['n_chars'].value)"}})
    with pytest.raises(UnsupportedEsQuery, match="unsupported options"):
        apply_runtime_mappings(docs, {"f": {"type": "double",
            "script": "emit(doc['n_chars'].value * 1.0)", "format": "x"}})
    vec = engine.table("embeddings").first()["embedding"]
    with pytest.raises(UnsupportedEsQuery, match="runtime_mappings"):
        engine.es_search({
            "runtime_mappings": {"f": {"type": "double", "script":
                "emit(doc['doc_id'].value * 1.0)"}},
            "knn": {"field": "embedding", "query_vector": vec, "k": 3},
        })


def test_runtime_mapping_null_propagates(spark, nullframe):
    """NULL field values propagate to NULL runtime values and aggregates
    skip the doc — SQL semantics, matching the oracle twin (Painless
    would throw on a missing doc value unless guarded; divergence
    documented in apply_runtime_mappings)."""
    rm = apply_runtime_mappings(nullframe, {"x2": {"type": "double",
        "script": "emit(doc['x'].value * 2.0)"}})
    got = es_aggs(rm, {"aggs": {"c": {"value_count": {"field": "x2"}},
                                "s": {"sum": {"field": "x2"}}}})
    assert rows(got["c"]) == [(3,)]
    assert rows(got["s"]) == [(18.0,)]


# --------------------------------------------- highlight field options


def test_highlight_field_options(spark, sf_dir):
    """number_of_fragments: 0 is accepted-and-subsumed (whole-field
    highlighting IS this engine's behavior); field-level tag overrides
    take ES's precedence over top-level; true fragmenting stays loud."""
    docs = load(spark, sf_dir, "documents")
    base = {"query": {"match": {"text": "spark"}},
            "sort": [{"n_chars": "desc"}], "size": 4}
    plain = es_query(docs, "doc_id", "text", {
        **base, "highlight": {"fields": {"text": {}}}})
    subsumed = es_query(docs, "doc_id", "text", {
        **base, "highlight": {"fields": {"text": {
            "number_of_fragments": 0}}}})
    assert rows(plain) == rows(subsumed) and plain.count() == 4
    tagged = es_query(docs, "doc_id", "text", {
        **base, "highlight": {
            "pre_tags": ["<x>"], "post_tags": ["</x>"],
            "fields": {"text": {"pre_tags": ["<mark>"],
                                "post_tags": ["</mark>"]}}}})
    hl = tagged.select("highlighted").first()[0]
    assert "<mark>" in hl and "<x>" not in hl
    with pytest.raises(UnsupportedEsQuery, match="fragment"):
        es_query(docs, "doc_id", "text", {
            **base, "highlight": {"fields": {"text": {
                "number_of_fragments": 3}}}})
    with pytest.raises(UnsupportedEsQuery, match="unsupported options"):
        es_query(docs, "doc_id", "text", {
            **base, "highlight": {"fields": {"text": {
                "fragment_size": 150}}}})


# -------------------------------------- standalone retriever spellings


def test_retriever_standard_equals_plain_body(spark, sf_dir, engine):
    """{"retriever": {"standard": {"query": ...}}} is the degenerate
    tree — row-identical to the plain {"query": ...} body; `filter`
    folds in as a non-scoring bool filter."""
    q = {"match": {"text": "spark"}}
    via_ret = engine.es_search({
        "retriever": {"standard": {"query": q}}, "size": 7})["hits"]
    plain = engine.es_search({"query": q, "size": 7})["hits"]
    assert rows(via_ret) == rows(plain) and via_ret.count() == 7
    filtered = engine.es_search({
        "retriever": {"standard": {
            "query": q, "filter": {"term": {"lang": "en"}}}},
        "size": 7})["hits"]
    folded = engine.es_search({
        "query": {"bool": {"must": [q],
                           "filter": [{"term": {"lang": "en"}}]}},
        "size": 7})["hits"]
    assert rows(filtered) == rows(folded) and filtered.count() > 0


def test_retriever_knn_equals_knn_body(spark, engine):
    """{"retriever": {"knn": {...}}} routes through the same gated knn
    door — identical to the top-level knn body, filter included."""
    vec = engine.table("embeddings").first()["embedding"]
    spec = {"field": "embedding", "query_vector": vec, "k": 5,
            "filter": {"term": {"lang": "en"}}}
    via_ret = engine.es_search({
        "retriever": {"knn": dict(spec)}, "size": 5})["hits"]
    plain = engine.es_search({"knn": dict(spec), "size": 5})["hits"]
    assert rows(via_ret) == rows(plain) and via_ret.count() == 5
    from pandemic_knowledge_spark.operators.esdsl import UnsupportedEsQuery
    with pytest.raises(UnsupportedEsQuery, match=r"\$\.knn"):
        engine.es_search({"retriever": {"knn": {
            "field": "embedding", "query_vector": vec, "k": 5,
            "similarity": 0.5}}, "size": 5})


# ---------------------------------------- document APIs: mget, terms_enum


def test_mget_request_order_and_source(spark, sf_dir, engine):
    """_mget returns docs in REQUEST order with the _source subset;
    duplicate ids duplicate rows; absent ids are absent."""
    out = engine.mget([7, 3, 11, 5], source=["lang"])
    got = [r["doc_id"] for r in out.collect()]
    assert got == [7, 3, 11, 5]
    assert out.columns == ["doc_id", "lang"]
    dup = engine.mget([3, 3], source=["lang"])
    assert [r["doc_id"] for r in dup.collect()] == [3, 3]
    sparse = engine.mget([3, 999999999], source=["lang"])
    assert [r["doc_id"] for r in sparse.collect()] == [3]
    from pandemic_knowledge_spark.operators.esdsl import UnsupportedEsQuery
    with pytest.raises(UnsupportedEsQuery, match="non-empty"):
        engine.mget([])
    with pytest.raises(UnsupportedEsQuery, match="unknown column"):
        engine.mget([3], source=["nope"])


def test_terms_enum_prefix_and_case(spark, sf_dir, engine):
    """Prefix pushes to the scan; case_insensitive folds the prefix but
    returns stored forms; size bounds the page."""
    terms = [r["term"] for r in
             engine.terms_enum("event_type", table="events").collect()]
    assert terms == sorted(terms) and len(terms) <= 10 and terms
    pref = [r["term"] for r in
            engine.terms_enum("event_type", string="s",
                              table="events").collect()]
    assert pref and all(t.startswith("s") for t in pref)
    ci = [r["term"] for r in
          engine.terms_enum("event_type", string="S",
                            case_insensitive=True,
                            table="events").collect()]
    assert ci == pref  # folded prefix, stored forms returned
    one = engine.terms_enum("event_type", size=1, table="events")
    assert one.count() == 1


# ------------------------------------------------- _source spellings


def test_source_object_wildcard_bool_forms(spark, sf_dir):
    """Every _source spelling ES accepts: includes/excludes object,
    * wildcards, bare string, true/false — resolved driver-side."""
    docs = load(spark, sf_dir, "documents")
    base = {"query": {"match": {"text": "spark"}},
            "sort": [{"n_chars": "desc"}], "size": 5}
    arr = es_query(docs, "doc_id", "text", {
        **base, "_source": ["lang", "source"]})
    obj = es_query(docs, "doc_id", "text", {
        **base, "_source": {"includes": ["lang", "source"]}})
    assert rows(arr) == rows(obj) and arr.columns == obj.columns
    excl = es_query(docs, "doc_id", "text", {
        **base, "_source": {"excludes": ["text", "doc_id"]}})
    assert set(excl.columns) == {"doc_id", "lang", "source", "n_chars"}
    wild = es_query(docs, "doc_id", "text", {
        **base, "_source": ["lang", "n_*"]})
    assert wild.columns[-2:] == ["lang", "n_chars"]
    bare = es_query(docs, "doc_id", "text", {**base, "_source": "lang"})
    assert bare.columns[-1] == "lang"
    off = es_query(docs, "doc_id", "text", {**base, "_source": False})
    assert off.columns == ["doc_id"]
    full = es_query(docs, "doc_id", "text", {**base, "_source": True})
    assert set(full.columns) == {"doc_id", "text", "lang", "source",
                                 "n_chars"}
    with pytest.raises(UnsupportedEsQuery, match="not a column"):
        es_query(docs, "doc_id", "text", {**base, "_source": ["nope"]})
    with pytest.raises(UnsupportedEsQuery, match="unsupported options"):
        es_query(docs, "doc_id", "text", {
            **base, "_source": {"include": ["lang"]}})


# ----------------------------------------------------- sort `missing`


def test_sort_missing_orders_nulls(spark, engine):
    """ES sort `missing`: _last is the DEFAULT (Spark's asc() is
    nulls-first — the door now matches ES), _first flips, and a
    literal sorts missing docs AS that value."""
    from pyspark.sql import Row
    df = spark.createDataFrame([
        Row(doc_id=1, v=10.0), Row(doc_id=2, v=None),
        Row(doc_id=3, v=5.0),
    ])
    base = {"query": {"range": {"doc_id": {"gte": 0}}}, "size": 5,
            "_source": ["v"]}
    def ids(body):
        return [r["doc_id"] for r in
                es_query(df, "doc_id", None, body).collect()]
    assert ids({**base, "sort": [{"v": "asc"}]}) == [3, 1, 2]
    assert ids({**base, "sort": [{"v": {"order": "asc",
                                        "missing": "_first"}}]}) == \
        [2, 3, 1]
    assert ids({**base, "sort": [{"v": {"order": "desc"}}]}) == [1, 3, 2]
    # literal: the null doc sorts AS 7.0 (between 10 and 5)
    assert ids({**base, "sort": [{"v": {"order": "desc",
                                        "missing": 7.0}}]}) == [1, 2, 3]
    from pandemic_knowledge_spark.operators.esdsl import UnsupportedEsQuery
    with pytest.raises(UnsupportedEsQuery, match="unsupported options"):
        ids({**base, "sort": [{"v": {"order": "asc",
                                     "mode": "min"}}]})
    with pytest.raises(UnsupportedEsQuery, match="missing"):
        ids({**base, "sort": [{"v": {"order": "asc",
                                     "missing": "_first"}}],
             "search_after": [5.0, 1]})
