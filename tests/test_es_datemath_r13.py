"""Round-13 late wave: ANCHORED ES date math in range bounds.

``<anchor>||<±N unit…>[/unit]`` is fully deterministic, so it now
resolves driver-side (``now``-anchored strings stay loudly refused —
a server clock read breaks the engine's reproducibility contract).
Covers the resolution rules (Java month-end clamping, ES's
range-context rounding as op rewrites) and DuckDB parity end-to-end.
"""

from __future__ import annotations

import datetime

import pytest

from pandemic_knowledge_spark.operators.esdsl import (
    UnsupportedEsQuery,
    _anchored_date_math,
    es_aggs,
)
from pandemic_knowledge_spark.tables import load
from tests.oracle_harness import compare_query


DT = datetime.datetime


# ------------------------------------------------- resolution rules


def test_shift_applies_left_to_right_with_month_clamp():
    """Jan 31 + 1M clamps to Feb 28 (Java/ES behavior), and further
    shifts run on the clamped instant."""
    op, v = _anchored_date_math("2014-01-31||+1M", "gte", None, "$")
    assert (op, v) == ("gte", DT(2014, 2, 28))
    op, v = _anchored_date_math("2014-01-31||+1M+1d", "gte", None, "$")
    assert (op, v) == ("gte", DT(2014, 3, 1))
    op, v = _anchored_date_math("2016-02-29||+1y", "gte", None, "$")
    assert (op, v) == ("gte", DT(2017, 2, 28))


def test_rounding_contexts_match_es():
    """The four range contexts of ``2014-11-18||/M`` (the ES doc's own
    worked example): gte/lt round down; gt becomes gte Dec 1 ("first
    millisecond not covered"); lte becomes lt Dec 1 (the whole of
    November included)."""
    assert _anchored_date_math("2014-11-18||/M", "gte", None, "$") == \
        ("gte", DT(2014, 11, 1))
    assert _anchored_date_math("2014-11-18||/M", "lt", None, "$") == \
        ("lt", DT(2014, 11, 1))
    assert _anchored_date_math("2014-11-18||/M", "gt", None, "$") == \
        ("gte", DT(2014, 12, 1))
    assert _anchored_date_math("2014-11-18||/M", "lte", None, "$") == \
        ("lt", DT(2014, 12, 1))


def test_week_and_year_floors():
    """/w floors to ISO Monday; /y to Jan 1."""
    # 2026-08-16 is a Sunday; its ISO week starts Monday 2026-08-10
    assert _anchored_date_math("2026-08-16||/w", "gte", None, "$") == \
        ("gte", DT(2026, 8, 10))
    assert _anchored_date_math("2026-08-16T13:45:11||/y", "lt", None,
                               "$") == ("lt", DT(2026, 1, 1))


def test_time_units_and_epoch_millis_anchor():
    """h/H/m/s shifts; an all-digit anchor under format: epoch_millis
    reads as millis (Kibana's pinned-picker spelling)."""
    op, v = _anchored_date_math("2020-01-01T06:30:00||-90m", "lte",
                                None, "$")
    assert (op, v) == ("lte", DT(2020, 1, 1, 5, 0))
    # 1415059200000 ms = 2014-11-04T00:00:00Z
    op, v = _anchored_date_math("1415059200000||+1d", "gte",
                                "epoch_millis", "$")
    assert (op, v) == ("gte", DT(2014, 11, 5))


def test_date_math_rejections():
    """Loud edges: mid-expression rounding, malformed grammar, bad
    anchors — and `now` stays refused at the range layer."""
    with pytest.raises(UnsupportedEsQuery, match="rounding"):
        _anchored_date_math("2014-11-18||/M+1d", "gte", None, "$")
    for bad in ("2014-11-18||+1q", "2014-11-18||1d", "nope||+1d"):
        with pytest.raises(UnsupportedEsQuery):
            _anchored_date_math(bad, "gte", None, "$")


# ------------------------------------------------- end-to-end parity


def test_range_date_math_duckdb_parity(spark, sf_dir):
    """A Kibana-shaped body: anchored-math range + monthly histogram,
    vs the twin with the bounds resolved by hand. gte +1M/M floors the
    shifted instant; lte /M includes the whole anchor month."""
    sdf = es_aggs(load(spark, sf_dir, "orders"), {
        "query": {"range": {"o_orderdate": {
            "gte": "1995-01-31||+1M/M",   # -> >= 1995-02-01
            "lte": "1995-06-15||/M",      # -> <  1995-07-01
        }}},
        "aggs": {"monthly": {"date_histogram": {
            "field": "o_orderdate", "calendar_interval": "month"}}},
    })["monthly"]
    problems, n = compare_query(spark, sf_dir, None, """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS key,
       CAST(count(*) AS BIGINT) AS doc_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-02-01'
  AND o_orderdate <  TIMESTAMP '1995-07-01'
GROUP BY 1 ORDER BY key
""", sdf=sdf)
    assert not problems and n == 5, (problems, n)


def test_gt_rewrite_excludes_whole_unit(spark, sf_dir):
    """gt with /M must exclude the ENTIRE anchor month (ES: "first
    millisecond not covered") — equal to a gte on the next month."""
    def run(spec):
        return es_aggs(load(spark, sf_dir, "orders"), {
            "query": {"range": {"o_orderdate": spec}},
            "aggs": {"c": {"value_count": {"field": "o_orderkey"}}},
        })["c"].collect()[0][0]

    via_math = run({"gt": "1996-03-18||/M"})
    by_hand = run({"gte": "1996-04-01 00:00:00"})
    assert via_math == by_hand > 0


def test_rewrite_collision_raises(spark, sf_dir):
    """A rounded lte rewrites to lt; a spec that also sets lt would
    produce two conflicting upper bounds — refused, never merged
    silently."""
    with pytest.raises(UnsupportedEsQuery, match="rewrites|collides"):
        es_aggs(load(spark, sf_dir, "orders"), {
            "query": {"range": {"o_orderdate": {
                "lte": "1995-06-15||/M", "lt": "1995-08-01"}}},
            "aggs": {"c": {"value_count": {"field": "o_orderkey"}}},
        })
