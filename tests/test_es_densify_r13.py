"""Round-13 late wave: per-parent dense spines — ``min_doc_count: 0``
INSIDE a nested bucket (the Kibana split-series default, previously a
loud refusal).

ES semantics under test: each parent bucket's sub-histogram is an
independent aggregation instance, so zero-filling spans each parent's
OWN [min, max] key range (union extended_bounds); gap buckets report
doc_count 0 and NULL metrics.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pandemic_knowledge_spark.operators.esdsl import (
    UnsupportedEsQuery,
    es_aggs,
)
from pandemic_knowledge_spark.tables import load
from tests.oracle_harness import compare_query


@pytest.fixture(scope="module")
def gapframe(spark):
    """Two series with DIFFERENT extents and interior gaps:
    a: Jan 1, Jan 4 (gap 2-3); b: Jan 3, Jan 5 (gap 4)."""
    rows = [
        (1, "a", dt.datetime(2024, 1, 1), 10.0),
        (2, "a", dt.datetime(2024, 1, 4), 40.0),
        (3, "b", dt.datetime(2024, 1, 3), 30.0),
        (4, "b", dt.datetime(2024, 1, 5), 50.0),
    ]
    return spark.createDataFrame(
        rows, "id long, kind string, ts timestamp, v double"
    )


def test_per_parent_spine_spans_each_parents_extent(gapframe):
    """Parent `a` densifies Jan 1-4, parent `b` Jan 3-5 — neither
    borrows the other's range (independent instances, ES semantics)."""
    out = es_aggs(gapframe, {"aggs": {"t": {
        "terms": {"field": "kind"},
        "aggs": {"daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day",
                               "min_doc_count": 0},
            "aggs": {"vmax": {"max": {"field": "v"}}},
        }},
    }}})["t"]
    got = [(r["key"], r["daily_key"].day, r["doc_count"], r["vmax"])
           for r in out.collect()]
    assert got == [
        ("a", 1, 1, 10.0), ("a", 2, 0, None), ("a", 3, 0, None),
        ("a", 4, 1, 40.0),
        ("b", 3, 1, 30.0), ("b", 4, 0, None), ("b", 5, 1, 50.0),
    ]


def test_per_parent_spine_respects_outer_size_cut(gapframe):
    """The outer terms size cut applies BEFORE densification — only the
    surviving parent grows a spine (b ties a at 2 docs; key tiebreak
    keeps a)."""
    out = es_aggs(gapframe, {"aggs": {"t": {
        "terms": {"field": "kind", "size": 1},
        "aggs": {"daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day",
                               "min_doc_count": 0},
        }},
    }}})["t"]
    got = [(r["key"], r["doc_count"]) for r in out.collect()]
    assert [k for k, _ in got] == ["a"] * 4
    assert [c for _, c in got] == [1, 0, 0, 1]


def test_per_parent_extended_bounds_widen_every_parent(gapframe):
    """extended_bounds union: every parent's spine covers at least the
    forced window (ES's union rule), here Jan 1-6 for both series."""
    out = es_aggs(gapframe, {"aggs": {"t": {
        "terms": {"field": "kind"},
        "aggs": {"daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day",
                               "min_doc_count": 0,
                               "extended_bounds": {"min": "2024-01-01",
                                                   "max": "2024-01-06"}},
        }},
    }}})["t"]
    got = {}
    for r in out.collect():
        got.setdefault(r["key"], []).append(r["daily_key"].day)
    assert got == {"a": [1, 2, 3, 4, 5, 6], "b": [1, 2, 3, 4, 5, 6]}


def test_nested_numeric_histogram_densifies(gapframe):
    """The numeric histogram family rides the same per-parent spine
    (integer bucket-index stepping)."""
    out = es_aggs(gapframe, {"aggs": {"t": {
        "terms": {"field": "kind"},
        "aggs": {"hv": {
            "histogram": {"field": "v", "interval": 10.0,
                          "min_doc_count": 0},
        }},
    }}})["t"]
    got = {}
    for r in out.collect():
        got.setdefault(r["key"], []).append((r["hv_key"], r["doc_count"]))
    assert got["a"] == [(10.0, 1), (20.0, 0), (30.0, 0), (40.0, 1)]
    assert got["b"] == [(30.0, 1), (40.0, 0), (50.0, 1)]


def test_split_dense_duckdb_parity(spark, sf_dir):
    """The catalog row's shape vs a per-parent generate_series twin —
    the value filter makes the gaps real on testdata."""
    sdf = es_aggs(load(spark, sf_dir, "events"), {
        "query": {"range": {"value": {"gte": 250.0}}},
        "aggs": {"t": {
            "terms": {"field": "event_type"},
            "aggs": {"daily": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "day",
                                   "min_doc_count": 0},
                "aggs": {"vmax": {"max": {"field": "value"}}},
            }},
        }},
    })["t"]
    problems, n = compare_query(spark, sf_dir, None, """
WITH g AS (
  SELECT event_type AS key,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS daily_key,
         CAST(count(*) AS BIGINT) AS doc_count, max(value) AS vmax
  FROM events WHERE value >= 250.0 GROUP BY 1, 2
), b AS (
  SELECT key, min(daily_key) AS lo, max(daily_key) AS hi FROM g GROUP BY 1
), spine AS (
  SELECT b.key, CAST(u.d AS TIMESTAMP) AS daily_key
  FROM b, LATERAL (
    SELECT unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS d
  ) u
)
SELECT s.key, s.daily_key, COALESCE(g.doc_count, 0) AS doc_count, g.vmax
FROM spine s LEFT JOIN g USING (key, daily_key)
""", sdf=sdf)
    assert not problems and n > 0, problems


def test_dense_parent_and_terms_child_stay_loud(gapframe):
    """The NOT-implemented edges hold their refusals: a dense PARENT of
    a nested bucket, and three-level dense."""
    with pytest.raises(UnsupportedEsQuery, match="min_doc_count"):
        es_aggs(gapframe, {"aggs": {"a": {
            "date_histogram": {"field": "ts", "calendar_interval": "day",
                               "min_doc_count": 0},
            "aggs": {"b": {"terms": {"field": "kind"}}}}}})
    # the three-level LEAF now densifies (per-(chart, series) spines —
    # the late-late wave); a SPLIT-level dense stays loud
    out = es_aggs(gapframe, {"aggs": {"a": {
        "terms": {"field": "kind"},
        "aggs": {"b": {
            "terms": {"field": "id"},
            "aggs": {"c": {"date_histogram": {
                "field": "ts", "calendar_interval": "day",
                "min_doc_count": 0}}}}}}}})["a"].collect()
    assert len(out) == 4  # one doc per (kind, id): leaf spines are 1 day
    with pytest.raises(UnsupportedEsQuery, match="parent|SPLIT"):
        es_aggs(gapframe, {"aggs": {"a": {
            "date_histogram": {"field": "ts", "calendar_interval": "day",
                               "min_doc_count": 0},
            "aggs": {"b": {
                "terms": {"field": "kind"},
                "aggs": {"c": {"histogram": {
                    "field": "v", "interval": 10.0}}}}}}}})


# ------------------------------------- auto_date_histogram sub-aggs


def test_auto_date_histogram_with_metrics_parity(spark, sf_dir):
    """Metric leaves ride the auto-interval grouped shuffle — vs the
    ladder-replaying DuckDB twin (r13 late wave; was loud)."""
    from pandemic_knowledge_spark.operators.aggregates import (
        sql_auto_date_histogram,
    )

    sdf = es_aggs(load(spark, sf_dir, "events"), {"aggs": {"auto": {
        "auto_date_histogram": {"field": "ts", "buckets": 12},
        "aggs": {
            "vmax": {"max": {"field": "value"}},
            "users": {"cardinality": {"field": "user_id"}},
        },
    }}})["auto"]
    problems, n = compare_query(
        spark, sf_dir, None,
        sql_auto_date_histogram(
            "events", "ts", target_buckets=12,
            extra_sql=(", max(value) AS vmax, "
                       "CAST(count(DISTINCT user_id) AS BIGINT) AS users"),
        ),
        sdf=sdf,
    )
    assert not problems and 0 < n <= 13, (problems, n)


def test_auto_date_histogram_nested_bucket_stays_loud(spark, sf_dir):
    """Nested buckets / pipelines under an auto interval keep their
    pathed refusal (the chosen unit would be needed driver-side)."""
    ev = load(spark, sf_dir, "events")
    with pytest.raises(UnsupportedEsQuery, match="metric leaves"):
        es_aggs(ev, {"aggs": {"auto": {
            "auto_date_histogram": {"field": "ts", "buckets": 12},
            "aggs": {"t": {"terms": {"field": "event_type"}}},
        }}})
    with pytest.raises(UnsupportedEsQuery, match="metric leaves"):
        es_aggs(ev, {"aggs": {"auto": {
            "auto_date_histogram": {"field": "ts", "buckets": 12},
            "aggs": {"d": {"derivative": {"buckets_path": "vmax"}},
                     "vmax": {"max": {"field": "value"}}},
        }}})


# ------------------- frame pipelines (selector / sort) inside nesting


def test_nested_bucket_selector_and_sort_per_parent(spark):
    """bucket_selector filters row-locally; bucket_sort pages PER
    PARENT (each series keeps its own top-k — ES independent-instance
    semantics)."""
    rows = []
    for day, kind, n in [(1, "a", 5), (2, "a", 1), (3, "a", 3),
                         (4, "a", 2), (1, "b", 2), (2, "b", 4)]:
        for i in range(n):
            rows.append((len(rows), kind,
                         dt.datetime(2024, 1, day), float(day * 10 + i)))
    df = spark.createDataFrame(
        rows, "id long, kind string, ts timestamp, v double")
    out = es_aggs(df, {"aggs": {"t": {
        "terms": {"field": "kind"},
        "aggs": {"daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {
                "keep": {"bucket_selector": {
                    "buckets_path": {"c": "_count"},
                    "script": "params.c >= 2"}},
                "top2": {"bucket_sort": {"sort": [{"_count": "desc"}],
                                         "size": 2}},
            },
        }},
    }}})["t"]
    got = [(r["key"], r["daily_key"].day, r["doc_count"])
           for r in out.collect()]
    assert got == [("a", 1, 5), ("a", 3, 3), ("b", 1, 2), ("b", 2, 4)]


def test_nested_bucket_sort_from_offset(spark):
    """`from` pages past each parent's head buckets independently."""
    rows = []
    for day, kind, n in [(1, "a", 5), (2, "a", 4), (3, "a", 3),
                         (1, "b", 9), (2, "b", 1)]:
        for _ in range(n):
            rows.append((len(rows), kind, dt.datetime(2024, 1, day)))
    df = spark.createDataFrame(rows, "id long, kind string, ts timestamp")
    out = es_aggs(df, {"aggs": {"t": {
        "terms": {"field": "kind"},
        "aggs": {"daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"pg": {"bucket_sort": {
                "sort": [{"_count": "desc"}], "from": 1, "size": 1}}},
        }},
    }}})["t"]
    got = [(r["key"], r["daily_key"].day, r["doc_count"])
           for r in out.collect()]
    assert got == [("a", 2, 4), ("b", 2, 1)]


def test_nested_bucket_script_column(spark, sf_dir):
    """bucket_script appends its arithmetic column inside the nested
    frame (row-local — unchanged grammar), vs the DuckDB twin."""
    sdf = es_aggs(load(spark, sf_dir, "events"), {"aggs": {"t": {
        "terms": {"field": "event_type"},
        "aggs": {"daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {
                "vsum": {"sum": {"script":
                    "doc['event_id'].value * 0 + 1"}},
                "share": {"bucket_script": {
                    "buckets_path": {"c": "_count", "s": "vsum"},
                    "script": "params.s / params.c"}},
            },
        }},
    }}})["t"]
    problems, n = compare_query(spark, sf_dir, None, """
SELECT event_type AS key,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS daily_key,
       CAST(count(*) AS BIGINT) AS doc_count,
       CAST(count(*) AS BIGINT) AS vsum,
       CAST(count(*) AS DOUBLE) / count(*) AS share
FROM events GROUP BY 1, 2
""", sdf=sdf)
    assert not problems and n > 0, problems


# ----------------------------------------- terms include / exclude


def test_terms_include_exclude(spark, sf_dir):
    """Arrays are exact values, strings are anchored (Lucene full-
    match) regexps, exclude wins over include, and the predicate rides
    the SCAN (a row filter, not a bucket post-filter)."""
    ev = load(spark, sf_dir, "events")

    def run(**kw):
        return sorted(
            r["key"] for r in es_aggs(ev, {"aggs": {"t": {
                "terms": {"field": "event_type", **kw}}}})["t"].collect()
        )

    allk = run()
    assert run(include=["click", "view"]) == ["click", "view"]
    assert run(exclude=["click", "view"]) == \
        [k for k in allk if k not in ("click", "view")]
    # regex include is FULL-string: 'click|view' matches exactly those
    assert run(include="click|view") == ["click", "view"]
    # 'c.*' must not partial-match inside longer values
    assert run(include="c.*") == [k for k in allk if k.startswith("c")]
    assert run(include="click|view", exclude=["view"]) == ["click"]
    with pytest.raises(UnsupportedEsQuery, match="non-empty"):
        run(include=[])
    with pytest.raises(UnsupportedEsQuery, match="regexp"):
        run(include={"partition": 0, "num_partitions": 2})


def test_terms_include_nested_level(spark, sf_dir):
    """include/exclude participate at nested levels too (the spec's
    pre-predicate composes with the split scan filter)."""
    ev = load(spark, sf_dir, "events")
    out = es_aggs(ev, {"aggs": {"t": {
        "terms": {"field": "event_type", "include": ["click", "view"]},
        "aggs": {"daily": {"date_histogram": {
            "field": "ts", "calendar_interval": "week"}}},
    }}})["t"]
    assert sorted({r["key"] for r in out.collect()}) == ["click", "view"]


# --------------------------------------------- date_histogram offset


def test_date_histogram_offset_parity(spark, sf_dir):
    """ES offset rule round(ts - offset) + offset: +6h day buckets land
    at 06:00, vs the DuckDB twin; -1d week buckets give Sunday starts
    (the classic Kibana week-start shift)."""
    ev = load(spark, sf_dir, "events")
    sdf = es_aggs(ev, {"aggs": {"d": {"date_histogram": {
        "field": "ts", "calendar_interval": "day", "offset": "+6h"}}}})["d"]
    problems, n = compare_query(spark, sf_dir, None, """
SELECT CAST(date_trunc('day', ts - INTERVAL 6 HOUR)
            + INTERVAL 6 HOUR AS TIMESTAMP) AS key,
       CAST(count(*) AS BIGINT) AS doc_count
FROM events GROUP BY 1 ORDER BY key
""", sdf=sdf)
    assert not problems and n > 0, problems
    wk = es_aggs(ev, {"aggs": {"w": {"date_histogram": {
        "field": "ts", "calendar_interval": "week",
        "offset": "-1d"}}}})["w"]
    assert all(r["key"].weekday() == 6 for r in wk.collect())  # Sunday


def test_date_histogram_offset_dense_and_fixed(spark, sf_dir):
    """offset composes with min_doc_count: 0 (the spine steps stay
    offset-aligned) and with fixed_interval widths."""
    ev = load(spark, sf_dir, "events")
    dense = es_aggs(ev, {
        "query": {"range": {"value": {"gte": 250.0}}},
        "aggs": {"d": {"date_histogram": {
            "field": "ts", "calendar_interval": "day", "offset": "+6h",
            "min_doc_count": 0}}}})["d"].collect()
    assert all(r["key"].hour == 6 for r in dense)
    keys = [r["key"] for r in dense]
    assert all((b - a).total_seconds() == 86400.0
               for a, b in zip(keys, keys[1:]))
    fx = es_aggs(ev, {"aggs": {"f": {"date_histogram": {
        "field": "ts", "fixed_interval": "12h",
        "offset": "+2h"}}}})["f"].collect()
    assert all(r["key"].hour in (2, 14) for r in fx)


def test_date_histogram_offset_rejections(spark, sf_dir):
    """Malformed offsets and offset × time_zone raise with the path."""
    ev = load(spark, sf_dir, "events")
    for bad in ("6h", "+6q", "+1.5h"):
        with pytest.raises(UnsupportedEsQuery, match="offset"):
            es_aggs(ev, {"aggs": {"d": {"date_histogram": {
                "field": "ts", "calendar_interval": "day",
                "offset": bad}}}})
    with pytest.raises(UnsupportedEsQuery, match="offset"):
        es_aggs(ev, {"aggs": {"d": {"date_histogram": {
            "field": "ts", "calendar_interval": "day",
            "offset": "+6h", "time_zone": "+02:00"}}}})


# --------------------------- cumulative_cardinality inside a split


def test_nested_cumulative_cardinality_per_parent(spark):
    """Within each split value a key contributes from its first
    appearance in THAT parent onward — parents never share state."""
    rows = [("a", 1, "u1"), ("a", 1, "u2"), ("a", 2, "u1"),
            ("a", 3, "u3"), ("b", 1, "u1"), ("b", 2, "u9"),
            ("b", 3, "u9")]
    df = spark.createDataFrame(
        [(k, dt.datetime(2024, 1, d), u) for k, d, u in rows],
        "kind string, ts timestamp, u string")
    out = es_aggs(df, {"aggs": {"t": {
        "terms": {"field": "kind"},
        "aggs": {"daily": {
            "date_histogram": {"field": "ts",
                               "calendar_interval": "day"},
            "aggs": {
                "users": {"cardinality": {"field": "u"}},
                "cu": {"cumulative_cardinality": {
                    "buckets_path": "users"}},
            },
        }},
    }}})["t"]
    got = [(r["key"], r["daily_key"].day, r["users"], r["cu"])
           for r in out.collect()]
    assert got == [("a", 1, 2, 2), ("a", 2, 1, 2), ("a", 3, 1, 3),
                   ("b", 1, 1, 1), ("b", 2, 1, 2), ("b", 3, 1, 2)]


def test_nested_cumcard_duckdb_parity(spark, sf_dir):
    """The testdata shape vs a first-seen + windowed-sum DuckDB twin."""
    sdf = es_aggs(load(spark, sf_dir, "events"), {"aggs": {"t": {
        "terms": {"field": "event_type"},
        "aggs": {"daily": {
            "date_histogram": {"field": "ts",
                               "calendar_interval": "week"},
            "aggs": {
                "users": {"cardinality": {"field": "user_id"}},
                "cu": {"cumulative_cardinality": {
                    "buckets_path": "users"}},
            },
        }},
    }}})["t"]
    problems, n = compare_query(spark, sf_dir, None, """
WITH g AS (
  SELECT event_type AS key,
         CAST(date_trunc('week', ts) AS TIMESTAMP) AS daily_key,
         CAST(count(*) AS BIGINT) AS doc_count,
         CAST(count(DISTINCT user_id) AS BIGINT) AS users
  FROM events GROUP BY 1, 2
), f AS (
  SELECT event_type AS key,
         CAST(date_trunc('week', mts) AS TIMESTAMP) AS daily_key,
         CAST(count(*) AS BIGINT) AS new_u
  FROM (SELECT event_type, user_id, min(ts) AS mts
        FROM events GROUP BY 1, 2)
  GROUP BY 1, 2
)
SELECT g.key, g.daily_key, g.doc_count, g.users,
       CAST(sum(COALESCE(f.new_u, 0)) OVER (
         PARTITION BY g.key ORDER BY g.daily_key) AS BIGINT) AS cu
FROM g LEFT JOIN f USING (key, daily_key)
""", sdf=sdf)
    assert not problems and n > 0, problems


def test_nested_cumcard_rejections(spark, sf_dir):
    """buckets_path must name a sibling cardinality; terms inner
    buckets and three-level placements stay loud."""
    ev = load(spark, sf_dir, "events")
    with pytest.raises(UnsupportedEsQuery, match="cardinality"):
        es_aggs(ev, {"aggs": {"t": {
            "terms": {"field": "event_type"},
            "aggs": {"daily": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "day"},
                "aggs": {"cu": {"cumulative_cardinality": {
                    "buckets_path": "nope"}}},
            }},
        }}})
    with pytest.raises(UnsupportedEsQuery, match="ordered inner"):
        es_aggs(ev, {"aggs": {"t": {
            "date_histogram": {"field": "ts",
                               "calendar_interval": "day"},
            "aggs": {"by_type": {
                "terms": {"field": "event_type"},
                "aggs": {
                    "users": {"cardinality": {"field": "user_id"}},
                    "cu": {"cumulative_cardinality": {
                        "buckets_path": "users"}},
                },
            }},
        }}})


# ---------------------- histogram min_doc_count > 1 (silent-ignore fix)


def test_histogram_min_doc_count_prunes(spark):
    """min_doc_count > 1 on date_histogram/histogram PRUNES sparse
    buckets (pre-fix it was accepted and silently ignored — the
    drop-seam class this engine's verdicts keep closing)."""
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 5.0),
         (2, dt.datetime(2024, 1, 1), 5.5),
         (3, dt.datetime(2024, 1, 2), 15.0)],
        "id long, ts timestamp, v double")
    out = es_aggs(df, {"aggs": {"d": {"date_histogram": {
        "field": "ts", "calendar_interval": "day",
        "min_doc_count": 2}}}})["d"].collect()
    assert [(r["key"].day, r["doc_count"]) for r in out] == [(1, 2)]
    hv = es_aggs(df, {"aggs": {"h": {"histogram": {
        "field": "v", "interval": 10.0,
        "min_doc_count": 2}}}})["h"].collect()
    assert [(r["key"], r["doc_count"]) for r in hv] == [(0.0, 2)]
    # nested level: the inner prune block reads the same spec key
    nested = es_aggs(df, {"aggs": {"t": {
        "terms": {"field": "id"},
        "aggs": {"d": {"date_histogram": {
            "field": "ts", "calendar_interval": "day",
            "min_doc_count": 2}}},
    }}})["t"].collect()
    assert nested == []  # every (id, day) bucket holds 1 doc


def test_min_doc_count_prune_walk_combos_stay_loud(spark):
    """Walk pipelines and cumulative_cardinality over a PRUNED bucket
    sequence mix positional and key-interval semantics — refused."""
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "u1"),
         (2, dt.datetime(2024, 1, 1), "u2"),
         (3, dt.datetime(2024, 1, 2), "u3")],
        "id long, ts timestamp, u string")
    with pytest.raises(UnsupportedEsQuery, match="min_doc_count"):
        es_aggs(df, {"aggs": {"d": {
            "date_histogram": {"field": "ts", "calendar_interval": "day",
                               "min_doc_count": 2},
            "aggs": {"cs": {"cumulative_sum": {
                "buckets_path": "_count"}}},
        }}})
    with pytest.raises(UnsupportedEsQuery, match="min_doc_count"):
        es_aggs(df, {"aggs": {"d": {
            "date_histogram": {"field": "ts", "calendar_interval": "day",
                               "min_doc_count": 2},
            "aggs": {
                "users": {"cardinality": {"field": "u"}},
                "cu": {"cumulative_cardinality": {
                    "buckets_path": "users"}},
            },
        }}})


def test_terms_include_malformed_regex_pathed(spark, sf_dir):
    """A malformed include pattern raises driver-side with the path,
    never a mid-job Java PatternSyntaxException."""
    ev = load(spark, sf_dir, "events")
    with pytest.raises(UnsupportedEsQuery, match="does not parse"):
        es_aggs(ev, {"aggs": {"t": {"terms": {
            "field": "event_type", "include": "(unclosed"}}}})


# -------------------------------------------- MovingFunctions family


def test_moving_fn_family(spark):
    """max/min/sum/stdDev over the shifted window (TSVB's moving
    metrics) — same contribution frame as unweightedAvg; ES shift
    semantics (default excludes the current bucket)."""
    rows = [(i, dt.datetime(2024, 1, d)) for i, d in
            enumerate([1] * 1 + [2] * 2 + [3] * 3 + [4] * 4 + [5] * 5)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = es_aggs(df, {"aggs": {"d": {
        "date_histogram": {"field": "ts", "calendar_interval": "day",
                           "min_doc_count": 0},
        "aggs": {
            "mvmax": {"moving_fn": {"buckets_path": "_count",
                "window": 2, "script": "MovingFunctions.max(values)"}},
            "mvsum": {"moving_fn": {"buckets_path": "_count",
                "window": 2, "script": "MovingFunctions.sum(values)"}},
            "mvstd": {"moving_fn": {"buckets_path": "_count",
                "window": 2, "script":
                "MovingFunctions.stdDev(values, "
                "MovingFunctions.unweightedAvg(values))"}},
        },
    }}})["d"].orderBy("key")
    got = [(r["key"].day, r["doc_count"], r["mvmax"], r["mvsum"],
            r["mvstd"]) for r in out.collect()]
    # window 2, shift 0: value at day j aggregates counts of days j-2, j-1
    assert got == [
        (1, 1, None, None, None),
        (2, 2, 1, 1, 0.0),
        (3, 3, 2, 3, 0.5),
        (4, 4, 3, 5, 0.5),
        (5, 5, 4, 7, 0.5),
    ]
    with pytest.raises(UnsupportedEsQuery, match="MovingFunctions"):
        es_aggs(df, {"aggs": {"d": {
            "date_histogram": {"field": "ts", "calendar_interval": "day",
                               "min_doc_count": 0},
            "aggs": {"bad": {"moving_fn": {"buckets_path": "_count",
                "window": 2, "script": "values.stream().sum()"}}},
        }}})


# ------------------------------------------ numeric histogram offset


def test_numeric_histogram_offset(spark):
    """ES numeric-histogram offset: buckets anchor at offset + n·w
    (any offset normalizes into [0, interval)); dense spines step
    offset-aligned indices, single and per-parent."""
    df = spark.createDataFrame(
        [(1, "a", 4.0), (2, "a", 11.0), (3, "a", 36.0),
         (4, "b", 7.0), (5, "b", 26.0)],
        "id long, kind string, v double")
    out = es_aggs(df, {"aggs": {"h": {"histogram": {
        "field": "v", "interval": 10.0, "offset": 5.0,
        "min_doc_count": 0}}}})["h"].collect()
    # offset-5 buckets: [-5,5) [5,15) [15,25) [25,35) [35,45)
    assert [(r["key"], r["doc_count"]) for r in out] == [
        (-5.0, 1), (5.0, 2), (15.0, 0), (25.0, 1), (35.0, 1)]
    nested = es_aggs(df, {"aggs": {"t": {
        "terms": {"field": "kind"},
        "aggs": {"h": {"histogram": {
            "field": "v", "interval": 10.0, "offset": 5.0,
            "min_doc_count": 0}}},
    }}})["t"].collect()
    got = {}
    for r in nested:
        got.setdefault(r["key"], []).append((r["h_key"], r["doc_count"]))
    assert got["a"] == [(-5.0, 1), (5.0, 1), (15.0, 0), (25.0, 0),
                        (35.0, 1)]
    assert got["b"] == [(5.0, 1), (15.0, 0), (25.0, 1)]
    # offset 15 normalizes to 5 (ES's [0, interval) rule)
    norm = es_aggs(df, {"aggs": {"h": {"histogram": {
        "field": "v", "interval": 10.0, "offset": 15.0}}}})["h"].collect()
    assert [r["key"] for r in norm] == [-5.0, 5.0, 25.0, 35.0]


# --------------------------- three-level leaf: dense / sort / cumcard


def test_three_level_leaf_extensions(spark):
    """The leaf of a three-level nesting now takes dense spines,
    bucket_sort pages, and exact cumulative_cardinality — each keyed
    by BOTH split columns (independent (chart, series) instances)."""
    rows = [
        ("a", 1, 1, "u1"), ("a", 1, 3, "u2"),      # gap at day 2
        ("a", 2, 1, "u1"), ("b", 1, 2, "u9"),
        ("b", 1, 4, "u9"),                          # gap at day 3
    ]
    df = spark.createDataFrame(
        [(k, g, dt.datetime(2024, 1, d), u) for k, g, d, u in rows],
        "kind string, grp long, ts timestamp, u string")
    body = {"aggs": {"l1": {
        "terms": {"field": "kind"},
        "aggs": {"l2": {
            "terms": {"field": "grp"},
            "aggs": {"l3": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "day",
                                   "min_doc_count": 0},
                "aggs": {
                    "users": {"cardinality": {"field": "u"}},
                    "cu": {"cumulative_cardinality": {
                        "buckets_path": "users"}},
                },
            }},
        }},
    }}}
    out = es_aggs(df, body)["l1"]
    got = [(r["key"], r["l2_key"], r["l3_key"].day, r["doc_count"],
            r["cu"]) for r in out.collect()]
    assert got == [
        ("a", 1, 1, 1, 1), ("a", 1, 2, 0, 1), ("a", 1, 3, 1, 2),
        ("a", 2, 1, 1, 1),
        ("b", 1, 2, 1, 1), ("b", 1, 3, 0, 1), ("b", 1, 4, 1, 1),
    ]
    # bucket_sort at the leaf: top-1 day per (kind, grp) by count
    sorted_body = {"aggs": {"l1": {
        "terms": {"field": "kind"},
        "aggs": {"l2": {
            "terms": {"field": "grp"},
            "aggs": {"l3": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "day"},
                "aggs": {"top1": {"bucket_sort": {
                    "sort": [{"_count": "desc"}], "size": 1}}},
            }},
        }},
    }}}
    cut = es_aggs(df, sorted_body)["l1"]
    assert [(r["key"], r["l2_key"], r["l3_key"].day)
            for r in cut.collect()] == [
        ("a", 1, 1), ("a", 2, 1), ("b", 1, 2)]
