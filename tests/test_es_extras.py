"""Wave-3 ES surface (r9): boosting query, field collapse,
median_absolute_deviation, rate, stats_bucket — operators with DuckDB
oracle parity through the pytest harness now; their catalog rows join the
r10 driver window (the 50 r9 slots were committed to the declared IOU
rotation — see plans/catalog._DRIVER_PRIORITY)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandemic_knowledge_spark.operators.aggregates import (
    mad_by,
    rate_monthly,
    sql_mad_by,
    sql_rate_monthly,
    sql_stats_bucket_daily,
    stats_bucket_daily,
)
from pandemic_knowledge_spark.operators.boolquery import (
    boosting_search,
    collapse_search,
    sql_boosting_search,
    sql_collapse_search,
)
from pandemic_knowledge_spark.tables import load
from tests.oracle_harness import compare_query


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------ oracle parity


def test_boosting_matches_duckdb(spark, sf_dir):
    pos = {"match": "spark stream window"}
    neg = {"term": "vector"}
    fn = lambda s, d: boosting_search(
        load(s, d, "documents"), "doc_id", "text", pos, neg,
        negative_boost=0.4, k=10,
    )
    problems, n = compare_query(
        spark, sf_dir, fn,
        sql_boosting_search("documents", "doc_id", "text", pos, neg,
                            negative_boost=0.4, k=10),
    )
    assert problems == [] and n == 10


def test_collapse_matches_duckdb(spark, sf_dir):
    fn = lambda s, d: collapse_search(
        load(s, d, "documents"), "doc_id", "text", "spark stream",
        "lang", k=10,
    )
    problems, n = compare_query(
        spark, sf_dir, fn,
        sql_collapse_search("documents", "doc_id", "text", "spark stream",
                            "lang", k=10),
    )
    assert problems == []
    assert n == 5  # one representative per language


def test_mad_matches_duckdb(spark, sf_dir):
    fn = lambda s, d: mad_by(load(s, d, "events"), "event_type", "value")
    problems, n = compare_query(
        spark, sf_dir, fn, sql_mad_by("events", "event_type", "value")
    )
    assert problems == [] and n == 5


def test_rate_matches_duckdb(spark, sf_dir):
    fn = lambda s, d: rate_monthly(load(s, d, "events"), "ts", "value")
    problems, n = compare_query(
        spark, sf_dir, fn, sql_rate_monthly("events", "ts", "value")
    )
    assert problems == [] and n > 0


def test_stats_bucket_matches_duckdb(spark, sf_dir):
    fn = lambda s, d: stats_bucket_daily(load(s, d, "events"), "ts")
    problems, n = compare_query(
        spark, sf_dir, fn, sql_stats_bucket_daily("events", "ts")
    )
    assert problems == [] and n == 1


# --------------------------------------------------------------- semantics


def test_boosting_demotes_without_excluding(spark):
    d = _docs(spark, [(1, "apple fresh"), (2, "apple stale"), (3, "kiwi")])
    out = boosting_search(
        d, "doc_id", "text", {"match": "apple"}, {"term": "stale"},
        negative_boost=0.5, k=10,
    )
    rows = {r["doc_id"]: r["score"] for r in out.collect()}
    # the stale doc stays in the results (unlike must_not) but demoted
    assert set(rows) == {1, 2}
    assert rows[2] == pytest.approx(0.5 * rows[1], abs=2e-4)


def test_collapse_keeps_best_per_value(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple apple", "a"),
            (2, "apple", "a"),
            (3, "apple apple", "b"),
            (4, "kiwi", "b"),
        ],
        "doc_id long, text string, src string",
    )
    out = collapse_search(docs, "doc_id", "text", "apple", "src", k=10)
    got = [(r["collapse_key"], r["doc_id"]) for r in out.collect()]
    # one hit per src, the highest-tf doc of each
    assert sorted(got) == [("a", 1), ("b", 3)]


def test_mad_is_zero_for_constant_and_robust_to_outlier(spark):
    df = spark.createDataFrame(
        [("k", 5.0)] * 5 + [("k", 1000.0)], "g string, v double"
    )
    out = {r["g"]: r["mad"] for r in mad_by(df, "g", "v").collect()}
    # median 5, deviations (0,0,0,0,0,995) -> MAD 0: the outlier is invisible
    assert out["k"] == 0.0


def test_rate_normalizes_by_month_length(spark):
    df = spark.createDataFrame(
        [("2024-02-10 00:00:00", 1.0)] * 29 + [("2024-03-10 00:00:00", 1.0)] * 31,
        "ts string, value double",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
    out = {str(r["month"]): r for r in rate_monthly(df, "ts", "value").collect()}
    assert out["2024-02-01"]["days"] == 29  # leap February
    assert out["2024-03-01"]["days"] == 31
    assert out["2024-02-01"]["doc_rate_per_day"] == 1.0
    assert out["2024-03-01"]["doc_rate_per_day"] == 1.0


def test_stats_bucket_moments_exact(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00",)] * 2 + [("2024-01-02 00:00:00",)] * 4,
        "ts string",
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    row = stats_bucket_daily(df, "ts").collect()[0]
    assert (row["bucket_count"], row["min_count"], row["max_count"],
            row["sum_count"]) == (2, 2, 4, 6)
    assert row["avg_count"] == 3.0
    assert row["variance"] == 1.0  # population variance of {2, 4}
    assert row["std_deviation"] == 1.0


# ------------------------------------------------------ wildcard / regexp


def test_wildcard_matches_duckdb(spark, sf_dir):
    from pandemic_knowledge_spark.operators.search import (
        sql_wildcard_search,
        wildcard_search,
    )

    fn = lambda s, d: wildcard_search(
        load(s, d, "documents"), "doc_id", "text", "s*m", k=10
    )
    problems, n = compare_query(
        spark, sf_dir, fn,
        sql_wildcard_search("documents", "doc_id", "text", "s*m", k=10),
    )
    assert problems == [] and n == 10


def test_regexp_matches_duckdb(spark, sf_dir):
    from pandemic_knowledge_spark.operators.search import (
        regexp_search,
        sql_regexp_search,
    )

    pat = "(spark|stream|scan)"
    fn = lambda s, d: regexp_search(
        load(s, d, "documents"), "doc_id", "text", pat, k=10
    )
    problems, n = compare_query(
        spark, sf_dir, fn,
        sql_regexp_search("documents", "doc_id", "text", pat, k=10),
    )
    assert problems == [] and n == 10


def test_wildcard_expansion_matches_whole_term(spark):
    from pandemic_knowledge_spark.operators.search import wildcard_search

    docs = spark.createDataFrame(
        [(1, "stream"), (2, "streaming"), (3, "steam"), (4, "xstream")],
        "doc_id long, text string",
    )
    # 's*m' must match the ENTIRE term: stream and steam qualify (start
    # 's', end 'm'); streaming ends 'g', xstream starts 'x' — excluded
    out = sorted(r["doc_id"] for r in
                 wildcard_search(docs, "doc_id", "text", "s*m", k=10).collect())
    assert out == [1, 3]


# ----------------------------------------------------------------- rescore


def test_rescore_matches_duckdb(spark, sf_dir):
    from pandemic_knowledge_spark.operators.boolquery import (
        rescore_search,
        sql_rescore_search,
    )

    args = dict(query="spark stream", rescore_phrase="fast scan",
                window_size=40, query_weight=1.0, rescore_weight=2.0, k=10)
    fn = lambda s, d: rescore_search(
        load(s, d, "documents"), "doc_id", "text", **args
    )
    problems, n = compare_query(
        spark, sf_dir, fn,
        sql_rescore_search("documents", "doc_id", "text", **args),
    )
    assert problems == [] and n == 10


def test_rescore_only_touches_the_window(spark):
    from pandemic_knowledge_spark.operators.boolquery import rescore_search

    docs = spark.createDataFrame(
        [
            (1, "apple pie apple"),          # strong match + phrase
            (2, "apple apple apple apple"),  # strongest match, no phrase
            (3, "apple pie"),                # weaker match + phrase
            (4, "pie apple zzz"),            # match, reversed order
        ],
        "doc_id long, text string",
    )
    out = rescore_search(
        docs, "doc_id", "text", "apple", "apple pie",
        window_size=10, rescore_weight=10.0, k=4,
    ).collect()
    # phrase docs jump over the pure-tf leader once rescored
    assert out[0]["doc_id"] in (1, 3)
    ids = [r["doc_id"] for r in out]
    assert set(ids) == {1, 2, 3, 4}


# ------------------------------------------------- terms_set / geohash


def test_terms_set_matches_duckdb_and_counts_terms(spark, sf_dir):
    from pandemic_knowledge_spark.operators.boolquery import (
        sql_terms_set_search,
        terms_set_search,
    )

    terms = ["spark", "stream", "window", "vector"]
    fn = lambda s, d: terms_set_search(
        load(s, d, "documents"), "doc_id", "text", terms, 3, k=10
    )
    problems, n = compare_query(
        spark, sf_dir, fn,
        sql_terms_set_search("documents", "doc_id", "text", terms, 3, k=10),
    )
    assert problems == [] and n == 10
    # msm semantics on a synthetic corpus: >= 2 of 3 terms required
    d = _docs(spark, [(1, "a b c"), (2, "a b"), (3, "a"), (4, "z")])
    got = sorted(
        r["doc_id"]
        for r in terms_set_search(d, "doc_id", "text", ["a", "b", "c"], 2).collect()
    )
    assert got == [1, 2]


def test_geohash_known_value(spark):
    """The canonical geohash example: (57.64911, 10.40744) -> u4pruydqqvj
    (Wikipedia's worked example); check the 5- and 7-char truncations."""
    from pandemic_knowledge_spark.functions.geo import geohash_cell

    df = spark.createDataFrame([(57.64911, 10.40744)], "lat double, lon double")
    for prec, want in ((5, "u4pru"), (7, "u4pruyd")):
        got = df.select(
            geohash_cell(F.col("lat"), F.col("lon"), prec).alias("g")
        ).collect()[0]["g"]
        assert got == want, (prec, got)


def test_geohash_clamps_out_of_range_coords_both_engines(spark, sf_dir):
    """Coordinates outside [-90,90]/[-180,180] clamp to the boundary cell
    on BOTH engines (the r9 advisor found the lower bound unclamped —
    shiftright on a negative quantized long made garbage cells)."""
    import duckdb

    from pandemic_knowledge_spark.functions.geo import (
        geohash_cell,
        sql_geohash_chars,
        sql_geohash_quant,
    )

    pts = [(-95.0, -185.0), (-90.0, -180.0), (95.0, 185.0), (90.0, 180.0)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = [
        r["g"]
        for r in df.select(
            geohash_cell(F.col("lat"), F.col("lon"), 5).alias("g")
        ).collect()
    ]
    # below-range == at-boundary (clamped), above-range == at-boundary
    assert got[0] == got[1] and got[2] == got[3]
    assert all(len(g) == 5 for g in got)
    lon_q, lat_q = sql_geohash_quant("lat", "lon", 5)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(lat DOUBLE, lon DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    oracle = [
        r[0]
        for r in con.execute(
            f"""WITH q AS (SELECT {lon_q} AS lonq, {lat_q} AS latq FROM pts)
            SELECT {sql_geohash_chars('lonq', 'latq', 5)} FROM q"""
        ).fetchall()
    ]
    assert oracle == got


def test_geohash_grid_matches_duckdb(spark, sf_dir):
    """geohash_grid aggregation parity: customers bucketed by 4-char
    geohash over the synthetic coordinates, counted per cell."""
    from pandemic_knowledge_spark.functions.geo import (
        geohash_cell,
        sql_geohash_chars,
        sql_geohash_quant,
        synth_lat,
        synth_lon,
        sql_synth_lat,
        sql_synth_lon,
    )

    prec = 4
    fn = lambda s, d: (
        load(s, d, "customer")
        .select(
            geohash_cell(
                synth_lat(F.col("c_custkey")), synth_lon(F.col("c_custkey")), prec
            ).alias("cell")
        )
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("cell")
    )
    lon_q, lat_q = sql_geohash_quant(
        sql_synth_lat("c_custkey"), sql_synth_lon("c_custkey"), prec
    )
    oracle = f"""
WITH q AS (
  SELECT {lon_q} AS lonq, {lat_q} AS latq FROM customer
)
SELECT {sql_geohash_chars('lonq', 'latq', prec)} AS cell,
       CAST(count(*) AS BIGINT) AS doc_count
FROM q GROUP BY 1 ORDER BY 1
"""
    problems, n = compare_query(spark, sf_dir, fn, oracle)
    assert problems == [] and n > 0
