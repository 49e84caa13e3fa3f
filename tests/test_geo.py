"""Geo function unit tests: haversine sanity, grid monotonicity, and the
exact-arithmetic ranking equivalence sq_degree vs haversine at small extents.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pandemic_knowledge_spark.functions.geo import (
    grid_cell_id,
    haversine_km,
    sq_degree_dist,
)


def test_haversine_known_distances(spark):
    # Paris (48.8566, 2.3522) ↔ London (51.5074, -0.1278) ≈ 343.5 km
    df = spark.createDataFrame(
        [Row(lat1=48.8566, lon1=2.3522, lat2=51.5074, lon2=-0.1278)]
    )
    km = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("km")
    ).first()["km"]
    assert km == pytest.approx(343.5, abs=1.5)


def test_haversine_zero_and_antipodal(spark):
    df = spark.createDataFrame([Row(lat=12.34, lon=56.78)])
    zero = df.select(
        haversine_km(F.col("lat"), F.col("lon"), F.col("lat"), F.col("lon")).alias("km")
    ).first()["km"]
    assert zero == pytest.approx(0.0, abs=1e-9)
    anti = df.select(
        haversine_km(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(180.0)).alias("km")
    ).first()["km"]
    assert anti == pytest.approx(20015.1, abs=5.0)  # half circumference


def test_grid_cell_id_buckets(spark):
    df = spark.createDataFrame(
        [Row(lat=48.85, lon=2.35), Row(lat=41.0, lon=9.9), Row(lat=-33.9, lon=151.2)]
    )
    cells = [
        r.cell
        for r in df.select(grid_cell_id(F.col("lat"), F.col("lon"), 10.0).alias("cell")).collect()
    ]
    assert cells == ["4:0", "4:0", "-4:15"]  # Paris & Sardinia share a 10° cell


def test_sq_degree_ranks_like_haversine_on_nested_rings(spark):
    """For displacements monotone in both axes (nested rings), squared-degree
    ordering equals haversine ordering — the regime documented in geo.py
    (elongated sets may differ because lon degrees shrink by cos(lat))."""
    pts = [Row(pid=i, lat=45.0 + i * 0.3, lon=5.0 + i * 0.2) for i in range(6)]
    df = spark.createDataFrame(pts)
    ranked = df.select(
        "pid",
        haversine_km(F.col("lat"), F.col("lon"), F.lit(45.0), F.lit(5.0)).alias("hv"),
        sq_degree_dist(F.col("lat"), F.col("lon"), F.lit(45.0), F.lit(5.0)).alias("sq"),
    ).collect()
    by_hv = [r.pid for r in sorted(ranked, key=lambda r: r.hv)]
    by_sq = [r.pid for r in sorted(ranked, key=lambda r: r.sq)]
    assert by_hv == by_sq


def test_kmeans_partitions_corpus_and_is_partitioning_invariant(spark):
    """Every vector lands in exactly one cluster; the result is identical
    under a different input partitioning (exact integer arithmetic — no
    FP merge-order sensitivity)."""
    from pandemic_knowledge_spark.operators.similarity import kmeans_embeddings
    from pandemic_knowledge_spark.tables import load

    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    out = kmeans_embeddings(e, "embedding", "vec_id", k=4, iters=2).collect()
    assert sum(r.n_vecs for r in out) == e.count()
    assert len(out) <= 4
    again = kmeans_embeddings(
        e.repartition(17), "embedding", "vec_id", k=4, iters=2
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_kmeans_fewer_vectors_than_k(spark):
    from pandemic_knowledge_spark.operators.similarity import kmeans_embeddings

    e = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])], "vec_id long, embedding array<float>"
    )
    out = kmeans_embeddings(e, "embedding", "vec_id", k=8, iters=2).collect()
    assert sum(r.n_vecs for r in out) == 2 and len(out) <= 2
