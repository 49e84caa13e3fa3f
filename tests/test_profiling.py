"""Table profiling (operators/profiling.py)."""

from __future__ import annotations

from pandemic_knowledge_spark.operators.profiling import profile_table


def test_profile_counts_nulls_distincts_and_ranges(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], ["x", "s"]
    )
    got = {r.col_name: r for r in profile_table(df).collect()}
    assert got["x"].n_rows == 4 and got["x"].n_null == 1
    assert got["x"].n_distinct == 2
    assert got["x"].min_str == "1" and got["x"].max_str == "2"
    assert got["s"].n_null == 1 and got["s"].n_distinct == 2
    assert got["s"].min_str == "a" and got["s"].max_str == "b"


def test_profile_column_subset_prunes_scan(spark, sf_dir):
    from pandemic_knowledge_spark.tables import load

    o = load(spark, sf_dir, "orders")
    prof = profile_table(o, ["o_orderkey"])
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<o_orderkey" in plan  # only the profiled column
    assert prof.count() == 1


def test_psi_drift_detects_shift(spark):
    """Identical distributions score ~0 PSI; a shifted period scores
    above the conventional 0.25 alarm threshold."""
    import datetime as dt
    import random

    from pandemic_knowledge_spark.operators.profiling import distribution_drift_psi

    rng = random.Random(6)
    rows = []
    eid = 0
    for i in range(10):  # period A: values ~ U(10, 20)
        for _ in range(200):
            rows.append((eid, dt.datetime(2024, 1, 1 + i, 12), rng.uniform(10, 20)))
            eid += 1
    for i in range(10):  # period B same days later, SAME distribution
        for _ in range(200):
            rows.append((eid, dt.datetime(2024, 1, 21 + i, 12), rng.uniform(10, 20)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    same = distribution_drift_psi(
        ev, "value", "ts", ("2024-01-01", "2024-01-10"), ("2024-01-21", "2024-01-30")
    ).collect()[0]
    assert same.n_a == 2000 and same.n_b == 2000
    assert same.psi < 0.25

    # period B shifted to U(40, 60) -> loud drift
    rows2 = [r for r in rows if r[1].day <= 10]
    for i in range(10):
        for _ in range(200):
            rows2.append((eid, dt.datetime(2024, 1, 21 + i, 12), rng.uniform(40, 60)))
            eid += 1
    ev2 = spark.createDataFrame(rows2, "event_id long, ts timestamp, value double")
    shifted = distribution_drift_psi(
        ev2, "value", "ts", ("2024-01-01", "2024-01-10"), ("2024-01-21", "2024-01-30")
    ).collect()[0]
    assert shifted.psi > 1.0
