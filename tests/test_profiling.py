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
