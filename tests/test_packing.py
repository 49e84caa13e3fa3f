"""Sequence packing (operators/packing.py): the bucket — not the Spark
partition — is the parallel unit, so results must be bit-identical under any
partitioning; bins respect the budget except oversized singletons; nothing
is dropped. Oracle parity (recursive CTE) is covered by
catalog:`pack_training_bins`."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandemic_knowledge_spark.operators.packing import pack_sequences
from pandemic_knowledge_spark.tables import load

BUDGET = 1024


def _packed(df):
    return sorted(
        (r.doc_id, r.bucket, r.bin_in_bucket) for r in df.collect()
    )


def test_packing_invariant_under_partitioning(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    a = pack_sequences(d.repartition(1), "doc_id", "n_chars", BUDGET)
    b = pack_sequences(d.repartition(7, "lang"), "doc_id", "n_chars", BUDGET)
    assert _packed(a) == _packed(b)


def test_packing_is_total_and_respects_budget(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    out = pack_sequences(d, "doc_id", "n_chars", BUDGET)
    assert out.count() == d.count()  # nothing dropped
    fills = out.groupBy("bucket", "bin_in_bucket").agg(
        F.sum("cost").alias("fill"), F.count(F.lit(1)).alias("n")
    )
    # a bin over budget can only be an oversized singleton
    assert fills.filter((F.col("fill") > BUDGET) & (F.col("n") > 1)).count() == 0


def test_oversized_doc_gets_own_bin(spark):
    rows = spark.createDataFrame(
        [(1, 10), (2, 99999), (3, 10)], "doc_id long, n_chars long"
    )
    out = pack_sequences(rows, "doc_id", "n_chars", BUDGET, n_buckets=1)
    by_id = {r.doc_id: r.bin_in_bucket for r in out.collect()}
    assert by_id[1] != by_id[2] and by_id[2] != by_id[3]  # 99999 isolated
    assert out.count() == 3


def test_nextfit_opens_new_bin_exactly_on_overflow(spark):
    """Costs 600, 400, 30, 600 with budget 1024 → bins [0, 0, 0, 1]:
    600+400+24 fits nothing more after 30 (1030 > 1024)."""
    rows = spark.createDataFrame(
        [(1, 600), (2, 400), (3, 24), (4, 600)], "doc_id long, n_chars long"
    )
    out = pack_sequences(rows, "doc_id", "n_chars", BUDGET, n_buckets=1)
    by_id = {r.doc_id: r.bin_in_bucket for r in out.collect()}
    assert by_id == {1: 0, 2: 0, 3: 0, 4: 1}
