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


def test_string_ids_pack_without_corruption(spark):
    """Regression (round-2 advice): non-numeric ids must keep their identity
    — the old cast-to-long turned them ALL into nulls, collapsing bucket
    assignment and in-bucket order."""
    rows = spark.createDataFrame(
        [("doc-a", 600), ("doc-b", 500), ("doc-c", 24)],
        "doc_id string, n_chars long",
    )
    out = pack_sequences(rows, "doc_id", "n_chars", BUDGET, n_buckets=1)
    got = sorted((r.doc_id, r.bin_in_bucket) for r in out.collect())
    # id order doc-a, doc-b, doc-c: 600 then 500 overflows -> new bin; 24 joins it
    assert got == [("doc-a", 0), ("doc-b", 1), ("doc-c", 1)]
    assert dict(out.dtypes)["doc_id"] == "string"


def test_null_ids_fail_fast(spark):
    import pytest

    rows = spark.createDataFrame(
        [(None, 600), ("doc-b", 500)], "doc_id string, n_chars long"
    )
    with pytest.raises(Exception, match="null values in id column"):
        pack_sequences(rows, "doc_id", "n_chars", BUDGET, n_buckets=1).collect()


def _nextfit_reference(sorted_costs, budget):
    bins, bin_id, fill, first = [], 0, 0, True
    for c in sorted_costs:
        if first:
            first, fill = False, c
        elif fill + c <= budget:
            fill += c
        else:
            bin_id, fill = bin_id + 1, c
        bins.append(bin_id)
    return bins


def test_pack_matches_pure_python_reference(spark):
    """Property (hypothesis-style over a generated batch): the distributed
    applyInPandas packing reproduces a 5-line sequential next-fit exactly,
    per bucket, for adversarial cost mixes (zeros excluded by contract,
    oversized docs included)."""
    import random

    rng = random.Random(7)
    rows = [(i, rng.choice([1, 50, 1023, 1024, 1025, 5000, rng.randint(1, 2000)]))
            for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = pack_sequences(df, "doc_id", "n_chars", BUDGET, n_buckets=4)
    got = {}
    for r in out.collect():
        got.setdefault(r.bucket, []).append((r.doc_id, r.bin_in_bucket, r.cost))
    assert sum(len(v) for v in got.values()) == 300
    for bucket, members in got.items():
        members.sort()
        want = _nextfit_reference([c for _, _, c in members], BUDGET)
        assert [b for _, b, _ in members] == want, f"bucket {bucket} diverges"
