"""Keyed SCD1 upsert through the atomic swap
(streaming/sinks.py::upsert_sink): arriving rows replace same-key rows,
unmatched rows survive, within-batch latest-by-order wins, and every batch
publishes atomically (readers never see a mix)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from pandemic_knowledge_spark.streaming.sinks import AtomicTable, upsert_sink

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("val", StringType()),
        StructField("ts", LongType()),
    ]
)


def _run(spark, landing, table, cp):
    q = upsert_sink(
        spark.readStream.schema(SCHEMA).parquet(landing),
        table,
        keys=["k"],
        order_col="ts",
        checkpoint=cp,
        available_now=True,
    )
    q.awaitTermination(120)


def test_upsert_replaces_keeps_and_resolves_within_batch(spark, tmp_path):
    landing = str(tmp_path / "landing")
    cp = str(tmp_path / "cp")
    table = AtomicTable(str(tmp_path / "table"))

    spark.createDataFrame(
        [(1, "a0", 10), (2, "b0", 10), (3, "c0", 10)], SCHEMA
    ).coalesce(1).write.parquet(landing)
    _run(spark, landing, table, cp)
    assert {(r.k, r.val) for r in table.read(spark).collect()} == {
        (1, "a0"), (2, "b0"), (3, "c0"),
    }
    v1 = table.current_version()

    # Second drop: key 2 updated TWICE in one batch (ts 20 then 30 — the
    # ts=30 row must win), key 4 is new, keys 1/3 untouched.
    spark.createDataFrame(
        [(2, "b1", 20), (2, "b2", 30), (4, "d0", 20)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(landing)
    _run(spark, landing, table, cp)
    assert {(r.k, r.val) for r in table.read(spark).collect()} == {
        (1, "a0"), (2, "b2"), (3, "c0"), (4, "d0"),
    }
    # a fresh version was published; the previous one is retained for
    # in-flight readers
    assert table.current_version() != v1

    # no new files → no-op (checkpoint replay safety), version unchanged
    v2 = table.current_version()
    _run(spark, landing, table, cp)
    assert table.current_version() == v2
