"""Streaming SCD2 maintenance (streaming/sinks.py::scd2_sink): after every
micro-batch the published table equals a full batch rebuild over all changes
seen so far — including out-of-order arrivals across batches."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pandemic_knowledge_spark.operators.history import build_scd2
from pandemic_knowledge_spark.streaming.sinks import AtomicTable, scd2_sink

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("attr", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def _t(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


def _run(spark, landing, table, cp):
    q = scd2_sink(
        spark.readStream.schema(SCHEMA).parquet(landing),
        table,
        key_cols=["k"],
        attr_cols=["attr"],
        ts_col="ts",
        checkpoint=cp,
        available_now=True,
    )
    q.awaitTermination(120)


def _rows(df):
    return {
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current) for r in df.collect()
    }


def test_stream_equals_batch_rebuild_at_every_point(spark, tmp_path):
    landing = str(tmp_path / "landing")
    cp = str(tmp_path / "cp")
    table = AtomicTable(str(tmp_path / "hist"))

    b1 = [(1, "a", _t(1)), (1, "a", _t(2)), (2, "x", _t(1))]
    b2 = [(1, "b", _t(5)), (3, "m", _t(4))]
    b3 = [(1, "c", _t(3))]  # LATE: splices between a (t1) and b (t5)

    seen: list[tuple] = []
    for batch in (b1, b2, b3):
        seen.extend(batch)
        spark.createDataFrame(batch, SCHEMA).write.mode("append").parquet(landing)
        _run(spark, landing, table, cp)
        expect = build_scd2(
            spark.createDataFrame(seen, SCHEMA).select("k", "attr", "ts"),
            ["k"], ["attr"], "ts",
        )
        assert _rows(table.read(spark)) == _rows(expect)

    # final shape: the late 'c' opened [t3, t5) inside key 1's chain
    final = _rows(table.read(spark))
    assert (1, "c", _t(3), _t(5), False) in final
    assert (1, "b", _t(5), None, True) in final


def test_replayed_batch_is_idempotent(spark, tmp_path):
    table = AtomicTable(str(tmp_path / "hist"))
    batch = spark.createDataFrame(
        [(1, "a", _t(1)), (1, "b", _t(2))], SCHEMA
    ).select("k", "attr", "ts")

    from pandemic_knowledge_spark.operators.history import scd2_merge

    hist1 = build_scd2(batch, ["k"], ["attr"], "ts")
    table.overwrite(hist1)
    # replay the same changes (at-least-once delivery): merge must not
    # duplicate versions — re-stated runs compress away.
    hist2 = scd2_merge(table.read(spark), batch, ["k"], ["attr"], "ts")
    assert _rows(hist2) == _rows(hist1)
