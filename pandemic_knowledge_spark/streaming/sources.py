"""Streaming sources (SURVEY.md §2.10 W1; §2.1 S1/S5/S6 stream forms).

The reference re-ingests whole buckets / re-crawls feeds every 24 h
(/root/reference/flow/scripts/insert_owid.py:282-284,
crawl_google_news.py:28-30). Spark-first, the equivalent continuous form is
a file-source stream over the landing directory — each new dropped file is a
micro-batch — plus the built-in rate source for load/latency testing. At
cluster scale the same code points at an object-store prefix (s3a://...);
maxFilesPerTrigger bounds per-batch work exactly like the reference's
MAX_ES_ROW_INJECT flush bound (/root/reference/.env.example:27).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """Micro-batch file source over a landing directory (W1).

    Schema must be explicit — streaming sources cannot infer — which also
    locks in the conformed shape the way the reference's ES mappings do
    (/root/reference/flow/scripts/mapping.py:1-29).
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def rate_events(
    spark: SparkSession, rows_per_second: int = 100, partitions: int = 4
) -> DataFrame:
    """Synthetic event stream shaped like the `events` table — the in-engine
    stand-in for the reference's external crawl feeds (S5/S6) so streaming
    logic is testable without network access."""
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .option("numPartitions", str(partitions))
        .load()
    )
    return raw.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 97).alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase"), F.lit("signup"), F.lit("error")),
            (F.col("value") % 5 + 1).cast("int"),
        ).alias("event_type"),
        (F.col("value") % 1000 / F.lit(10.0)).alias("value"),
    )
