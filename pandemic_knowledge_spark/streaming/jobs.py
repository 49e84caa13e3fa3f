"""End-to-end streaming jobs: the reference's scheduled flows recomposed as
Structured Streaming pipelines (SURVEY.md §3.1-3.2 lifecycle, Spark form).

Where the reference wires Prefect tasks (mapping → parse → bulk-index,
/root/reference/flow/scripts/insert_owid.py:285-290) on a 24h clock, each
job here is ONE declarative pipeline: landing-dir file stream → the exact
same conform expressions the batch path uses → checkpointed sink. The 24h
cadence is a trigger knob, not an orchestration system.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from pandemic_knowledge_spark.sources.crawlers import NEWS_SCHEMA
from pandemic_knowledge_spark.sources.pipelines import OWID_COLUMNS, conform_owid
from pandemic_knowledge_spark.streaming.sinks import append_parquet_sink
from pandemic_knowledge_spark.streaming.transforms import dedup_within_watermark

# Streaming sources need an explicit schema (no sniff/infer): the union of
# candidate headers, all strings — conform casts downstream, exactly like
# the reference's all-string CSV rows.
OWID_LANDING_SCHEMA = StructType(
    [StructField(h, StringType()) for cands in OWID_COLUMNS.values() for h in cands]
)


def owid_stream_ingest(
    spark: SparkSession,
    landing_dir: str,
    lookup_dim: DataFrame,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
    processing_time: str | None = None,
    max_files_per_trigger: int | None = None,
):
    """W1 — continuous form of the flagship OWID flow.

    Every CSV dropped into ``landing_dir`` is conformed by the SAME
    ``conform_owid`` expressions as the batch pipeline and appended to the
    conformed parquet table with checkpointed exactly-once file commits.
    ``processing_time="24 hours"`` reproduces the reference's cadence
    (insert_owid.py:282-284); ``available_now`` drains the backlog once.
    """
    reader = (
        spark.readStream.schema(OWID_LANDING_SCHEMA)
        .option("header", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.csv(landing_dir).withColumn("_source_file", F.input_file_name())
    # Stream-static joins reject batch-only expressions anywhere in the
    # static side's lineage (build_location_dim's monotonically_increasing_id
    # ordering). localCheckpoint materializes the 4k-row dim once and cuts
    # the lineage, which is also the right cost model: the dim is computed
    # once per job, not once per micro-batch.
    conformed = conform_owid(raw, lookup_dim.localCheckpoint(eager=True))
    writer = (
        conformed.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def news_stream_ingest(
    spark: SparkSession,
    landing_dir: str,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """W2 — continuous news feed with the re-crawl duplicate bug fixed.

    Crawler drops land as parquet in ``landing_dir`` (the adapter's output
    shape, sources.crawlers.NEWS_SCHEMA); the stream dedups on source.url
    within a 2-day watermark — overlapping 24h lookback crawls
    (crawl_tweets.py:60) insert each story exactly once.
    """
    raw = spark.readStream.schema(NEWS_SCHEMA).parquet(landing_dir)
    keyed = raw.withColumn("url", F.col("source.url"))
    deduped = dedup_within_watermark(keyed, ["url"], ts_col="date", watermark="2 days")
    writer = (
        deduped.drop("url")
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
