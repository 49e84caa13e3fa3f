"""Incremental corpus ingest with near-dup rejection
(streaming/jobs.py::corpus_stream_ingest_dedup): first-accepted wins across
micro-batches via the persisted signature store; within a batch, clusters
collapse to their min-id representative; unsignable (too-short) docs pass
through. The second run resumes from the same checkpoint and must process
only the new drop."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from pandemic_knowledge_spark.streaming.jobs import corpus_stream_ingest_dedup

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
NEAR = "alpha beta gamma delta epsilon zeta eta theta iota lambda"  # ~0.8 jac
OTHER = "one two three four five six seven eight nine ten"
OTHER_NEAR = "one two three four five six seven eight nine eleven"


def _run(spark, landing, tmp_path):
    q = corpus_stream_ingest_dedup(
        spark,
        landing,
        SCHEMA,
        out_path=str(tmp_path / "corpus"),
        sig_store=str(tmp_path / "sigs"),
        checkpoint=str(tmp_path / "cp"),
        threshold=0.5,
    )
    q.awaitTermination(120)


def test_incremental_ingest_rejects_history_and_batch_dups(spark, tmp_path):
    landing = str(tmp_path / "landing")

    # Drop 1: doc 1 (BASE), doc 2 (OTHER) — both fresh, both accepted.
    spark.createDataFrame([(1, BASE), (2, OTHER)], SCHEMA).coalesce(1).write.parquet(
        landing
    )
    _run(spark, landing, tmp_path)
    first = {r.doc_id for r in spark.read.parquet(str(tmp_path / "corpus")).collect()}
    assert first == {1, 2}

    # Drop 2: doc 10 near-dups history doc 1 → rejected. Docs 20/21 are
    # fresh but near-dup EACH OTHER → the within-batch cluster collapses to
    # min id 20. Doc 30 is fresh and unique → accepted. Doc 40 is too short
    # to shingle → accepted as-is.
    twin = "red orange yellow green blue indigo violet pink brown black"
    spark.createDataFrame(
        [(10, NEAR), (20, twin), (21, twin),
         (30, "completely different words entirely novel content here now"),
         (40, "tiny")],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(landing)
    _run(spark, landing, tmp_path)

    corpus = spark.read.parquet(str(tmp_path / "corpus"))
    got = {r.doc_id for r in corpus.collect()}
    assert got == {1, 2, 20, 30, 40}

    # Signature store holds exactly the accepted SIGNED docs (40 unsigned).
    sigs = {r.doc_id for r in spark.read.parquet(str(tmp_path / "sigs")).collect()}
    assert sigs == {1, 2, 20, 30}

    # Re-running with no new files must be a no-op (checkpoint replay safety).
    _run(spark, landing, tmp_path)
    assert corpus.count() == spark.read.parquet(str(tmp_path / "corpus")).count()
