"""JSONL corpus ingest with corrupt-line quarantine.

The reference's feeds are CSV, but a training-data engine's corpora arrive
overwhelmingly as JSON Lines (one document object per line — the common
crawl/dump interchange format). Spark-first: ``spark.read.json`` is the
distributed, schema-aware parse; the ingest policy wraps it with the same
never-silently-drop contract the CSV path has (F3/F4 isolation,
conform.parse_date_total's W4 quarantine):

- PERMISSIVE parse: a malformed line lands in ``_corrupt_record`` instead of
  killing the scan (the executor-side analogue of the reference's per-file
  try/except, /root/reference/flow/scripts/parse_insert.py:170-178).
- ``read_jsonl`` returns (parsed, corrupt): every input line is in exactly
  one frame — corrupt rows carry the raw line for forensics/replay.
- Explicit schema when the caller has one (at 100 TB schema inference is a
  full extra pass over the corpus; with a schema the scan is single-pass and
  unparseable-but-well-formed-JSON fields conform to null).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    paths: str | list[str],
    schema: StructType | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read JSON Lines → (parsed, corrupt). Union of the two covers every
    input line; neither side is ever silently dropped.

    With an explicit ``schema`` the corrupt column is appended to it (Spark
    only populates ``_corrupt_record`` when it appears in the schema); with
    inference Spark adds the column on demand. Malformed lines have every
    data field null and the raw line in the corrupt column — the W4
    quarantine shape, ready for a dead-letter sink.
    """
    if isinstance(paths, str):
        paths = [paths]
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", CORRUPT_COL
    )
    if schema is not None:
        full = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
        )
        df = reader.schema(full).json(paths)
    else:
        df = reader.json(paths)
        if CORRUPT_COL not in df.columns:  # wholly clean corpus
            df = df.withColumn(CORRUPT_COL, F.lit(None).cast("string"))
    # Spark requires caching (or a prior materialization) before filtering a
    # raw-parse frame on the corrupt column alone — referencing only
    # _corrupt_record over the un-materialized scan is an AnalysisException
    # by design. cache() (NOT localCheckpoint) so blocks stay recomputable
    # from lineage after executor loss — checkpoint blocks are unreplicated
    # and their loss is fatal on preemptible clusters. The cache entry is
    # pinned until released: repeated ingest calls should invoke the
    # returned frames' shared `.unpersist` handle (attribute ``unpersist``
    # on the parsed frame's `_pk_source`) or let the job's session end.
    df = df.cache()
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    parsed = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    # expose the cached scan so callers can release it deterministically
    parsed._pk_source = df  # type: ignore[attr-defined]
    corrupt._pk_source = df  # type: ignore[attr-defined]
    return parsed, corrupt
