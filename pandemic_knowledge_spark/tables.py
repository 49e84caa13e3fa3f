"""Table loaders over the driver-generated parquet testdata.

Mirrors the reference's index-per-dataset model
(/root/reference/flow/scripts/mapping.py:1-29 — one ES index per source)
as one parquet-backed table per name, registered in the Spark catalog so
both the DataFrame API and spark.sql can address them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns stored as TIMESTAMP(NANOS) in the testdata parquet; Spark reads
# them as long (see session.py nanosAsLong) and we restore timestamp type
# by truncating nanos → micros (same truncation DuckDB's µs datetimes get).
NANO_TS_COLS = {"events": ("ts",)}

# Runtime-settable SQL confs the engine depends on, applied defensively so
# results are correct even on a caller-provided SparkSession (e.g. the
# driver's) that wasn't built by session.get_spark().
_REQUIRED_RUNTIME_CONF = {
    # events.ts is TIMESTAMP(NANOS) parquet — unreadable without this.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic timestamp semantics matching the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
}


def ensure_engine_conf(spark: SparkSession) -> None:
    for k, v in _REQUIRED_RUNTIME_CONF.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)


# Schema cache: (sf_dir, name) → StructType, filled from the FIRST read's
# footer inference and reused for every later read of the same path in this
# process. Metadata only — never rows, never plans, never results: every
# action still scans the parquet in full. Schema inference through
# spark.read.parquet measured ~0.1-0.2 s of driver-side listing+footer work
# PER CALL (r13, guide §5 driver work); an engine process resolving a
# table's schema once is exactly the catalog behavior a real deployment
# (metastore / ES mapping) gives for free.
_SCHEMA_CACHE: dict = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Plain parquet scan → full predicate pushdown,
    column pruning and (on partitioned layouts) partition pruning."""
    ensure_engine_conf(spark)
    path = f"{sf_dir}/{name}.parquet"
    schema = _SCHEMA_CACHE.get((sf_dir, name))
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[(sf_dir, name)] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    for col in NANO_TS_COLS.get(name, ()):
        dtype = dict(df.dtypes).get(col)
        if dtype == "bigint":
            # TIMESTAMP(NANOS) parquet read as long under nanosAsLong:
            # truncate to micros (same truncation DuckDB's µs datetimes get).
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
        elif dtype == "timestamp_ntz":
            # Micros-precision testdata reads natively as TIMESTAMP_NTZ.
            # Normalize to TimestampType: under the UTC session zone the
            # wall-clock values are identical (oracle parity unchanged), and
            # Structured Streaming's withWatermark only accepts event time
            # of TimestampType — NTZ event time is rejected outright.
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (the engine's catalog)."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
