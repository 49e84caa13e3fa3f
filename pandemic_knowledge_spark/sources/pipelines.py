"""The reference's ingest flows as declarative Spark pipelines.

Each pipeline is scan → conform (P/F ops from conform.ops) → broadcast
enrich (J1) → conformed fact frame, i.e. the whole batch shape of
/root/reference/flow/scripts/insert_owid.py and parse_insert.py as ONE
Catalyst plan: pushdown, pruning and codegen apply end-to-end, and the same
frame can be written via sinks (K1–K3) or streamed (W1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandemic_knowledge_spark.conform.ops import (
    coalesce_candidates,
    numeric_coerce,
    parse_date_multi,
    ratio_guarded,
    require_fields,
    with_uuid,
)
from pandemic_knowledge_spark.sources.csv_sniff import read_csv_sniffed, sniff_dialect
from pandemic_knowledge_spark.sources.lookup import enrich_with_locations
from pandemic_knowledge_spark.sources.resolve import require_resolvable

# columns_allowed of the OWID flow (insert_owid.py:35-44).
OWID_COLUMNS: dict[str, list[str]] = {
    "date": ["date"],
    "location_name": ["location"],
    "confirmed": ["new_cases"],
    "deaths": ["new_deaths"],
    "vaccinated": ["new_vaccinations"],
    "tested": ["new_tests"],
}
OWID_REQUIRED = ("date", "location_name", "confirmed")  # insert_owid.py:131

# Multi-source candidates of parse_insert (parse_insert.py:29-34).
PARSE_INSERT_COLUMNS: dict[str, list[str]] = {
    "date": ["YearWeekISO", "dateRep", "date"],
    "location_name": ["ReportingCountry", "location", "countriesAndTerritories"],
    "cases": ["NumberDosesReceived", "new_vaccinations", "cases", "new_cases"],
}
PARSE_INSERT_REQUIRED = ("date", "location_name", "cases")


def _validated_headers(
    spark: SparkSession,
    paths: Sequence[str],
    mapping: dict[str, list[str]],
    required: Sequence[str],
) -> list[str]:
    """F3 per file, driver-side: header row only (limit 0 schema probe).

    Validate-then-return: the FIRST malformed file raises (callers and
    tests pin fail-fast ingest); a filtered 'good' list would be dead code
    since nothing survives past a raise. Per-file catch-and-skip is the
    resolve module's job (sources.resolve isolates per-file errors when a
    pipeline opts into salvage)."""
    for p in paths:
        cols = spark.read.csv(p, header=True, **sniff_dialect(p)).columns
        require_resolvable(cols, mapping, required, path=p)
    return list(paths)


def conform_owid(
    raw: DataFrame,
    lookup_dim: DataFrame,
    drop_unlocated: bool = True,
) -> DataFrame:
    """The OWID conform stage (insert_owid.py:118-145) on an already-read
    frame — pure Column expressions, so the SAME function conforms the
    batch pipeline and the streaming job (one definition, two modes).

    P1 candidate coalesce → P2/P3 date parse → F1 required-field filter →
    P6 metric coercion → J1 broadcast geo enrich → K2 uuid ids. The
    reference drops rows whose location never resolves even via geocoder
    (insert_owid.py:97-100) — ``drop_unlocated`` keeps that semantics.
    """
    resolved = coalesce_candidates(raw, OWID_COLUMNS)
    dated = resolved.withColumn("_d", parse_date_multi("date"))
    conformed = (
        dated.select(
            F.col("_d.date_start").alias("date_start"),
            F.col("_d.date_end").alias("date_end"),
            F.col("location_name"),
            F.nullif(F.col("confirmed"), F.lit("")).alias("_confirmed_raw"),
            numeric_coerce("confirmed").alias("confirmed"),
            numeric_coerce("deaths").alias("deaths"),
            numeric_coerce("vaccinated").alias("vaccinated"),
            numeric_coerce("tested").alias("tested"),
            F.col("_source_file").alias("filename"),
        )
    )
    valid = require_fields(conformed, "date_start", "location_name", "_confirmed_raw").drop(
        "_confirmed_raw"
    )
    enriched = enrich_with_locations(valid, lookup_dim)
    if drop_unlocated:
        enriched = enriched.filter(F.col("iso_code2").isNotNull())
    return with_uuid(enriched.drop("population"))


def ingest_owid(
    spark: SparkSession,
    paths: Sequence[str],
    lookup_dim: DataFrame,
    drop_unlocated: bool = True,
) -> DataFrame:
    """Batch form of the flagship flow: sniffed multi-dialect read + conform."""
    return conform_owid(read_csv_sniffed(spark, list(paths)), lookup_dim, drop_unlocated)


def ingest_weekly_multisource(
    spark: SparkSession,
    paths: Sequence[str],
    lookup_dim: DataFrame,
    bucket: str = "vaccination",
) -> DataFrame:
    """parse_insert.py:105-137 as one plan: multi-candidate headers with
    whole-file rejection (F3), ISO-week spans (P3), conditional metric
    target (P8), population ratio (P7).
    """
    good = _validated_headers(spark, paths, PARSE_INSERT_COLUMNS, PARSE_INSERT_REQUIRED)
    raw = read_csv_sniffed(spark, good)
    resolved = coalesce_candidates(raw, PARSE_INSERT_COLUMNS)
    dated = resolved.withColumn("_d", parse_date_multi("date"))
    metric = numeric_coerce("cases")
    conformed = dated.select(
        F.col("_d.date_start").alias("date_start"),
        F.col("_d.date_end").alias("date_end"),
        F.col("location_name"),
        # P8 — the metric lands in `vaccinated` or `confirmed` by bucket.
        (metric if bucket == "vaccination" else F.lit(0)).alias("vaccinated"),
        (metric if bucket != "vaccination" else F.lit(0)).alias("confirmed"),
        F.col("_source_file").alias("filename"),
    )
    valid = require_fields(conformed, "date_start", "location_name")
    enriched = enrich_with_locations(valid, lookup_dim)
    measured = enriched.withColumn(
        "percentage",
        ratio_guarded(
            F.col("vaccinated") + F.col("confirmed"), F.col("population")
        ),
    ).withColumnRenamed("population", "max_population")
    return with_uuid(measured)
