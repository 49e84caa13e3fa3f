"""S4/J2 — the location lookup dimension as a broadcastable DataFrame.

The reference loads UID_ISO_FIPS_LookUp_Table.csv (4,194 rows) into a dict
keyed by THREE alternate keys — Province_State, Country_Region, Combined_Key
— first-wins (/root/reference/flow/scripts/insert_owid.py:255-277). Spark
form: unpivot the three key columns into (location_name, geo, iso2[,
population]) rows, keep the first occurrence deterministically, and
broadcast-join facts against it (J1/J2). At 100 TB of facts this dim is
still 4k rows — always a broadcast, never a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

KEY_COLUMNS = ("Province_State", "Country_Region", "Combined_Key")


def build_location_dim(
    spark: SparkSession,
    csv_path: str,
    extra_aliases: dict[str, str] | None = None,
) -> DataFrame:
    """location_name → (geo struct, iso2, population), first-wins.

    ``extra_aliases`` mirrors the reference's hand alias table
    (extra_locations, insert_owid.py:46: Greece→EL): alias rows are cloned
    from their target so both names resolve.
    """
    raw = spark.read.csv(csv_path, header=True).withColumn(
        "_file_order", F.monotonically_increasing_id()
    )
    melted = None
    for priority, key in enumerate(KEY_COLUMNS):
        part = raw.select(
            F.nullif(F.trim(F.col(key)), F.lit("")).alias("location_name"),
            F.struct(
                F.col("Lat").cast("double").alias("lat"),
                F.col("Long_").cast("double").alias("lon"),
            ).alias("geo"),
            F.col("iso2").alias("iso_code2"),
            F.col("Population").cast("long").alias("population"),
            F.lit(priority).alias("_prio"),
            F.col("_file_order"),
        ).filter(F.col("location_name").isNotNull())
        melted = part if melted is None else melted.unionByName(part)

    # First-wins = reference's `if key not in lookup_table` insertion order:
    # earlier file rows win, and for one row the more specific key wins.
    w = Window.partitionBy("location_name").orderBy("_file_order", "_prio")
    dim = (
        melted.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prio", "_file_order")
    )

    if extra_aliases:
        # alias → existing target name (e.g. "Greece" rows also answer "EL").
        alias_rows = None
        for alias, target in extra_aliases.items():
            cloned = dim.filter(F.col("location_name") == target).withColumn(
                "location_name", F.lit(alias)
            )
            alias_rows = cloned if alias_rows is None else alias_rows.unionByName(cloned)
        if alias_rows is not None:
            # Existing names DETERMINISTICALLY win over alias clones: a
            # union + dropDuplicates picks a partition-order-dependent
            # survivor when the CSV already contains a row named like an
            # alias (the first-wins contract would flap across layouts).
            alias_rows = alias_rows.join(
                dim.select("location_name"), "location_name", "left_anti"
            )
            dim = dim.unionByName(alias_rows)
    return dim


def enrich_with_locations(
    facts: DataFrame, dim: DataFrame, on: str = "location_name"
) -> DataFrame:
    """J1 — left broadcast hash join facts → (geo, iso_code2, population)."""
    return facts.join(F.broadcast(dim), on=on, how="left")


def unmatched_locations(facts: DataFrame, dim: DataFrame, on: str = "location_name") -> DataFrame:
    """J3's miss-detection half: distinct fact keys absent from the dim
    (left_anti), the set the reference geocodes then caches
    (insert_owid.py:75-97). Enrichment of these is an offline dimension
    update, never an in-plan side effect."""
    return (
        facts.select(on).distinct().join(F.broadcast(dim), on=on, how="left_anti")
    )


def enrich_dimension(
    spark,
    dim: DataFrame,
    facts: DataFrame,
    geocode_fn,
    on: str = "location_name",
) -> DataFrame:
    """J3 complete: distinct misses → batched external enrich → dim union.

    The reference geocodes each unknown location inline per row and caches
    in-process (insert_owid.py:75-97) — a remote call inside the hot loop.
    Here the loop inverts: ONE left_anti finds the distinct misses (at any
    fact scale that's a tiny set — bounded by the world's location names),
    ``geocode_fn`` resolves them in a single driver-side batch (the external
    side effect stays out of every query plan), and the resolved rows union
    into the dimension for the next run — the reference's cache, made
    durable and cluster-wide.

    ``geocode_fn: list[str] -> dict[name, (lat, lon, iso2)]`` — names it
    cannot resolve are simply omitted (stay unmatched, like the reference's
    logged-and-dropped geo misses insert_owid.py:97-100).
    """
    miss_names = [r[on] for r in unmatched_locations(facts, dim, on).collect()]
    if not miss_names:
        return dim
    resolved = geocode_fn(sorted(miss_names))
    if not resolved:
        return dim
    rows = [
        (name, {"lat": lat, "lon": lon}, iso2, None)
        for name, (lat, lon, iso2) in sorted(resolved.items())
    ]
    new = spark.createDataFrame(
        rows, schema=dim.select(on, "geo", "iso_code2", "population").schema
    )
    return dim.unionByName(new, allowMissingColumns=True)
