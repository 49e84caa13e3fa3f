"""P5 — ISO-3166 alpha-2 → alpha-3 as a broadcastable static dimension.

The reference calls ``countries.get(iso2).alpha3`` per row
(/root/reference/flow/scripts/parse_insert.py:94-96) — a Python library
probe in the hot loop. Spark-first: a literal in-memory dimension joined by
broadcast; per-row library calls never appear in a plan. Codes below are
standard public ISO 3166-1 data (plus the EU-convention aliases EL→GRC and
UK→GBR that EU CDC feeds use, which is exactly the data parse_insert reads);
extend the tuple to widen coverage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ISO2_TO_ISO3: tuple[tuple[str, str], ...] = (
    ("AT", "AUT"), ("BE", "BEL"), ("BG", "BGR"), ("HR", "HRV"), ("CY", "CYP"),
    ("CZ", "CZE"), ("DK", "DNK"), ("EE", "EST"), ("FI", "FIN"), ("FR", "FRA"),
    ("DE", "DEU"), ("GR", "GRC"), ("EL", "GRC"), ("HU", "HUN"), ("IE", "IRL"),
    ("IT", "ITA"), ("LV", "LVA"), ("LT", "LTU"), ("LU", "LUX"), ("MT", "MLT"),
    ("NL", "NLD"), ("PL", "POL"), ("PT", "PRT"), ("RO", "ROU"), ("SK", "SVK"),
    ("SI", "SVN"), ("ES", "ESP"), ("SE", "SWE"), ("GB", "GBR"), ("UK", "GBR"),
    ("US", "USA"), ("CA", "CAN"), ("AU", "AUS"), ("NZ", "NZL"), ("JP", "JPN"),
    ("CN", "CHN"), ("IN", "IND"), ("BR", "BRA"), ("MX", "MEX"), ("RU", "RUS"),
    ("CH", "CHE"), ("NO", "NOR"), ("IS", "ISL"), ("TR", "TUR"), ("ZA", "ZAF"),
    ("KR", "KOR"), ("AR", "ARG"), ("CL", "CHL"), ("CO", "COL"), ("PE", "PER"),
    ("EG", "EGY"), ("NG", "NGA"), ("KE", "KEN"), ("MA", "MAR"), ("SA", "SAU"),
    ("AE", "ARE"), ("IL", "ISR"), ("TH", "THA"), ("VN", "VNM"), ("ID", "IDN"),
    ("MY", "MYS"), ("SG", "SGP"), ("PH", "PHL"), ("PK", "PAK"), ("BD", "BGD"),
    ("UA", "UKR"),
)


def iso_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(list(ISO2_TO_ISO3), ["iso_code2", "iso_code3"])


def with_iso3(df: DataFrame, iso2_col: str = "iso_code2") -> DataFrame:
    """Left broadcast join adding ``iso_code3`` (unknown codes → null, like
    the reference's silent KeyError-guarded probe). The caller's columns
    are untouched: a custom ``iso2_col`` joins through the dim's key
    without renaming (a rename could collide with an existing iso_code2
    column → AMBIGUOUS_REFERENCE on the next join)."""
    dim = iso_dim(df.sparkSession)
    if iso2_col == "iso_code2":
        return df.join(F.broadcast(dim), "iso_code2", "left")
    return df.join(
        F.broadcast(dim), df[iso2_col] == dim["iso_code2"], "left"
    ).drop(dim["iso_code2"])
