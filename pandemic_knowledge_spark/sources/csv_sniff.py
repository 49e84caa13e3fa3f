"""S3 — CSV reader with per-file dialect sniffing.

The reference sniffs each file's delimiter/quote on the first 10–100 kB with
clevercsv before streaming rows (/root/reference/flow/scripts/
insert_owid.py:163-169, parse_insert.py:152-162) because its French sources
are semicolon-delimited while OWID is comma-delimited. Spark-first: the
sniff stays a cheap driver-side prefix read (same as the reference), the
*parse* is the distributed, vectorized ``spark.read.csv`` with explicit
``sep``/``quote`` options — so the hot path never touches Python. Files are
grouped by sniffed dialect so N files become at most a handful of scans,
each a single multi-path read that preserves parallelism and pushdown.
"""

from __future__ import annotations

import csv
from collections import defaultdict
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DELIMITERS = ",;\t|"


def sniff_dialect(path: str, sample_bytes: int = 10_240) -> dict[str, str]:
    """Sniff (sep, quote) from a file prefix — the reference's 10 kB default
    (insert_owid.py:163). Falls back to comma/double-quote like csv.excel."""
    with open(path, newline="", encoding="utf-8", errors="replace") as f:
        sample = f.read(sample_bytes)
    try:
        d = csv.Sniffer().sniff(sample, delimiters=_DELIMITERS)
        return {"sep": d.delimiter, "quote": d.quotechar}
    except csv.Error:
        # Heuristic fallback: most frequent candidate delimiter in the header.
        header = sample.splitlines()[0] if sample else ""
        best = max(_DELIMITERS, key=header.count)
        return {"sep": best if header.count(best) else ",", "quote": '"'}


def read_csv_sniffed(
    spark: SparkSession,
    paths: Sequence[str],
    sample_bytes: int = 10_240,
    infer_schema: bool = False,
    **options: str,
) -> DataFrame:
    """Read many CSVs whose dialects may differ, as one DataFrame.

    Sniffs each file on the driver, buckets files by (sep, quote), issues one
    distributed scan per bucket, and unions by name with missing columns
    allowed — the Spark shape of the reference's per-file generator loop
    (insert_owid.py:217-228). Provenance is preserved via
    ``_source_file`` (P12, F.input_file_name).
    """
    buckets: dict[tuple[str, str], list[str]] = defaultdict(list)
    for p in paths:
        d = sniff_dialect(p, sample_bytes)
        buckets[(d["sep"], d["quote"])].append(p)

    out: DataFrame | None = None
    for (sep, quote), bucket_paths in sorted(buckets.items()):
        df = (
            spark.read.options(**options)
            .csv(
                list(bucket_paths),
                sep=sep,
                quote=quote,
                header=True,
                inferSchema=infer_schema,
            )
            .withColumn("_source_file", F.input_file_name())
        )
        out = df if out is None else out.unionByName(df, allowMissingColumns=True)
    if out is None:
        raise ValueError("read_csv_sniffed: empty path list")
    return out
