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
from urllib.parse import urlsplit

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DELIMITERS = ",;\t|"

#: URI schemes whose prefix read goes through the local filesystem directly.
_LOCAL_SCHEMES = ("", "file")


def read_prefix(
    path: str, n_bytes: int, spark: SparkSession | None = None
) -> str:
    """First ``n_bytes`` of ``path``, scheme-aware.

    Bare paths and ``file://`` URIs read via the local filesystem; any other
    scheme (``s3a://`` object stores — the reference's MinIO bucket listing,
    insert_owid.py:203-214 — ``hdfs://``, ...) goes through the Hadoop
    FileSystem API of the active Spark session, so whatever store the
    session is configured for (see session._with_s3a_conf) works without a
    separate client library. The sniff stays a driver-side prefix read
    either way — the distributed scan is spark.read.csv."""
    scheme = urlsplit(path).scheme
    # Windows drive letters aside, a one-char scheme is a path, not a URI.
    if scheme.lower() in _LOCAL_SCHEMES or len(scheme) <= 1:
        # urlsplit handles every file-URI spelling — 'file:/p' (no
        # authority), 'file:///p', 'file://host/p' — where a fixed-length
        # 'file://' strip mangles the first and third forms.
        local = urlsplit(path).path if scheme.lower() == "file" else path
        with open(local, newline="", encoding="utf-8", errors="replace") as f:
            return f.read(n_bytes)
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise ValueError(
            f"read_prefix: scheme {scheme!r} needs an active SparkSession "
            "for the Hadoop FileSystem API"
        )
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(jvm_path)
    try:
        # One JVM call for the whole prefix (commons-io ships with Spark);
        # a per-byte py4j loop would cost one round-trip per byte.
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(
            stream, min(n_bytes, fs.getFileStatus(jvm_path).getLen())
        )
        return bytes(data).decode("utf-8", errors="replace")
    finally:
        stream.close()


def sniff_dialect(
    path: str, sample_bytes: int = 10_240, spark: SparkSession | None = None
) -> dict[str, str]:
    """Sniff (sep, quote) from a file prefix — the reference's 10 kB default
    (insert_owid.py:163). Falls back to comma/double-quote like csv.excel.
    Accepts bare paths, ``file://`` URIs, and any Hadoop-supported scheme
    (``s3a://``, ``hdfs://``)."""
    sample = read_prefix(path, sample_bytes, spark)
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
        d = sniff_dialect(p, sample_bytes, spark)
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
