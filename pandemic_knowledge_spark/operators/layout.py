"""Z-order data layout: multi-dimensional clustering for scan pruning.

The reference's answer to "query a box over (place, time)" is an
Elasticsearch index per dimension (/root/reference/flow/scripts/mapping.py
geo_point + date fields). The lakehouse-native answer is LAYOUT: interleave
the bits of the filter dimensions into one z-value, range-partition and sort
the files by it, and let parquet row-group min/max statistics prune multi-
dimensional boxes from a plain columnar scan — no secondary index to build,
store, or keep consistent.

Why it matters at 100 TB: a table sorted by one dimension prunes only that
dimension; a predicate on any other column reads everything. Z-ordering
makes every participating dimension's values *locally clustered* in every
file, so a box predicate on ANY subset of the z-columns skips most files on
footer statistics alone. The write is one repartitionByRange shuffle (range
bounds from a driver-side sample — Spark's own range partitioner) plus a
per-partition sort: exactly the cost of a normal sorted write.

Everything is static JVM column expressions (shift/mask/or) — no UDFs; the
z-value computation rides whole-stage codegen on the write path and is
dropped before the files land.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # quantization bits per dimension; 2 dims -> 32-bit z-value


def _quantize(c: Column, cmin: float, cmax: float, bits: int) -> Column:
    """Linear rank-quantize a numeric column into [0, 2^bits - 1]."""
    span = max(cmax - cmin, 1e-300)
    scaled = (c.cast("double") - F.lit(float(cmin))) / F.lit(span)
    top = (1 << bits) - 1
    q = F.floor(scaled * top + F.lit(0.5)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(top), q))


def zvalue(quantized: list[Column], bits: int = Z_BITS) -> Column:
    """Bit-interleave quantized dimensions into one Morton (z-curve) value.

    Bit b of dimension j lands at position b * ndims + j, so consecutive
    z-values alternate dimensions — the classic space-filling interleave.
    Static expression tree (bits × ndims shift/mask/or terms), fully inside
    whole-stage codegen."""
    n = len(quantized)
    if n * bits > 63:
        raise ValueError(
            f"z-value needs {n * bits} bits (> 63): the top interleaved bit "
            f"would land in the int64 sign bit and invert the sort order — "
            f"reduce bits per dimension (e.g. bits={63 // n})"
        )
    terms = [
        F.shiftleft(F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + j)
        for j, q in enumerate(quantized)
        for b in range(bits)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def zorder_frame(
    df: DataFrame, cols: list[str], bits: int = Z_BITS, z_col: str = "_z"
) -> DataFrame:
    """Attach the z-value column for ``cols`` (numeric/date/timestamp).

    Dimension min/max come from ONE aggregate over the frame (a single
    map-side-combined pass; the driver receives one row — same footprint as
    Spark's own range-partitioner sampling). Dates/timestamps quantize via
    their epoch numeric."""
    numeric = {}
    for c in cols:
        dtype = dict(df.dtypes)[c]
        if dtype in ("timestamp", "timestamp_ntz"):
            # unix_micros rejects NTZ; under the engine's UTC session the
            # cast is a no-op on the wall-clock value.
            numeric[c] = F.unix_micros(F.col(c).cast("timestamp"))
        elif dtype == "date":
            numeric[c] = F.datediff(F.col(c), F.lit("1970-01-01").cast("date"))
        else:
            numeric[c] = F.col(c)
    bounds = df.agg(
        *[F.min(e).cast("double").alias(f"min_{c}") for c, e in numeric.items()],
        *[F.max(e).cast("double").alias(f"max_{c}") for c, e in numeric.items()],
    ).first()
    if any(bounds[f"min_{c}"] is None for c in numeric):
        # empty frame or an all-NULL dimension: no meaningful curve —
        # degrade to a constant z (write proceeds, ordering is a no-op)
        # instead of a TypeError from None arithmetic.
        return df.withColumn(z_col, F.lit(0).cast("long"))
    quantized = [
        _quantize(e, bounds[f"min_{c}"], bounds[f"max_{c}"], bits)
        for c, e in numeric.items()
    ]
    return df.withColumn(z_col, zvalue(quantized, bits))


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 16,
    bits: int = Z_BITS,
) -> None:
    """Write ``df`` as parquet laid out along the z-curve of ``cols``.

    repartitionByRange on the z-value gives each output file a disjoint
    z-range; sortWithinPartitions clusters row groups inside each file, so
    parquet footer min/max on every participating dimension becomes tight.
    The helper z-column is dropped before landing (projection after the
    sort is narrow — per-partition order is preserved)."""
    zdf = zorder_frame(df, cols, bits)
    (
        zdf.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
