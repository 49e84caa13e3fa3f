"""Distributed exact rank / ntile — global order statistics without a
global window.

``Window.orderBy(...)`` with no partition spec funnels every row through
ONE task (Exchange SinglePartition): correct, deterministic, and a
straight scale-killer on fact- or customer-sized inputs — the round-3
verdict named the engine's three remaining uses (RFM's three quintile
windows, CCNet's tertile split) as its worst 100 TB liabilities.

This module computes the IDENTICAL ntile labeling with the classic
two-phase distributed rank:

1. Bucket every row by a coarse, ORDER-MONOTONE key (decimal leading
   digits by default — the same grid trick as the decimal-DDSketch in
   operators.sketches, ≤ ~1k buckets per order of magnitude).
2. Count rows per bucket (one map-side-combined aggregate on a
   bucket-count-sized table) and turn the counts into cumulative START
   OFFSETS in the requested order. The bucket-count table is sketch-sized,
   so its cumulative walk is trivially cheap and the offsets BROADCAST.
3. Window ``row_number`` PARTITIONED BY bucket (parallel — every bucket
   sorts independently), ordered by (value, tiebreak); global rank =
   bucket offset + local row number.
4. tile = the standard SQL NTILE formula on (rank, n): with n rows and b
   tiles, the first ``n mod b`` tiles hold ``n div b + 1`` rows.

Because the bucket key is monotone in the value and the within-bucket sort
carries the full (value, tiebreak) total order, the computed rank equals
the rank of the single-task window EXACTLY — ties on the value share a
bucket by construction and are split by the tiebreak, so DuckDB's plain
``ntile() OVER (ORDER BY ...)`` stays the oracle unchanged. Skew bound:
one task per coarse bucket, i.e. per ~0.1% slice of the value
distribution (plus all exact ties of a single value — an irreducible unit
for any order-preserving partitioning).

The input is materialized once (``localCheckpoint``) because both phases
consume it — without that, each ntile column would recompute its whole
upstream plan three times (and chained calls would compound
exponentially).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def decimal_bucket(v: Column) -> Column:
    """Order-monotone coarse bucket for integer columns: sign ×
    (digit_count·1000 + leading 3 digits); 0 for zero; NULL stays NULL
    (partitioned_ntile maps it to the null sentinel bucket). ≤ ~900
    buckets per order of magnitude, relative bucket width ≤ 1% above 3
    digits.

    The input is cast to long INSIDE the bucket expression: the
    digit-count monotonicity proof runs over the decimal string render,
    and a double/decimal column rendered to scientific notation
    ('1.0E7') would silently misrank instead of erroring. Fractional
    inputs are therefore truncated toward zero — callers needing
    fractional ranks should pre-scale to fixed-point integers first
    (the catalog's cents/micro-unit convention)."""
    a = F.abs(v.cast("long"))
    s = a.cast("string")
    mag = F.length(s) * 1000 + F.substring(s, 1, 3).cast("long")
    return (
        F.when(v == 0, F.lit(0).cast("long"))
        .when(v > 0, mag)
        .otherwise(-mag)
    )


# NULL values sort FIRST ascending and LAST descending under Spark's
# default ordering — i.e. NULL behaves as the smallest value in both
# directions, so one below-everything sentinel bucket reproduces it. A
# custom ``bucket`` expression must never legitimately produce this value.
_NULL_BUCKET = -(1 << 62)


def partitioned_ntile(
    df: DataFrame,
    n_buckets: int,
    value_col: str,
    tiebreak_col: str,
    out_col: str,
    ascending: bool = True,
    bucket: Column | None = None,
    materialize: bool = True,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Add ``out_col`` = NTILE(n_buckets) OVER ([PARTITION BY group_cols]
    ORDER BY value [DESC], tiebreak) — bit-identical to the plain window,
    computed with a partitioned one (see module docstring).

    ``bucket`` overrides the coarse key (must be order-monotone in the
    value; identity is ideal for small-range integers). ``materialize``
    localCheckpoints the input first — pass False only when the caller
    already materialized it.

    ``group_cols`` computes the ntile WITHIN each group. This is the tool
    for FEW, HUGE groups (where a plain PARTITION BY group window would
    funnel a fact-sized slice through one task — e.g. 5 order priorities at
    100 TB); the offsets table grows as |groups| × |buckets| and must stay
    broadcastable, so for high-cardinality groups use the ordinary grouped
    window instead (it is already parallel there).
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    b = bucket if bucket is not None else decimal_bucket(F.col(value_col))
    # NULL values (or a NULL from a custom bucket expression) land in the
    # dedicated sentinel bucket instead of silently dropping at the
    # non-null-safe bucket equi-join — ntile ranks NULL rows too.
    b = F.coalesce(b, F.lit(_NULL_BUCKET))
    if materialize:
        df = df.localCheckpoint(eager=True)
    gcols = list(group_cols)
    df2 = df.withColumn("__pk_nt_b", b)
    bcounts = df2.groupBy(*gcols, "__pk_nt_b").agg(
        F.count(F.lit(1)).alias("__pk_nt_c")
    )
    border = F.col("__pk_nt_b").asc() if ascending else F.col("__pk_nt_b").desc()
    # cumulative walk over the SKETCH-SIZED bucket-count table (each
    # partition here holds ≤ a few thousand rows by construction — never
    # the input).
    ow = (
        Window.partitionBy(*gcols).orderBy(border)
        if gcols
        else Window.orderBy(border)
    ).rowsBetween(Window.unboundedPreceding, -1)
    offsets = bcounts.select(
        *gcols,
        "__pk_nt_b",
        F.coalesce(F.sum("__pk_nt_c").over(ow), F.lit(0)).alias("__pk_nt_off"),
    )
    if gcols:
        total = bcounts.groupBy(*gcols).agg(
            F.sum("__pk_nt_c").alias("__pk_nt_n")
        )
    else:
        total = bcounts.agg(F.sum("__pk_nt_c").alias("__pk_nt_n"))
    vorder = F.col(value_col).asc() if ascending else F.col(value_col).desc()
    lw = Window.partitionBy(*gcols, "__pk_nt_b").orderBy(
        vorder, F.col(tiebreak_col).asc()
    )
    if gcols:
        # group joins must be NULL-SAFE: ntile's PARTITION BY treats a NULL
        # group as a real partition, and a plain equi-join would silently
        # drop its rows.
        boff = offsets.select(
            F.col("__pk_nt_b").alias("__pk_nt_bo"),
            "__pk_nt_off",
            *[F.col(c).alias(f"__pk_nt_go{i}") for i, c in enumerate(gcols)],
        )
        cond = F.col("__pk_nt_b") == F.col("__pk_nt_bo")
        for i, c in enumerate(gcols):
            cond = cond & F.col(c).eqNullSafe(F.col(f"__pk_nt_go{i}"))
        joined = df2.join(F.broadcast(boff), cond).drop(
            "__pk_nt_bo", *[f"__pk_nt_go{i}" for i in range(len(gcols))]
        )
        btot = total.select(
            "__pk_nt_n",
            *[F.col(c).alias(f"__pk_nt_gt{i}") for i, c in enumerate(gcols)],
        )
        tcond = F.lit(True)
        for i, c in enumerate(gcols):
            tcond = tcond & F.col(c).eqNullSafe(F.col(f"__pk_nt_gt{i}"))
        joined = joined.join(F.broadcast(btot), tcond).drop(
            *[f"__pk_nt_gt{i}" for i in range(len(gcols))]
        )
    else:
        joined = df2.join(F.broadcast(offsets), ["__pk_nt_b"]).crossJoin(
            F.broadcast(total)
        )
    ranked = joined.withColumn(
        "__pk_nt_rk", F.col("__pk_nt_off") + F.row_number().over(lw)
    )
    # Standard SQL NTILE from the global rank: q = n div b, rem = n mod b;
    # the first rem tiles hold q+1 rows. greatest(q, 1) guards the ANSI
    # divide when n < b (rem = n, so the first branch already covers every
    # row and the divisor is never used — but ANSI evaluates eagerly-typed
    # branches per-row only inside when(), keep the guard anyway).
    tile = (
        F.when(
            F.col("__pk_nt_rk")
            <= F.col("__pk_nt_rem") * (F.col("__pk_nt_q") + F.lit(1)),
            F.expr("(__pk_nt_rk - 1) div (__pk_nt_q + 1) + 1"),
        )
        .otherwise(
            F.expr(
                "__pk_nt_rem + (__pk_nt_rk - __pk_nt_rem * (__pk_nt_q + 1) - 1)"
                " div greatest(__pk_nt_q, 1) + 1"
            )
        )
        .cast("int")
    )
    return (
        ranked.withColumn("__pk_nt_q", F.expr(f"__pk_nt_n div {n_buckets}"))
        .withColumn("__pk_nt_rem", (F.col("__pk_nt_n") % n_buckets).cast("long"))
        .withColumn(out_col, tile)
        .drop(
            "__pk_nt_b",
            "__pk_nt_c",
            "__pk_nt_off",
            "__pk_nt_n",
            "__pk_nt_rk",
            "__pk_nt_q",
            "__pk_nt_rem",
        )
    )
