"""Vector math over array<float|double> embedding columns — JVM-side only.

Dot products / norms / cosine via F.zip_with + F.aggregate: these run inside
codegen, no Python round-trip, so brute-force similarity scans stay
cluster-scalable (the per-row cost is a tight loop over the array).
All arithmetic is done in double after an explicit element cast so results
are bit-identical to the DuckDB oracle (which also computes in double).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right dot product (same accumulation order as SQL)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """NULL on a zero-norm side (empty/all-zero vectors): an unguarded
    division is a job-killing DIVIDE_BY_ZERO under ANSI mode — one dirty
    embedding row must not abort a corpus-wide similarity pass."""
    da, db = as_double(a), as_double(b)
    denom = norm(da) * norm(db)
    return F.when(denom != 0, dot(da, db) / denom)


def sql_dot(a_sql: str, b_sql: str) -> str:
    """DuckDB fragment computing the same sequential dot product."""
    return (
        f"list_sum(list_transform(list_zip({a_sql}, {b_sql}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )


def sql_cosine(a_sql: str, b_sql: str) -> str:
    d = sql_dot(a_sql, b_sql)
    na = f"sqrt({sql_dot(a_sql, a_sql)})"
    nb = f"sqrt({sql_dot(b_sql, b_sql)})"
    return (
        f"(CASE WHEN {na} * {nb} <> 0 THEN {d} / ({na} * {nb}) END)"
    )
