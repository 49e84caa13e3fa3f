"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors the contract in /root/repo/__spark_entry__.py: run the Spark query
and the oracle SQL on the same parquet tables, sort columns by name, and
compare row multisets exactly (floats must be bit-identical — the engine's
determinism contract, see plans/catalog.py docstring).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math

import duckdb

from pandemic_knowledge_spark.tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, _decimal.Decimal):
        # Keep Decimal DISTINGUISHABLE from int: Python's cross-type
        # equality (Decimal(5) == 5) would re-mask exactly the
        # HUGEINT-vs-BIGINT oracle type bug the arrow fetch exists to
        # surface — tag it so an int column never equals a decimal one.
        return ("decimal", str(v))
    return v


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def compare_query(spark, sf_dir: str, fn, oracle: str, sdf=None):
    """``sdf`` lets the caller pass an ALREADY-BUILT Spark frame for fn —
    r4 queries run eager localCheckpoint jobs at build time, so building
    twice (schema gate + compare) would execute their whole pipeline
    twice."""
    if sdf is None:
        sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    # Fetch via arrow, not fetchall(): the driver's compare goes through an
    # arrow path, where DuckDB's HUGEINT (e.g. sum(BIGINT)) surfaces as
    # decimal128 instead of a Python int. fetchall() silently converts
    # HUGEINT -> int and masks exactly that class of oracle type bug.
    tbl = con.execute(oracle).arrow()
    d_cols = list(tbl.schema.names)
    cols_pylist = [tbl.column(c).to_pylist() for c in d_cols]
    d_rows = list(zip(*cols_pylist)) if d_cols else []
    con.close()

    s_cols_sorted, s_set = rowset(s_cols, s_rows)
    d_cols_sorted, d_set = rowset(d_cols, d_rows)

    problems = []
    if s_cols_sorted != d_cols_sorted:
        problems.append(f"columns differ: spark={s_cols_sorted} duckdb={d_cols_sorted}")
    if len(s_set) != len(d_set):
        problems.append(f"row counts differ: spark={len(s_set)} duckdb={len(d_set)}")
    if not problems and s_set != d_set:
        diffs = [
            (a, b) for a, b in zip(s_set, d_set) if a != b
        ][:5]
        problems.append(f"values differ; first diffs (spark, duckdb): {diffs}")
    return problems, len(s_set)
