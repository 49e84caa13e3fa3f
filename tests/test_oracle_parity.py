"""Every catalog query with an oracle must hash-match DuckDB — the local
replica of the driver's t2 correctness gate.

Parity runs at the DRIVER'S scale factor (sf0.01) by default, not the
conftest sf0.001 the rest of the suite uses: row-count-sensitive shapes
(top-k ties, percentile interpolation, LSH candidate sets) can pass at one
scale and diverge at another, so local green must be measured where the
driver measures. Override with PK_TEST_SF_DIR as usual."""

from __future__ import annotations

import os

import pytest

from pandemic_knowledge_spark.plans import REGISTRY

from tests.oracle_harness import compare_query

PARITY_SF_DIR = os.environ.get("PK_TEST_SF_DIR", "/root/testdata/sf0.01")

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
NO_ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.fixture(scope="module")
def sf_dir():
    return PARITY_SF_DIR


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    spec = REGISTRY[name]
    # Driver-harness shape gate: the driver's canonicalizer pandas-sorts
    # result frames row-wise, which raises on array/map/struct columns
    # (round 3's only red row, text_hash_embeddings, failed EXACTLY this
    # way while local parity was green — lists compare fine in DuckDB).
    # Every hash-compared query must therefore emit scalar columns only.
    from pyspark.sql.types import AtomicType, NullType

    df = spec.fn(spark, sf_dir)
    non_scalar = [
        f.name
        for f in df.schema.fields
        if not isinstance(f.dataType, (AtomicType, NullType))
    ]
    assert not non_scalar, (
        f"{name}: non-scalar driver-facing columns {non_scalar} "
        "(the driver canonicalizer cannot sort them — emit a long/digest form)"
    )
    problems, n_rows = compare_query(spark, sf_dir, spec.fn, spec.oracle, sdf=df)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", NO_ORACLE_QUERIES)
def test_rows_only(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0 and len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
