"""Every catalog query with an oracle must hash-match DuckDB — the local
replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from pandemic_knowledge_spark.plans import REGISTRY

from tests.oracle_harness import compare_query

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
NO_ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    spec = REGISTRY[name]
    problems, n_rows = compare_query(spark, sf_dir, spec.fn, spec.oracle)
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
