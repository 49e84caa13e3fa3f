"""Named query catalog exposed through __spark_entry__ (SURVEY.md §2)."""

from pandemic_knowledge_spark.plans.catalog import (  # noqa: F401
    BENCH_QUERY_NAMES,
    REGISTRY,
    QuerySpec,
    oracle_sql,
    queries,
)
