"""Set operations (SURVEY.md §2.8).

The reference unions like-named ES indices through index patterns
(`news_*` /root/reference/news_app/app/app/src/SearchUI.js:6,
`contamination_*` /root/reference/README.md:163) where two doc shapes
unify under one mapping. Spark-first: unionByName with missing-column
fill — a pure metadata operation, no shuffle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_indices(*dfs: DataFrame) -> DataFrame:
    """Index-pattern union: align by column name, null-fill missing columns."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
