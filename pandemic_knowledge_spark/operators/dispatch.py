"""Shared size-gate for exact-vs-scale-tier auto-dispatch.

Three operator families (MinHash LSH, exact substring dedup, Pearson pair
correlation) pick between an exact small-corpus form and a pruned/
skew-safe scale form. The gate is the optimized plan's ``sizeInBytes`` —
file-size metadata, no job, no scan (a sizing count() measured ~0.2 s per
call on the bench, pure overhead for small corpora).

Caveat (applies to every caller): the estimate is Long.MaxValue for
LocalRelation inputs (``createDataFrame`` frames), so in-memory frames
always take the scale path — pass parquet-backed input (or the operator's
explicit ``scale=``/``skew_safe=`` override) when the dispatch choice
matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def size_gated(df: DataFrame, conf_key: str, default_bytes: int) -> bool:
    """True when ``df``'s Catalyst size estimate reaches the threshold in
    session conf ``conf_key`` (falling back to ``default_bytes``) — i.e.
    the caller should take its scale tier."""
    thresh = int(df.sparkSession.conf.get(conf_key, str(default_bytes)))
    est = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    return est >= thresh
