"""Sequence packing: assign documents to fixed-budget training bins.

A training-data pipeline ends by packing documents into fixed-size batches
(context windows / shard budgets). The reference has nothing like it (its
only batching is a 1,000-row ES bulk buffer, /root/reference/flow/scripts/
insert_owid.py:21) — this is a capability a 100 TB corpus engine needs.

Packing is inherently sequential (a bin's fill depends on every prior doc),
so it CANNOT be a window/cumsum — but it parallelizes perfectly across
hash buckets: bucket docs by a salted md5 of their id (same engine-portable
hash as operators.sampling), order by id within the bucket, and run next-fit
greedy per bucket. Consequences:

- The parallel unit is the bucket, not the Spark partition: results are
  bit-identical under any partitioning, any cluster size, any rerun.
- Scale by raising n_buckets (each bucket's work is O(rows in bucket));
  the only shuffle is the groupBy(bucket).
- The per-bucket loop is genuinely imperative Python — exactly the case
  SURVEY.md §2.12 reserves for Arrow-batched grouped applyInPandas. The
  DuckDB oracle replays the same loop declaratively with a recursive CTE.

Semantics (next-fit): docs in id order; a doc joins the current bin iff
fill + cost <= budget, else it OPENS a new bin (so an oversized doc gets a
bin of its own — nothing is dropped or split).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pandemic_knowledge_spark.functions.text import md5_int


def pack_bucket(key: Column, n_buckets: int, salt: str) -> Column:
    """Deterministic packing bucket in [0, n_buckets) for a row key."""
    return md5_int(F.concat(F.lit(salt + ":"), key.cast("string"))) % n_buckets


def pack_sequences(
    df: DataFrame,
    id_col: str,
    cost_col: str,
    budget: int,
    n_buckets: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """(id, cost) → (id, bucket, bin_in_bucket): next-fit greedy packing
    per hash bucket, in id order. Output is partitioning-invariant.

    The id keeps its original type (a blanket cast-to-long would turn
    non-numeric ids into nulls, silently corrupting bucket assignment and
    the in-bucket order the next-fit semantics depend on); null ids fail
    fast instead of packing nondeterministically.
    """
    id_type = df.schema[id_col].dataType.simpleString()
    rows = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(cost_col).cast("long").alias("cost"),
        pack_bucket(F.col(id_col), n_buckets, salt).alias("bucket"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["doc_id"].isna().any():
            raise ValueError(
                f"pack_sequences: null values in id column {id_col!r}; "
                "packing order would be nondeterministic"
            )
        if pdf["cost"].isna().any():
            # a null cost becomes float NaN here: every comparison is
            # False (bin perturbation) and NaN then hits the declared-long
            # output column — same fail-fast discipline as null ids.
            raise ValueError(
                f"pack_sequences: null values in cost column {cost_col!r}"
            )
        pdf = pdf.sort_values("doc_id")
        bins: list[int] = []
        bin_id, fill = 0, 0
        first = True
        for cost in pdf["cost"]:
            if first:
                first, fill = False, cost
            elif fill + cost <= budget:
                fill += cost
            else:
                bin_id, fill = bin_id + 1, cost
            bins.append(bin_id)
        pdf = pdf.assign(bin_in_bucket=bins)
        return pdf[["doc_id", "bucket", "bin_in_bucket", "cost"]]

    return rows.groupBy("bucket").applyInPandas(
        pack, f"doc_id {id_type}, bucket long, bin_in_bucket long, cost long"
    )
