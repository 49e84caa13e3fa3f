"""Skew-mitigation operators: salted aggregation and salted replicate join.

The reference never meets data skew (its largest "join" probes a 4,194-row
dict — /root/reference/flow/scripts/insert_owid.py:255-277), but at 100 TB a
handful of hot keys (one country, one crawler source, one viral document)
can put an entire groupBy/join key on a single reducer. AQE's skew-join
splitting (session.py) covers sort-merge joins at runtime; these operators
are the *declarative* counterpart for aggregations and for joins AQE can't
rewrite (e.g. a broadcast-ineligible medium dimension against a skewed
fact).

Both are pure plan transformations — no sampling, no driver-side state —
and both produce results identical to their unsalted equivalents (exact
int64 partial sums are reorder-insensitive), which is what lets the DuckDB
oracle check them with plain GROUP BY / JOIN SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def with_salt(df: DataFrame, n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Attach a uniform salt derived from the full row spread (crc32 of a
    uuid-free deterministic column mix would still collide on the hot key —
    the point of salting is to split WITHIN a key, so the salt must NOT be a
    function of the key alone). monotonically_increasing_id is per-row
    unique and never leaves the plan."""
    return df.withColumn(
        "_salt", F.pmod(F.crc32(F.monotonically_increasing_id().cast("string")), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    key: str,
    partials: dict[str, Column],
    finals: dict[str, Column],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    Phase 1 groups on (key, salt) — the hot key's rows land on ``n_salts``
    reducers instead of one; phase 2 combines the per-salt partials on the
    key alone, moving at most ``n_salts`` rows per key. Correct only for
    algebraic aggregates (sum/count/min/max — anything with an associative
    merge); ``partials`` maps name → phase-1 aggregate over input rows,
    ``finals`` maps name → phase-2 merge over the phase-1 columns.

    (Spark's own partial+final HashAggregate does the same split per
    *partition*; explicit salting additionally bounds the size of every
    phase-2 group, which partial aggregation alone does not when one key
    dominates a post-shuffle partition.)
    """
    phase1 = (
        with_salt(df, n_salts)
        .groupBy(key, "_salt")
        .agg(*[c.alias(n) for n, c in partials.items()])
    )
    return phase1.groupBy(key).agg(*[c.alias(n) for n, c in finals.items()])


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skewed-fact ⋈ medium-dim equi-join via salt-and-replicate.

    The fact side gets a per-row salt; the dim side is replicated once per
    salt value (an ``explode(sequence(...))`` — n_salts× the dim, which by
    assumption is far smaller than the fact). Joining on (key, salt) spreads
    each hot fact key over n_salts reducers. Same rows as ``fact.join(dim,
    key, how)`` for inner/left joins keyed on ``key``; right/full joins
    would emit one null-padded row PER SALT for dim keys absent from the
    fact side — rejected rather than silently inflated.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' (got {how!r}): the "
            "replicated dim side breaks right/full row-count semantics"
        )
    salted_fact = with_salt(fact, n_salts)
    replicated = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    joined = salted_fact.join(replicated, [key, "_salt"], how)
    return joined.drop("_salt")
