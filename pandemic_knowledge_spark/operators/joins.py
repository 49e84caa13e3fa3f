"""Join operators: broadcast lookup, multi-key fallback, miss-detection, as-of.

The reference's only joins are in-memory dict probes against a 4,194-row
lookup table (J1-J4 in SURVEY.md §2.5: build
/root/reference/flow/scripts/insert_owid.py:255-277, probe
/root/reference/flow/scripts/insert_owid.py:77-79). Here they become real
distributed joins: the dict probe is a broadcast hash join, the 3-alternate-
key dict is an unpivoted dimension with first-wins dedup, the "miss → cache
→ geocode" loop is a left-anti miss detector, and we add the fact-to-fact
shapes the reference never needed (shuffle equi-join, as-of, range) because
a 100 TB engine does.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_lookup_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """J1 — classic broadcast hash join against a small dimension.

    The reference probes a Python dict per row
    (/root/reference/flow/scripts/insert_owid.py:77-79); broadcasting the dim
    ships it once per executor and keeps the fact side shuffle-free.
    """
    return facts.join(F.broadcast(dim), on=on, how=how)


def multikey_lookup_join(
    facts: DataFrame,
    probe_key: str,
    dim: DataFrame,
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
    how: str = "left",
) -> DataFrame:
    """J2 — dimension keyed by several alternate columns, first-wins.

    The reference keys its lookup dict by Province_State, Country_Region AND
    Combined_Key, first writer wins
    (/root/reference/flow/scripts/insert_owid.py:265-275). Spark-first
    re-expression: unpivot the dim to (key, payload...) rows with a priority
    = key-column position, dedup keeping the highest-priority row per key,
    then a single broadcast equi-join.
    """
    melted = None
    for prio, kc in enumerate(key_cols):
        part = dim.select(
            F.col(kc).cast("string").alias("__lookup_key"),
            F.lit(prio).alias("__prio"),
            *[F.col(p) for p in payload_cols],
        ).where(F.col("__lookup_key").isNotNull())
        melted = part if melted is None else melted.unionByName(part)
    w = Window.partitionBy("__lookup_key").orderBy("__prio")
    deduped = (
        melted.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__prio")
    )
    return facts.join(
        F.broadcast(deduped),
        facts[probe_key] == deduped["__lookup_key"],
        how,
    ).drop("__lookup_key")


def anti_join_misses(facts: DataFrame, dim: DataFrame, on: str | list[str]) -> DataFrame:
    """J3 — the "which keys missed the lookup" half of the reference's
    memoized geocode loop (/root/reference/flow/scripts/insert_owid.py:75-97):
    distinct unmatched keys via left_anti, ready for offline enrichment and
    union back into the dimension."""
    return facts.join(dim, on=on, how="left_anti")


def semi_join_hits(facts: DataFrame, dim: DataFrame, on: str | list[str]) -> DataFrame:
    """Semi-join complement of :func:`anti_join_misses`."""
    return facts.join(dim, on=on, how="left_semi")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_payload: Sequence[str],
    strict: bool = True,
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row at-or-before
    (``strict=False``) / strictly-before (``strict=True``) its timestamp,
    per join key. ``tolerance`` (pandas ``merge_asof`` semantics): a match
    older than ``tolerance`` seconds (or axis units, for numeric time
    columns) is discarded — the payload columns come back NULL, exactly as
    if no right row preceded the left one. Staleness cut-offs ("use the
    last quote, but only if it's fresher than 5 minutes") are this knob.

    Scalable union-sort implementation — NO pairwise join, NO explosion:
    tag both sides, union on (key, time), and carry the last non-null right
    payload forward with a running window. One shuffle on the join key, cost
    O((|L|+|R|) log) per partition; this is the sort-merge as-of strategy
    native engines (e.g. kdb, QuestDB, DuckDB ASOF JOIN) use, expressed in
    DataFrame primitives so Catalyst/AQE still manage partitioning and skew.
    """
    keys = list(on)
    lcols = [c for c in left.columns]
    # Carry ONE struct of all payload columns (not each column through its
    # own last(ignorenulls)): per-column carries could mix payloads from
    # DIFFERENT right rows whenever a right row holds nulls in some payload
    # columns — a row-inconsistent as-of match. The struct is non-null
    # exactly for right rows, so one carry selects one whole matched row.
    # the matched right TIME rides inside the carried struct (__rt) so the
    # tolerance check can compare it against the left row's time after the
    # carry — per-column carries couldn't know which right row matched
    payload_struct = F.struct(
        F.col(right_time).alias("__rt"),
        *[F.col(p).alias(p) for p in right_payload],
    )
    null_struct = F.lit(None).cast(
        "struct<"
        + ",".join(
            [f"__rt:{right.schema[right_time].dataType.simpleString()}"]
            + [
                f"{p}:{right.schema[p].dataType.simpleString()}"
                for p in right_payload
            ]
        )
        + ">"
    )
    l = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        null_struct.alias("__r"),
    )
    # tie order at equal timestamps: for strict '<' the right row must sort
    # AFTER the left row (so it is not visible); for '<=' it sorts before.
    r_tie = 2 if strict else 0
    # A right row with NULL time has no position on the axis: ascending
    # sort puts nulls FIRST, so it would be carried as the "as-of" match
    # for every left row before the first real right row. It can never be
    # a valid match under either contract — drop it.
    right = right.where(F.col(right_time).isNotNull())
    r = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
        F.col(right_time).alias("__t"),
        F.lit(r_tie).alias("__is_left"),
        payload_struct.alias("__r"),
    ).select(*l.columns)  # align column order
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        F.col("__t"),
        F.col("__is_left"),
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__r_asof"),
    )
    match = F.col("__r_asof")
    if tolerance is not None:
        # gap is >= 0 by construction (the carry only sees earlier rows);
        # a stale match nulls out whole, exactly as if none existed.
        # DATE axes can't cast to double — their gap is datediff in DAYS
        # (tolerance stays "axis units": days for dates, seconds for
        # timestamps, raw units for numerics).
        from pyspark.sql.types import DateType

        if isinstance(left.schema[left_time].dataType, DateType):
            gap = F.datediff(F.col("__t"), match["__rt"]).cast("double")
        else:
            gap = F.col("__t").cast("double") - match["__rt"].cast("double")
        match = F.when(gap <= F.lit(float(tolerance)), match)
    return (
        carried.where(F.col("__is_left") == 1)
        .select(
            *lcols,
            *[match[p].alias(p + "_asof") for p in right_payload],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    how: str = "inner",
) -> DataFrame:
    """Range/interval join: plain theta-join wrapper (kept for arbitrary
    predicates). For the common point-in-interval shape use
    :func:`banded_range_join`, which turns the theta-join into an equi-join
    on a band column — the only form that scales."""
    return left.join(right, on=on, how=how)


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lo: str,
    hi: str,
    band_width: float,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval range join WITHOUT an equi-key, as a banded
    equi-join: match every left row whose ``point`` falls in a right row's
    ``[lo, hi)`` interval.

    Strategy (the bucketize → equi-join → recheck recipe): the left point
    maps to one band ``floor(point/W)``; each right interval explodes to the
    bands it overlaps (``sequence(floor(lo/W), floor(hi/W))`` — at most
    ``len/W + 2`` rows). Equi-join on the band, then re-check the precise
    ``lo <= point < hi`` predicate to drop band-boundary false positives.
    A (left, right) pair can only meet in the left point's single band, so
    no dedup pass is needed.

    Why this scales where a theta-join cannot: Catalyst plans a pure range
    predicate as BroadcastNestedLoopJoin (O(|L|·|R|) compares, and the whole
    right side on every executor). The band column is a shuffle-able,
    AQE-skew-splittable equi key; cost is O(|L| + |R|·len/W + matches).
    Pick ``band_width`` near the typical interval length so most intervals
    explode to ~2 bands. Distance joins (|a-b| <= r) reduce to this with
    intervals [b-r, b+r + ulp)."""
    if how != "inner":
        # the exact-bounds recheck runs AFTER the join, which would silently
        # drop an outer join's null-extended rows — matching ES/SQL range
        # semantics for outer joins needs a different construction
        raise ValueError("banded_range_join supports how='inner' only")
    lpt = F.col(point)
    band = F.floor(lpt / F.lit(band_width)).cast("long")
    lb = left.withColumn("__band", band)
    rb = right.withColumn(
        "__band",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / F.lit(band_width)).cast("long"),
                F.floor(F.col(hi) / F.lit(band_width)).cast("long"),
            )
        ),
    )
    joined = lb.join(rb, on="__band", how=how).where(
        (lpt >= F.col(lo)) & (lpt < F.col(hi))
    )
    return joined.drop("__band")
