"""SCD2 dimension history: change-compressed validity intervals + time travel.

The reference refreshes dimension-like indices wholesale (SCD1 semantics —
``/root/reference/flow/scripts/insert_owid.py:109-118`` drops and rebuilds the
index, keeping only the latest attribute value per key). This module adds the
warehouse-standard type-2 extension on top of the same change feed: instead of
overwriting, every attribute change opens a new validity interval
``[valid_from, valid_to)`` so any historical state can be reconstructed
(point-in-time snapshot / as-of enrichment).

Scale shape: ONE shuffle on the business key. Both window passes —
change-compression (lag) and interval closing (lead) — declare the same
``partitionBy(key) orderBy(ts, tiebreak)``, so Catalyst plans a single
Exchange + sort and runs both windows over it. No driver-side state, no
self-join: 100 TB of change log is one keyed sort-merge pass. A skewed key
(one entity with millions of changes) degrades only its own partition's sort,
and the output is linear in the number of *changes*, never in key-cardinality
× time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def build_scd2(
    changes: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse a change log into SCD2 history rows.

    Consecutive rows of a key whose tracked attributes are unchanged are
    compressed away (re-stating the same value does not open a new version).
    Each surviving change becomes one history row:

    - ``valid_from``  — the change's event time,
    - ``valid_to``    — the next change's event time (NULL while current),
    - ``is_current``  — exactly one true row per key.

    ``tiebreak_col`` makes the within-timestamp order deterministic when two
    changes of one key share a timestamp (e.g. a monotonic event id). Of an
    equal-timestamp run only the LAST (per tiebreak) survives — the earlier
    ones would be zero-length ``[t, t)`` intervals, invisible to every
    snapshot and hazardous to re-merge, so they are dropped.
    """
    if not key_cols or not attr_cols:
        raise ValueError("build_scd2 requires at least one key and one attribute")
    order: list[Column] = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(*key_cols).orderBy(*order)

    # Change-compression: a row survives iff any tracked attribute differs
    # from the key's previous row. NULL-safe (<=> semantics) so NULL→'x'
    # and 'x'→NULL both count as changes while NULL→NULL does not.
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    first = F.row_number().over(w) == 1

    compressed = changes.withColumn("_keep", first | changed).filter("_keep")

    # Interval closing over the SAME partitioning/order → exchange reuse.
    valid_to = F.lead(ts_col).over(w)
    return (
        compressed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", valid_to)
        .withColumn("is_current", valid_to.isNull())
        # Drop zero-length [t, t) intervals (same-instant corrections):
        # they are invisible to every snapshot, and keeping them poisons
        # RE-merging — on the next merge both rows re-enter the change log
        # with identical (ts, _src=0) sort keys, making which attribute
        # set wins partition-layout-dependent.
        .where(F.col("valid_to").isNull() | (F.col("valid_to") != F.col("valid_from")))
        .select(*key_cols, *attr_cols, "valid_from", "valid_to", "is_current")
    )


def scd2_merge(
    history: DataFrame,
    batch: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Incrementally fold a batch of new changes into existing SCD2 history.

    The scale contract: only keys PRESENT IN THE BATCH are re-windowed.
    Untouched keys pass through as-is — no sort, no window, no rewrite — so
    the cost is O(batch keys' history), not O(table). (On a key-bucketed
    layout the passthrough is also a file-level no-op: only buckets holding
    touched keys rewrite — the same log-structured-merge note as
    streaming.sinks.upsert_sink.)

    Correctness: a key's history rows ARE its compressed change log
    (valid_from = change ts), so re-running the SCD2 build over
    (touched history ∪ batch) reproduces exactly what a full rebuild over
    the complete change log would emit for those keys — including late
    (out-of-order) batch rows that splice intervals mid-history. A batch
    row timestamped identically to an existing change of the same key wins
    (sorts later): the merge treats it as a correction.
    """
    keys = batch.select(*key_cols).distinct()
    touched = history.join(keys, key_cols, "left_semi")
    untouched = history.join(keys, key_cols, "left_anti")
    # History rows sort before equal-ts batch rows via the source rank —
    # deterministic, and "batch wins" on exact-ts corrections.
    log = touched.select(
        *key_cols, *attr_cols, F.col("valid_from").alias(ts_col), F.lit(0).alias("_src")
    ).unionByName(
        batch.select(*key_cols, *attr_cols, F.col(ts_col), F.lit(1).alias("_src"))
    )
    rebuilt = build_scd2(log, key_cols, attr_cols, ts_col, tiebreak_col="_src")
    return untouched.unionByName(rebuilt)


def snapshot_at(history: DataFrame, at: str | Column) -> DataFrame:
    """Point-in-time snapshot: each key's attribute state as of ``at``.

    A plain filter over the history — ``valid_from <= at < valid_to`` —
    which Catalyst pushes to the scan; on a history table partitioned or
    z-ordered by ``valid_from`` this prunes to the files overlapping the
    snapshot instant. No join, no window: O(matching rows).
    """
    at_c = F.lit(at).cast("timestamp") if isinstance(at, str) else at
    return history.filter(
        (F.col("valid_from") <= at_c)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > at_c))
    ).drop("is_current")
