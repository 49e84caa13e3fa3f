"""Z-order layout (operators/layout.py): Morton interleave correctness,
losslessness of the rewrite, and the actual pruning benefit measured from
the parquet footers of the written files."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from pandemic_knowledge_spark.operators.layout import (
    zorder_frame,
    zorder_write,
    zvalue,
)
from pandemic_knowledge_spark.tables import load


def test_zvalue_interleaves_bits(spark):
    # dim0 bits land at even positions, dim1 bits at odd positions.
    df = spark.createDataFrame([(0b101, 0b011)], ["a", "b"])
    z = df.select(zvalue([F.col("a"), F.col("b")], bits=3).alias("z")).first().z
    # a=101, b=011 -> z bits from LSB: a0=1,b0=1,a1=0,b1=1,a2=1,b2=0
    # -> 1 + 2 + 8 + 16 = 27 (0b011011)
    assert z == 0b011011


def test_zvalue_locality(spark):
    # Points close in BOTH dims are closer in z than points far in one dim.
    rows = [(1, 1), (2, 2), (1, 60000)]
    df = spark.createDataFrame(rows, ["a", "b"])
    zs = [
        r.z
        for r in df.select(zvalue([F.col("a"), F.col("b")]).alias("z"))
        .orderBy("a", "b")
        .collect()
    ]
    # orderBy(a, b): zs[0]=(1,1), zs[1]=(1,60000), zs[2]=(2,2)
    near, far = abs(zs[2] - zs[0]), abs(zs[1] - zs[0])
    assert near < far


def _overlap_fraction(path: str, box: dict[str, tuple]) -> float:
    """Fraction of written files whose footer min/max intersects the box on
    EVERY dimension (i.e. files a stats-pruning scan must read)."""
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert files
    hit = 0
    for f in files:
        md = pq.read_metadata(f)
        mins: dict[str, object] = {}
        maxs: dict[str, object] = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in box and col.statistics is not None:
                    s = col.statistics
                    mins[name] = min(mins.get(name, s.min), s.min)
                    maxs[name] = max(maxs.get(name, s.max), s.max)
        if all(mins[c] <= hi and maxs[c] >= lo for c, (lo, hi) in box.items()):
            hit += 1
    return hit / len(files)


def test_rewrite_lossless_and_prunes_both_dims(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    zorder_write(ev, ["user_id", "value"], zpath, n_files=16)
    # Baseline layout: sorted by user_id only (prunes user_id, not value).
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    # Lossless: same multiset of rows back.
    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    assert (
        back.groupBy().agg(F.sum("event_id"), F.sum("user_id")).collect()
        == ev.groupBy().agg(F.sum("event_id"), F.sum("user_id")).collect()
    )

    # A box on (user_id, value): z-order must beat the single-dim layout,
    # because the linear layout's files each span the full value range.
    stats = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    u_lo = stats[0] + (stats[1] - stats[0]) * 2 // 10
    u_hi = stats[0] + (stats[1] - stats[0]) * 4 // 10
    v_lo = stats[2] + (stats[3] - stats[2]) * 0.2
    v_hi = stats[2] + (stats[3] - stats[2]) * 0.4
    box = {"user_id": (u_lo, u_hi), "value": (v_lo, v_hi)}
    z_frac = _overlap_fraction(zpath, box)
    l_frac = _overlap_fraction(lpath, box)
    assert z_frac < 1.0, "z-order layout prunes nothing"
    assert z_frac <= l_frac, (z_frac, l_frac)
    # And on the VALUE dimension alone — where the user_id-sorted layout is
    # helpless — z-order still skips files.
    v_only = {"value": (v_lo, v_hi)}
    assert _overlap_fraction(zpath, v_only) < _overlap_fraction(lpath, v_only)


def test_zorder_frame_handles_timestamp(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    z = zorder_frame(ev, ["user_id", "ts"])
    assert "_z" in z.columns
    assert z.filter(F.col("_z").isNull()).count() == 0


def test_zvalue_bit_budget_guard():
    import pytest
    from pyspark.sql import functions as F

    from pandemic_knowledge_spark.operators.layout import zvalue

    with pytest.raises(ValueError):
        zvalue([F.lit(1)] * 4, bits=16)  # 64 bits > 63


def test_zorder_empty_frame_degrades_gracefully(spark, tmp_path):
    from pandemic_knowledge_spark.operators.layout import zorder_frame

    empty = spark.createDataFrame([], "a double, b double")
    out = zorder_frame(empty, ["a", "b"])
    assert out.collect() == []
