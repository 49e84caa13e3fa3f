"""k-anonymity suppression (operators.privacy): the release contract —
every surviving quasi combination has >= k rows, rare combos fully masked,
payload columns untouched."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandemic_knowledge_spark.operators.privacy import (
    SUPPRESSED,
    anonymity_report,
    k_anonymize,
)


def _df(spark):
    rows = (
        [(i, "fr", "2024-01-01", i * 10) for i in range(5)]
        + [(10 + i, "de", "2024-01-01", 7) for i in range(2)]
        + [(20, "it", "2024-01-02", 9)]
    )
    return spark.createDataFrame(rows, "id long, country string, day string, payload long")


def test_contract_and_mask(spark):
    out = k_anonymize(_df(spark), ["country", "day"], k=3).collect()
    by_id = {r.id: r for r in out}
    # big group released intact
    assert by_id[0].country == "fr" and by_id[0].anon_suppressed is False
    # rare combos fully masked, payload untouched
    for i in (10, 11, 20):
        assert by_id[i].country == SUPPRESSED and by_id[i].day == SUPPRESSED
        assert by_id[i].anon_suppressed is True
    assert by_id[20].payload == 9
    # released combinations all have >= k rows
    released = [r for r in out if not r.anon_suppressed]
    from collections import Counter
    for combo, n in Counter((r.country, r.day) for r in released).items():
        assert n >= 3, combo


def test_report(spark):
    r = anonymity_report(_df(spark), ["country", "day"], k=3).collect()[0]
    assert r.n_groups == 3 and r.groups_released == 1
    assert r.rows_suppressed == 3 and r.suppressed_frac == round(3 / 8, 6)


def test_nulls_are_a_quasi_value(spark):
    rows = [(0, None, "d", 1), (1, None, "d", 2), (2, None, "d", 3)]
    df = spark.createDataFrame(rows, "id long, country string, day string, payload long")
    out = k_anonymize(df, ["country", "day"], k=3).collect()
    assert all(not r.anon_suppressed for r in out)
