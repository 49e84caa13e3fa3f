"""URL canonicalization: rule-by-rule unit cases, idempotence, and the
scan-side plan gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandemic_knowledge_spark.functions.url import canonical_url, synth_url

CASES = [
    # (raw, canonical)
    ("HTTP://WWW.Example.COM:80/Path/?utm_source=x&b=2&a=1#f",
     "http://example.com/Path?a=1&b=2"),
    ("https://Example.com:443/a/b", "https://example.com/a/b"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),  # non-default port kept
    ("http://example.com", "http://example.com"),
    ("http://example.com/", "http://example.com"),
    ("https://example.com/X?fbclid=1&gclid=2&ref=3", "https://example.com/X"),
    ("https://example.com/x?a=1&a=0", "https://example.com/x?a=0&a=1"),
    ("https://www.example.com/CaseSensitive/Path", "https://example.com/CaseSensitive/Path"),
    ("not a url", None),
    ("ftp://example.com/x", "ftp://example.com/x"),  # scheme preserved, no port rule
    ("", None),
]


@pytest.fixture(scope="module")
def canon(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)], "i long, url string")
    rows = df.select("i", canonical_url("url").alias("c")).collect()
    return {r.i: r.c for r in rows}


def test_rules(canon):
    for i, (raw, expect) in enumerate(CASES):
        assert canon[i] == expect, f"{raw!r}: {canon[i]!r} != {expect!r}"


def test_idempotent(spark):
    urls = [u for u, c in CASES if c is not None]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonical_url("url").alias("c"))
    twice = once.select(F.col("c").alias("orig"), canonical_url("c").alias("again"))
    for r in twice.collect():
        assert r.again == r.orig


def test_synth_urls_canonicalize_to_groups(spark):
    """The fixture generator produces collapsible variants: group sizes > 1
    exist and every raw URL parses."""
    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), F.lit("src1").alias("source")
    )
    c = df.select(canonical_url(synth_url(F.col("doc_id"), F.col("source"))).alias("c"))
    assert c.filter(F.col("c").isNull()).count() == 0
    sizes = c.groupBy("c").count()
    assert sizes.filter(F.col("count") > 1).count() > 0


def test_scan_side_no_shuffle(spark):
    df = spark.createDataFrame([("http://a.com/x",)], "url string")
    plan = (
        df.select(canonical_url("url").alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
