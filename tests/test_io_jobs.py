"""Full-lifecycle integration tests (SURVEY.md §3.1): ingest → conform →
partitioned/atomic sinks → dashboard reads, in batch AND streaming, sharing
one conform definition.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from pandemic_knowledge_spark import io as pkio
from pandemic_knowledge_spark.sources import build_location_dim, ingest_owid, news_source
from pandemic_knowledge_spark.streaming.jobs import news_stream_ingest, owid_stream_ingest

from tests.test_sources import LOOKUP_CSV, OWID_CSV, OWID_SEMI_CSV, _write


@pytest.fixture()
def lookup_dim(spark, tmp_path):
    return build_location_dim(spark, _write(tmp_path, "lookup.csv", LOOKUP_CSV)).cache()


@pytest.fixture()
def owid_paths(tmp_path):
    return [
        _write(tmp_path, "owid.csv", OWID_CSV),
        _write(tmp_path, "owid_semi.csv", OWID_SEMI_CSV),
    ]


def test_batch_lifecycle_partitioned(spark, tmp_path, lookup_dim, owid_paths):
    """§3.1 end-to-end: conform → day-partitioned parquet → pruned dashboard
    scan. The date filter must hit partition pruning, not a full scan."""
    facts = ingest_owid(spark, owid_paths, lookup_dim)
    table = str(tmp_path / "facts")
    pkio.write_facts_partitioned(facts, table)

    # hive layout exists: one directory per day
    assert glob.glob(f"{table}/p_date=2021-03-01")

    back = pkio.read_facts(spark, table)
    assert back.count() == facts.count()

    day = back.filter(F.col("p_date") == "2021-03-01")
    assert day.count() == 1
    # partition pruning proof: the scan carries a partition filter, and only
    # one of the partition directories survives planning.
    plan = day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "p_date" in plan

    # A1 dashboard agg over the published table
    totals = back.groupBy("iso_code2").agg(F.sum("confirmed").alias("confirmed"))
    got = {r.iso_code2: r.confirmed for r in totals.collect()}
    assert got == {"FR": 23, "DE": 5}


def test_batch_atomic_publish(spark, tmp_path, lookup_dim, owid_paths):
    facts = ingest_owid(spark, owid_paths, lookup_dim)
    root = str(tmp_path / "published")
    v1 = pkio.publish_atomic(facts, root)
    assert pkio.read_published(spark, root).count() == facts.count()
    v2 = pkio.publish_atomic(facts.limit(2), root)
    assert v1 != v2
    assert pkio.read_published(spark, root).count() == 2


def test_owid_stream_matches_batch(spark, tmp_path, lookup_dim, owid_paths):
    """W1: the streaming job over a landing dir produces exactly the batch
    pipeline's rows (same conform_owid definition)."""
    import shutil

    landing = tmp_path / "landing"
    landing.mkdir()
    # streaming CSV applies one schema per stream: use the comma-dialect file
    # twice (dialect fan-out stays a batch concern; see sources.csv_sniff)
    shutil.copy(owid_paths[0], landing / "drop1.csv")

    out = str(tmp_path / "out")
    q = owid_stream_ingest(
        spark, str(landing), lookup_dim, out, str(tmp_path / "cp"), available_now=True
    )
    q.awaitTermination(120)

    batch = ingest_owid(spark, [owid_paths[0]], lookup_dim)
    got = spark.read.parquet(out)
    assert got.count() == batch.count()
    cols = ["date_start", "location_name", "confirmed", "deaths", "iso_code2"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, batch.select(*cols).collect())
    )


def test_news_stream_dedups_recrawl(spark, tmp_path):
    """W2: two overlapping crawl drops (identical URLs) land exactly once —
    the reference's uuid4 re-crawl duplication cannot happen."""
    feed = news_source(spark).drop("id").cache()
    landing = str(tmp_path / "news_landing")
    feed.write.parquet(landing)
    feed.write.mode("append").parquet(landing)  # the 24h-overlap re-crawl

    out = str(tmp_path / "news_out")
    q = news_stream_ingest(spark, landing, out, str(tmp_path / "news_cp"))
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() == feed.count()
    urls = got.select(F.col("source.url")).distinct()
    assert urls.count() == got.count()


def test_bucketed_tables_join_with_zero_shuffle(spark, sf_dir, tmp_path):
    """Co-located fact⋈fact join: both sides bucketed+sorted on the join key
    → SortMergeJoin consumes the bucket files directly, with NO Exchange in
    the plan. At 100 TB this converts every repeated orders⋈lineitem from a
    two-sided shuffle into pure local reads (warehouse dir is set session-wide
    by session.get_spark; static conf, not settable per-test)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pkio.write_bucketed_table(orders, "b_orders", "o_orderkey", n_buckets=4)
    pkio.write_bucketed_table(li, "b_lineitem", "l_orderkey", n_buckets=4)
    try:
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        joined = bo.join(bl, bo["o_orderkey"] == bl["l_orderkey"]).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        # Force the SMJ path (tiny test tables would otherwise broadcast).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            pre_join = plan.split("SortMergeJoin")[1]
            assert "Exchange" not in pre_join, "bucketed join still shuffled"
            expected = (
                orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
                .groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            assert sorted(map(tuple, joined.collect())) == sorted(
                map(tuple, expected.collect())
            )
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_events_ts_loads_as_ltz_timestamp_for_watermarks(spark, sf_dir):
    """Testdata-drift guard: the driver regenerates /root/testdata between
    rounds and events.ts has already shifted physical type once
    (TIMESTAMP(NANOS)->bigint in round 1, micros->TIMESTAMP_NTZ in round 2).
    tables.load must normalize every variant to TimestampType: batch
    semantics are identical under the UTC session zone, but
    withWatermark REJECTS NTZ event time — this exact drift silently broke
    every watermarked streaming path."""
    from pandemic_knowledge_spark import tables

    df = tables.load(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_compact_partitions_merges_small_files_losslessly(spark, tmp_path):
    """Fragmented partitions compact to their byte-need; data identical;
    already-compact partitions untouched; re-run is a no-op."""
    from pandemic_knowledge_spark.io import compact_partitions, write_facts_partitioned
    from pandemic_knowledge_spark.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events").withColumn(
        "date_start", F.col("ts").cast("date")
    )
    path = str(tmp_path / "facts")
    write_facts_partitioned(
        ev, path, date_col="date_start", cluster_col=None, max_records_per_file=7
    )
    before = spark.read.parquet(path)
    rows_before = sorted(map(tuple, before.drop("p_date").collect()))
    import glob
    n_files_before = len(glob.glob(f"{path}/p_date=*/*.parquet"))
    assert n_files_before > 60  # genuinely fragmented

    report = compact_partitions(spark, path, target_file_bytes=1 << 30)
    assert report and all(r["files_after"] == 1 for r in report)
    n_files_after = len(glob.glob(f"{path}/p_date=*/*.parquet"))
    assert n_files_after == len(report)

    after = spark.read.parquet(path)
    assert sorted(map(tuple, after.drop("p_date").collect())) == rows_before
    # idempotent: second run finds nothing fragmented
    assert compact_partitions(spark, path, target_file_bytes=1 << 30) == []


def test_compact_preserves_in_file_clustering(spark, tmp_path):
    """With sort_cols, compacted files keep the cluster-column ordering the
    original layout had — row-group min/max pruning survives compaction."""
    from pandemic_knowledge_spark.io import compact_partitions, write_facts_partitioned
    from pandemic_knowledge_spark.tables import load

    ev = (
        load(spark, "/root/testdata/sf0.001", "events")
        .withColumn("date_start", F.col("ts").cast("date"))
        .withColumn("iso_code2", F.concat(F.lit("u"), F.col("user_id") % 20))
    )
    path = str(tmp_path / "facts")
    write_facts_partitioned(ev, path, date_col="date_start", max_records_per_file=9)
    report = compact_partitions(
        spark, path, target_file_bytes=1 << 30, sort_cols=("iso_code2",)
    )
    assert report
    import glob
    for f in glob.glob(f"{path}/p_date=*/*.parquet")[:5]:
        vals = [r.iso_code2 for r in spark.read.parquet(f).collect()]
        assert vals == sorted(vals), f


def test_compact_recovers_from_interrupted_swap(spark, tmp_path):
    """A kill between the two swap renames parks the partition as
    _compact_old_<name>; the next run must restore it (and clear tmp
    leftovers) instead of skipping underscore dirs forever."""
    import glob
    import os

    from pandemic_knowledge_spark.io import compact_partitions, write_facts_partitioned
    from pandemic_knowledge_spark.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events").withColumn(
        "date_start", F.col("ts").cast("date")
    )
    path = str(tmp_path / "facts")
    write_facts_partitioned(
        ev, path, date_col="date_start", cluster_col=None, max_records_per_file=7
    )
    rows_before = sorted(
        map(tuple, spark.read.parquet(path).drop("p_date").collect())
    )
    # simulate the crash window: one partition renamed aside, a tmp left over
    part = sorted(glob.glob(f"{path}/p_date=*"))[0]
    name = os.path.basename(part)
    os.rename(part, f"{path}/_compact_old_{name}")
    os.makedirs(f"{path}/_compact_tmp_{name}", exist_ok=True)

    report = compact_partitions(spark, path, target_file_bytes=1 << 30)
    assert report  # compaction proceeded after recovery
    assert not glob.glob(f"{path}/_compact_*")
    rows_after = sorted(
        map(tuple, spark.read.parquet(path).drop("p_date").collect())
    )
    assert rows_after == rows_before


def test_owid_stream_rejects_reordered_header(spark, tmp_path, lookup_dim, owid_paths):
    """CSV user-schemas map by position; enforceSchema=false makes the
    stream FAIL on a file whose header order differs from the landing
    schema instead of silently reading iso_code values as dates."""
    import pytest

    with open(owid_paths[0]) as f:
        header = f.readline().rstrip("\n").split(",")
        body = f.read()
    landing = tmp_path / "landing_bad"
    landing.mkdir()
    reordered = ",".join(header[1:] + header[:1])
    (landing / "bad.csv").write_text(reordered + "\n" + body)

    q = owid_stream_ingest(
        spark, str(landing), lookup_dim,
        str(tmp_path / "out_bad"), str(tmp_path / "cp_bad"), available_now=True,
    )
    with pytest.raises(Exception) as exc:
        q.awaitTermination(120)
    assert "stream_failed" in str(exc.value).lower()
    # and nothing corrupt was committed
    import glob
    assert not glob.glob(str(tmp_path / "out_bad" / "*.parquet"))


def test_compact_partitions_on_hadoop_scheme(spark, tmp_path):
    """OPTIMIZE over a non-file scheme: the whole walk (list, rewrite,
    two-rename swap, crash-recovery preamble) through Hadoop FileSystem
    dispatch on a viewfs:// mount — the path an hdfs:// table root takes.
    (On object stores the rename-swap caveat in the docstring applies:
    route the publish through AtomicTable's version swap instead.)"""
    from pandemic_knowledge_spark.io import compact_partitions, write_facts_partitioned
    from pandemic_knowledge_spark.tables import load

    spark.sparkContext._jsc.hadoopConfiguration().set(
        "fs.viewfs.mounttable.compacttest.link./warehouse", f"file://{tmp_path}"
    )
    ev = load(spark, "/root/testdata/sf0.001", "events").withColumn(
        "date_start", F.col("ts").cast("date")
    )
    path = "viewfs://compacttest/warehouse/facts"
    write_facts_partitioned(
        ev, path, date_col="date_start", cluster_col=None, max_records_per_file=7
    )
    rows_before = sorted(
        map(tuple, spark.read.parquet(path).drop("p_date").collect())
    )
    report = compact_partitions(spark, path, target_file_bytes=1 << 30)
    assert report and all(r["files_after"] == 1 for r in report)
    after = sorted(map(tuple, spark.read.parquet(path).drop("p_date").collect()))
    assert after == rows_before
    assert compact_partitions(spark, path, target_file_bytes=1 << 30) == []
