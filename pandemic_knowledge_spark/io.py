"""Batch sinks (SURVEY.md §2.2 K1–K5) and the physical table layout.

The reference's sink is ES bulk-indexing with hand-rolled 1,000-row flush
buffers and a delete-then-reload refresh (K1/K3,
/root/reference/flow/scripts/insert_owid.py:148-156,231-252). Spark-first:
``df.write.parquet`` does the batching; the refresh goes through the same
atomic versioned swap the streaming sink uses (streaming.sinks.AtomicTable),
closing the reference's documented non-atomicity
(/root/reference/README.md:226-227).

Physical layout (SURVEY.md §4.2): facts are hive-partitioned by event date
(day grain) — the dashboards' time filters become partition pruning — with
an in-file sort by the secondary filter column so parquet row-group min/max
stats prune within partitions. At 100 TB this layout is the difference
between scanning a day and scanning the world.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandemic_knowledge_spark.streaming.sinks import AtomicTable


def write_facts_partitioned(
    df: DataFrame,
    path: str,
    date_col: str = "date_start",
    cluster_col: str | None = "iso_code2",
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """K1 + layout: hive-partition by day, cluster rows within partitions.

    - ``p_date`` partition column derived from ``date_col`` (kept as a real
      column too, so readers need no reconstruction).
    - ``sortWithinPartitions(cluster_col)`` orders rows inside each file so
      row-group statistics prune on the geo key (the dashboards' second
      filter axis) without a second shuffle.
    - ``maxRecordsPerFile`` is the scale-tuning knob replacing the
      reference's MAX_ES_ROW_INJECT flush bound.
    """
    out = df.withColumn("p_date", F.col(date_col).cast("date"))
    if cluster_col is not None and cluster_col in df.columns:
        out = out.sortWithinPartitions("p_date", cluster_col)
    writer = out.write.mode(mode).partitionBy("p_date")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def read_facts(spark: SparkSession, path: str) -> DataFrame:
    """Scan the partitioned fact table; date predicates prune partitions."""
    return spark.read.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """K5/J-scale — persist a fact as a bucketed + sorted catalog table.

    Two facts bucketed on their join key into the same bucket count join
    with ZERO shuffle and zero sort: each scan already reports
    ``HashPartitioning(key, n)`` and per-bucket sort order, so SortMergeJoin
    consumes the files as-is. This is the co-located-join layout for the
    repeated 100 TB fact⋈fact joins (orders⋈lineitem every dashboard
    refresh) — pay the shuffle once at write time, never at query time.
    The reference has no analogue: ES routes docs to shards by _id only.
    """
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def publish_atomic(df: DataFrame, table_root: str) -> str:
    """K3 — the batch full-refresh through the versioned swap: readers see
    the previous complete version until the new one is committed."""
    return AtomicTable(table_root).overwrite(df)


def read_published(spark: SparkSession, table_root: str) -> DataFrame:
    return AtomicTable(table_root).read(spark)


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
    sort_cols: tuple[str, ...] = (),
) -> list[dict]:
    """Small-file compaction (the OPTIMIZE maintenance job): rewrite each
    hive partition whose file count exceeds what its byte size needs into
    ~``target_file_bytes`` files.

    Streaming appends and per-batch writes fragment a 100 TB table into
    millions of small files; every query then pays file-open latency and
    loses row-group pruning. This job walks the partition directories
    (driver-side listing — metadata, not data), and for each fragmented
    partition rewrites it with ``repartition(n_target)`` (the rewrite
    itself is distributed) then swaps the directory. Partitions already
    compact are left byte-for-byte untouched, so the job is incremental
    and re-runnable; the swap is rename-based (atomic on HDFS-like
    filesystems; on object stores run it under the table's version-swap
    publish instead — streaming.sinks.AtomicTable).

    Returns a per-compacted-partition report:
    {partition, files_before, files_after, bytes}.
    """
    jvm = spark._jvm
    jsc = spark._jsc
    hconf = jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)
    # Crash recovery preamble: a kill between the two swap renames leaves
    # the partition parked as _compact_old_<name> (data intact, table
    # missing the partition) and possibly a _compact_tmp_<name>. Restore
    # the old dir if its partition is absent, then clear leftovers — so a
    # re-run self-heals instead of permanently skipping underscore dirs.
    for st in fs.listStatus(root):
        nm = st.getPath().getName()
        if nm.startswith("_compact_old_"):
            orig = jvm.org.apache.hadoop.fs.Path(root, nm[len("_compact_old_"):])
            if not fs.exists(orig):
                fs.rename(st.getPath(), orig)
            else:
                fs.delete(st.getPath(), True)
        elif nm.startswith("_compact_tmp_"):
            fs.delete(st.getPath(), True)
    report: list[dict] = []
    for st in fs.listStatus(root):
        if not st.isDirectory():
            continue
        part = st.getPath()
        name = part.getName()
        if name.startswith("_") or "=" not in name:
            continue
        files = [
            f for f in fs.listStatus(part)
            if f.isFile() and not f.getPath().getName().startswith(("_", "."))
        ]
        total = sum(f.getLen() for f in files)
        n_target = max(1, -(-total // target_file_bytes))
        if len(files) < max(min_files_to_compact, n_target + 1):
            continue
        part_str = part.toString()
        df = spark.read.parquet(part_str)
        tmp = jvm.org.apache.hadoop.fs.Path(part.getParent(), "_compact_tmp_" + name)
        out = df.repartition(int(n_target))
        if sort_cols:
            # re-establish the in-file clustering the original writer laid
            # down (io.write_facts_partitioned sortWithinPartitions) — a
            # plain rewrite would shuffle rows arbitrarily and destroy the
            # row-group min/max pruning the layout exists for.
            out = out.sortWithinPartitions(*sort_cols)
        out.write.mode("overwrite").parquet(tmp.toString())
        # drop the writer's _SUCCESS marker, then swap directories
        marker = jvm.org.apache.hadoop.fs.Path(tmp, "_SUCCESS")
        if fs.exists(marker):
            fs.delete(marker, False)
        old = jvm.org.apache.hadoop.fs.Path(part.getParent(), "_compact_old_" + name)
        if not fs.rename(part, old):
            raise IOError(f"compaction swap failed for {part_str}")
        if not fs.rename(tmp, part):
            fs.rename(old, part)  # roll back
            raise IOError(f"compaction swap failed for {part_str}")
        fs.delete(old, True)
        n_after = len([
            f for f in fs.listStatus(part)
            if f.isFile() and not f.getPath().getName().startswith(("_", "."))
        ])
        report.append(
            {
                "partition": name,
                "files_before": len(files),
                "files_after": n_after,
                "bytes": int(total),
            }
        )
    return report
