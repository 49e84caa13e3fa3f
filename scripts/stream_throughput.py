"""Streaming ingest throughput: the sf1 corpus through the stateful
LSH near-dup marker under the RocksDB state store provider.

The batch twins are benched (bench.py / bench_sf1.py); this measures the
STREAMING surface the same corpus takes in production — an availableNow
drain of the derived-sf1 documents table (50k docs, ~300 chars each; see
scripts/bench_sf1.py for the derivation) split into micro-batches via
maxFilesPerTrigger, through ``near_dup_mark_stateful`` (one long of state
per (band, bkey) bucket) into a parquet sink with checkpointing. Reports:

- docs/sec over the whole drain (wall-clock, including source listing,
  state-store commits, and sink writes — the number an ingest pipeline
  actually gets),
- per-batch input rows from the query's progress events,
- the persisted state-store footprint (du of <checkpoint>/state) and the
  final bucket count (distinct (band, bkey) keys = state rows),
- a correctness witness: the drained verdicts must equal the batch
  operator's on the same corpus (stream ≡ batch, same as the pinned
  tests, re-asserted on the measured run so the number can't come from a
  silently-wrong stream).

Usage: python scripts/stream_throughput.py [--batches 10] [--regen]
Prints ONE JSON line. Run on an idle box (loadavg witness included).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from pandemic_knowledge_spark.operators.dedup import near_dup_mark
from pandemic_knowledge_spark.session import get_spark
from pandemic_knowledge_spark.streaming import (
    file_stream,
    near_dup_mark_stateful,
    near_dup_verdicts,
)

DOCS_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1-dir", default="/tmp/pk_sf1")
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--regen", action="store_true")
    ap.add_argument("--skip-verify", action="store_true")
    args = ap.parse_args()

    loadavg_start = round(os.getloadavg()[0], 2)
    spark = get_spark(app_name="pk-stream-throughput")
    spark.sparkContext.setLogLevel("ERROR")

    if args.regen or not os.path.exists(f"{args.sf1_dir}/_SCALED_OK"):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "bench_sf1",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_sf1.py"),
        )
        bench_sf1 = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench_sf1)
        bench_sf1.ensure_data(spark, args.regen)

    docs = spark.read.parquet(f"{args.sf1_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()

    work = tempfile.mkdtemp(prefix="pk_stream_tp_")
    landing = os.path.join(work, "landing")
    out = os.path.join(work, "marks")
    cp = os.path.join(work, "cp")
    # N equal-sized landing files + maxFilesPerTrigger=1 → N micro-batches:
    # the drain exercises N state-store commit cycles, not one giant batch.
    # Drops are ID-ASCENDING slices written sequentially (ascending file
    # mtimes → FileStreamSource processes them in id order), honoring the
    # operator's ingest contract ("arrival order wins — identical to the
    # batch form whenever ingest is id-ordered", streaming/stateful.py) so
    # the stream≡batch witness below is meaningful. 50k rows: the ntile
    # sort is measurement-harness cost, not part of the timed drain.
    from pyspark.sql.window import Window

    sliced = docs.withColumn(
        "__slice", F.ntile(args.batches).over(Window.orderBy("doc_id"))
    ).localCheckpoint(eager=True)
    for s in range(1, args.batches + 1):
        (
            sliced.filter(F.col("__slice") == s)
            .drop("__slice")
            .coalesce(1)
            .write.mode("append")
            .parquet(landing)
        )
        time.sleep(0.05)  # strictly increasing mtimes across drops

    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    # recentProgress retains only numRecentProgressUpdates events (default
    # 100) — raise it above the batch count so per_batch never silently
    # truncates for large --batches drains
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates",
        str(max(100, args.batches + 10)),
    )
    try:
        stream = file_stream(
            spark, landing, DOCS_SCHEMA, max_files_per_trigger=1
        )
        marks = near_dup_mark_stateful(stream, "doc_id", "text", k=2)
        t0 = time.time()
        q = (
            marks.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(1800)
        elapsed = time.time() - t0
        if not finished:
            q.stop()
            raise SystemExit("drain did not finish in 1800s")
        progress = [
            {
                "batch": p.batchId,
                "rows": p.numInputRows,
                "sec": round(p.batchDuration / 1000.0, 3),
            }
            for p in q.recentProgress
            if p.numInputRows
        ]
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    mark_rows = spark.read.parquet(out)
    # State rows = distinct (band, bkey) buckets the corpus registers (one
    # long each). Mark rows don't carry bkey (only the bucket's running-min
    # ref), so recount from the row-local band form — bit-identical keys.
    from pandemic_knowledge_spark.operators.dedup import band_rows_rowlocal

    state_rows = (
        band_rows_rowlocal(docs, "doc_id", "text", 2)
        .select("band", "bkey")
        .distinct()
        .count()
    )
    result = {
        "metric": "stream_near_dup_ingest",
        "provider": "rocksdb",
        "sf": 1,
        "n_docs": n_docs,
        "micro_batches": len(progress),
        "elapsed_sec": round(elapsed, 2),
        "docs_per_sec": round(n_docs / elapsed, 1),
        "mark_rows": mark_rows.count(),
        "state_buckets": state_rows,
        "checkpoint_state_bytes": _du(os.path.join(cp, "state")),
        "per_batch": progress,
        # start-side witness is the contention gate (the run's own 32
        # threads inflate the end-side one); both recorded
        "loadavg_1m_at_start": loadavg_start,
        "loadavg_1m_at_end": round(os.getloadavg()[0], 2),
    }

    if not args.skip_verify:
        streamed = near_dup_verdicts(mark_rows)
        batch = near_dup_mark(docs, "doc_id", "text")
        result["stream_equals_batch"] = (
            streamed.exceptAll(batch).isEmpty()
            and batch.exceptAll(streamed).isEmpty()
        )

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(result))
    # The witness is a GATE, not a footnote: a throughput number from a
    # wrong stream must not exit 0 (the record prints first so the failed
    # run's evidence survives for diagnosis).
    if result.get("stream_equals_batch") is False:
        raise SystemExit("stream_equals_batch FAILED — do not record this run")


if __name__ == "__main__":
    main()
