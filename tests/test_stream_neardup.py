"""Streaming LSH near-dup marking (stateful.near_dup_mark_stateful).

Pins the three load-bearing equivalences:
1. band_rows_rowlocal (the stream-capable HOF form) emits byte-identical
   (doc_id, band, bkey) rows to the batch agg form (_band_rows over
   minhash_base) — the signature math cannot desynchronize.
2. The stateful mark stream, rolled up with near_dup_verdicts, matches the
   batch operator near_dup_mark exactly — INCLUDING near-dups whose first
   occurrence arrived in an EARLIER micro-batch (state carries the bucket
   registry across batches).
3. Replays are idempotent: re-running the rollup over duplicated mark rows
   changes nothing (at-least-once sink safety).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from pandemic_knowledge_spark import tables
from pandemic_knowledge_spark.operators.dedup import (
    _band_rows,
    band_rows_rowlocal,
    minhash_base,
    near_dup_mark,
)
from pandemic_knowledge_spark.streaming import (
    file_stream,
    near_dup_mark_stateful,
    near_dup_verdicts,
)

DOCS_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

# A corpus whose near-dup structure crosses any batch split: 1/101 are
# near-identical (one token changed; verified to share band buckets 2 and 3
# under the engine's 16-perm/4-band constants), 2/102 identical (identical
# docs share ALL bands by construction), 3 and 103 unique, 4 too short for
# a 2-shingle (dropped by both forms).
_BASE = (
    "the quick brown fox jumps over the lazy dog in the morning light "
    "while birds sing softly near the quiet river bank and children play "
    "games outside happily"
)
_TEXTS = {
    1: _BASE,
    2: "counting rows is the core of analytics engines everywhere always",
    3: "completely unrelated text about spark structured streaming state",
    4: "tiny",
    101: _BASE.replace("happily", "loudly"),
    102: "counting rows is the core of analytics engines everywhere always",
    103: "another singleton document with its own distinct vocabulary set",
}


def _docs_df(spark, ids):
    return spark.createDataFrame(
        [(i, _TEXTS[i]) for i in ids], schema=DOCS_SCHEMA
    )


def test_rowlocal_band_rows_match_agg_form(spark, sf_dir):
    d = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    agg = _band_rows(minhash_base(d, "doc_id", "text", k=2))
    row_local = band_rows_rowlocal(d, "doc_id", "text", k=2)
    assert sorted(map(tuple, agg.collect())) == sorted(
        map(tuple, row_local.collect())
    )


def test_batch_mark_flags_known_dups(spark):
    d = _docs_df(spark, sorted(_TEXTS))
    out = {r.doc_id: r for r in near_dup_mark(d, "doc_id", "text").collect()}
    assert 4 not in out  # no shingles -> excluded, as in the oracle
    assert out[101].is_dup and out[101].first_ref == 1
    assert out[102].is_dup and out[102].first_ref == 2
    for i in (1, 2, 3, 103):
        assert not out[i].is_dup and out[i].first_ref == i


def test_null_id_docs_are_dropped(spark):
    """An id-less doc can't register in the bucket store: both forms drop
    it scan-side (a NaN id would poison the stateful kernel's int64
    running min; the batch form matches so stream ≡ batch holds)."""
    rows = [(None, _BASE), (1, _BASE), (101, _TEXTS[101])]
    d = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    out = {r.doc_id: r for r in near_dup_mark(d, "doc_id", "text").collect()}
    assert set(out) == {1, 101}
    assert out[101].is_dup and out[101].first_ref == 1
    b = band_rows_rowlocal(d, "doc_id", "text", 2)
    assert b.where(F.col("doc_id").isNull()).count() == 0


@pytest.mark.parametrize("split", ["one_batch", "cross_batch"])
def test_stream_matches_batch_across_microbatches(spark, tmp_path, split):
    """availableNow over an id-ordered landing dir: near-dups whose
    originals arrived in a previous micro-batch must still be marked."""
    landing = str(tmp_path / "landing")
    first, second = sorted(i for i in _TEXTS if i < 100), sorted(
        i for i in _TEXTS if i >= 100
    )
    if split == "one_batch":
        _docs_df(spark, first + second).coalesce(1).write.parquet(landing)
        max_files = None
    else:
        _docs_df(spark, first).coalesce(1).write.parquet(landing)
        _docs_df(spark, second).coalesce(1).write.mode("append").parquet(landing)
        max_files = 1  # two micro-batches; state must carry buckets over

    stream = file_stream(
        spark, landing, DOCS_SCHEMA, max_files_per_trigger=max_files
    )
    marks = near_dup_mark_stateful(stream, "doc_id", "text", k=2)
    out = str(tmp_path / "marks_out")
    q = (
        marks.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"

    mark_rows = spark.read.parquet(out)
    # one mark row per (doc, band), nothing pairwise
    n_docs_with_shingles = len(_TEXTS) - 1
    assert mark_rows.count() == 4 * n_docs_with_shingles

    streamed = near_dup_verdicts(mark_rows)
    batch = near_dup_mark(_docs_df(spark, sorted(_TEXTS)), "doc_id", "text")
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )

    # at-least-once safety: replaying every mark twice changes no verdict
    replayed = near_dup_verdicts(mark_rows.unionAll(mark_rows))
    assert sorted(map(tuple, replayed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_stream_matches_batch_on_testdata(spark, sf_dir, tmp_path):
    """Full sf documents table through the stateful path (single
    availableNow batch) == the batch operator — the catalog query's
    streaming twin on real data."""
    d = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    landing = str(tmp_path / "docs_landing")
    d.write.parquet(landing)
    stream = file_stream(spark, landing, DOCS_SCHEMA)
    marks = near_dup_mark_stateful(stream, "doc_id", "text", k=2)
    out = str(tmp_path / "docs_marks")
    q = (
        marks.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "docs_cp"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "stream did not finish in time"
    streamed = near_dup_verdicts(spark.read.parquet(out))
    batch = near_dup_mark(d, "doc_id", "text")
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_mark_is_partitioning_invariant(spark, sf_dir):
    """Verdicts are a pure function of the corpus — any physical layout
    gives identical rows (the min-based rollup has no order sensitivity)."""
    d = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    a = near_dup_mark(d.repartition(7), "doc_id", "text").collect()
    b = near_dup_mark(d.coalesce(1), "doc_id", "text").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_stream_under_rocksdb_state_store(spark, tmp_path):
    """The 100 TB state story names the RocksDB state store provider
    (state spills to disk instead of executor heap); prove the stateful
    op actually runs under it — same cross-batch corpus, same verdicts."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        landing = str(tmp_path / "landing")
        first = sorted(i for i in _TEXTS if i < 100)
        second = sorted(i for i in _TEXTS if i >= 100)
        _docs_df(spark, first).coalesce(1).write.parquet(landing)
        _docs_df(spark, second).coalesce(1).write.mode("append").parquet(landing)
        stream = file_stream(spark, landing, DOCS_SCHEMA, max_files_per_trigger=1)
        marks = near_dup_mark_stateful(stream, "doc_id", "text", k=2)
        out = str(tmp_path / "marks_out")
        q = (
            marks.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish in time"
        streamed = near_dup_verdicts(spark.read.parquet(out))
        batch = near_dup_mark(_docs_df(spark, sorted(_TEXTS)), "doc_id", "text")
        assert sorted(map(tuple, streamed.collect())) == sorted(
            map(tuple, batch.collect())
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_checkpoint_restart_resumes_state(spark, tmp_path):
    """The production restart path: the stream STOPS after the first
    corpus drop (availableNow run 1 drains and terminates), more docs
    land, and a brand-new query with the SAME checkpoint picks up — the
    bucket registry must come back from the state store, so a doc whose
    near-dup original arrived before the restart is still marked, and
    already-processed docs are not re-emitted."""
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "marks_out")
    cp = str(tmp_path / "cp")
    first = sorted(i for i in _TEXTS if i < 100)
    second = sorted(i for i in _TEXTS if i >= 100)

    def run_once():
        stream = file_stream(spark, landing, DOCS_SCHEMA)
        marks = near_dup_mark_stateful(stream, "doc_id", "text", k=2)
        q = (
            marks.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish in time"

    _docs_df(spark, first).coalesce(1).write.parquet(landing)
    run_once()
    n_first = spark.read.parquet(out).count()
    assert n_first == 4 * 3  # docs 1,2,3 (4 has no shingles)

    _docs_df(spark, second).coalesce(1).write.mode("append").parquet(landing)
    run_once()  # NEW query object, SAME checkpoint: state must restore

    mark_rows = spark.read.parquet(out)
    # run 2 emitted only the second drop's marks — no reprocessing
    assert mark_rows.count() == 4 * 6
    streamed = near_dup_verdicts(mark_rows)
    batch = near_dup_mark(_docs_df(spark, sorted(_TEXTS)), "doc_id", "text")
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )
    # the cross-RESTART near-dups specifically: originals arrived pre-stop
    v = {r.doc_id: r for r in streamed.collect()}
    assert v[101].is_dup and v[101].first_ref == 1
    assert v[102].is_dup and v[102].first_ref == 2
