"""Decontamination (operators/decontamination.py): planted eval leakage is
flagged, clean docs are not, and unsignable docs produce no row. Oracle
parity is covered by catalog:`decontaminate_train_split`."""

from __future__ import annotations

from pyspark.sql.types import LongType, StringType, StructField, StructType

from pandemic_knowledge_spark.operators.decontamination import contamination_report

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

EVAL_TEXT = "the quick brown fox jumps over the lazy dog tonight"


def test_planted_leak_is_flagged_clean_is_not(spark):
    train = spark.createDataFrame(
        [
            (1, EVAL_TEXT + " again and again"),        # heavy overlap → flagged
            (2, "completely unrelated words nothing shared here at all"),
            (3, "short"),                                # unsignable → no row
        ],
        SCHEMA,
    )
    ev = spark.createDataFrame([(100, EVAL_TEXT)], SCHEMA)
    rep = {r.doc_id: r for r in contamination_report(train, ev, "doc_id", "text").collect()}
    assert set(rep) == {1, 2}  # doc 3 has no shingles, no row
    assert rep[1].contaminated and rep[1].overlap_frac > 0.5
    assert not rep[2].contaminated and rep[2].n_hits == 0
    # counts are over DISTINCT shingles: frac is a true containment in [0,1]
    assert 0.0 <= rep[1].overlap_frac <= 1.0
    assert rep[1].n_hits <= rep[1].n_shingles
