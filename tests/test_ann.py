"""Multi-table sign-LSH (similarity.rp_lsh_topk_multi).

The single-table tier's recall ceiling is a bucket-membership coin flip per
query (measured in scripts/ann_recall.py / BASELINE.md); the multi-table
tier buys recall with extra tables. These tests pin the structural
contracts the eval relies on: table 0 is the single-table bucket (so the
candidate set only grows), n_tables=1 IS the single-table tier, and the
candidate predicate stays a scan-side filter (no shuffle, no Python).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pandemic_knowledge_spark import tables
from pandemic_knowledge_spark.operators.similarity import (
    RP_SEED,
    rp_bucket_col,
    rp_hyperplanes,
    rp_lsh_topk,
    rp_lsh_topk_multi,
    rp_multi_table_pred,
    rp_python_bucket,
)

QUERY = [0.25, -0.125, 0.5] * 21 + [0.0625]  # 64-dim, exact binary floats


def _emb(spark, sf_dir):
    return tables.load(spark, sf_dir, "embeddings")


def test_one_table_is_single_table_tier(spark, sf_dir):
    e = _emb(spark, sf_dir)
    single = rp_lsh_topk(e, "embedding", "vec_id", QUERY, k=10, n_bits=4)
    multi1 = rp_lsh_topk_multi(
        e, "embedding", "vec_id", QUERY, k=10, n_bits=4, n_tables=1
    )
    assert [tuple(r) for r in single.collect()] == [
        tuple(r) for r in multi1.collect()
    ]


def test_candidates_grow_monotonically_with_tables(spark, sf_dir):
    e = _emb(spark, sf_dir)
    prev_ids: set[int] = set()
    prev_n = 0
    for t in (1, 2, 4):
        pred = rp_multi_table_pred("embedding", QUERY, 4, t)
        ids = {r.vec_id for r in e.filter(pred).select("vec_id").collect()}
        assert ids >= prev_ids  # superset: each table only adds candidates
        assert len(ids) >= prev_n
        prev_ids, prev_n = ids, len(ids)
    # table 0 alone is the single-table bucket
    planes = rp_hyperplanes(len(QUERY), 4, seed=RP_SEED)
    qb = rp_python_bucket(QUERY, planes)
    single_ids = {
        r.vec_id
        for r in e.filter(
            rp_bucket_col(F.col("embedding"), planes) == F.lit(qb)
        )
        .select("vec_id")
        .collect()
    }
    assert single_ids <= prev_ids


def test_tables_are_independent(spark):
    """Different seeds must give different hyperplanes — otherwise extra
    tables add scan cost and zero recall."""
    p0 = rp_hyperplanes(64, 4, seed=RP_SEED)
    p1 = rp_hyperplanes(64, 4, seed=RP_SEED + 1)
    assert p0 != p1


def test_multi_pred_is_scan_side(spark, sf_dir):
    """The OR-of-buckets candidate filter must stay a codegen scan filter:
    no exchange before the filter, no Python eval anywhere."""
    e = _emb(spark, sf_dir)
    df = rp_lsh_topk_multi(
        e, "embedding", "vec_id", QUERY, k=10, n_bits=4, n_tables=4
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scan -> filter -> TakeOrdered, no shuffle
    for node in ("BatchEvalPython", "ArrowEvalPython"):
        assert node not in plan
