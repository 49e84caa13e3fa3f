"""Physical-plan shape assertions (SURVEY.md §4, the 100 TB design gates).

Correctness tests prove the numbers match; these prove the PLANS are the
ones that survive scale: dimension joins broadcast instead of shuffling the
fact side, filters and projections reach the parquet scan, and the
relational core never drops into per-row Python. A regression here means a
plan silently degraded even though results still match.
"""

from __future__ import annotations

import re

import pytest

from pandemic_knowledge_spark.plans.catalog import REGISTRY

PY_EVAL_NODES = ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas")


def plan_of(spark, sf_dir, name: str) -> str:
    return REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def pushed_filters(plan: str) -> str:
    return " | ".join(m.group(1) for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan))


def test_q5_dims_broadcast_not_shuffled(spark, sf_dir):
    """J1 at scale: every dimension side of q5 is a broadcast hash join —
    the fact table is never shuffled for a lookup."""
    plan = plan_of(spark, sf_dir, "q5_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_q5_filter_pushdown_reaches_scan(spark, sf_dir):
    """The region predicate lands in the parquet scan, not a post-scan
    Filter — partition/row-group pruning territory at 100 TB."""
    pf = pushed_filters(plan_of(spark, sf_dir, "q5_region_revenue"))
    assert "EqualTo(r_name,ASIA)" in pf
    assert "GreaterThanOrEqual(o_orderdate" in pf


def test_q1_scan_prunes_columns_and_pushes_dates(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    assert "LessThan(l_shipdate" in pushed_filters(plan)
    # column pruning: untouched wide columns never leave the scan
    assert "l_comment" not in plan
    assert "l_shipinstruct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_region_revenue",
        "dedup_minhash_lsh",
        "text_search_bm25",
        "knn_cosine_topk",
        "window_running_revenue",
        "stream_tumbling_hourly",
    ],
)
def test_hot_path_has_no_python_eval(spark, sf_dir, name):
    """UDF policy (SURVEY.md §2.12): the relational/dedup/search/vector hot
    paths are pure JVM expressions — per-row Python appears nowhere."""
    plan = plan_of(spark, sf_dir, name)
    for node in PY_EVAL_NODES:
        assert node not in plan, f"{name} fell back to {node}"


def test_multimodal_is_arrow_batched_python(spark, sf_dir):
    """The one place Python is allowed (binary decode) goes through Arrow
    mapInPandas batches, never row-at-a-time eval."""
    plan = plan_of(spark, sf_dir, "multimodal_media_features")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_dedup_candidate_join_is_equi_join(spark, sf_dir):
    """LSH candidate generation must be an equi-join on (band, bkey) —
    a cartesian/BNL join here would be the O(n²) cliff at scale."""
    plan = plan_of(spark, sf_dir, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q4_exists_plans_as_semi_join_on_pruned_key(spark, sf_dir):
    """EXISTS compiles to LeftSemi and the probe-side scan carries only the
    key + pushed returnflag filter — never a join+distinct over whole rows."""
    plan = plan_of(spark, sf_dir, "q4_priority_exists")
    assert "LeftSemi" in plan
    assert "EqualTo(l_returnflag,R)" in pushed_filters(plan)
    assert "l_extendedprice" not in plan  # key-only probe side


def test_q10_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    """orderBy.limit(20) must plan as TakeOrderedAndProject (per-partition
    heap + driver merge); a global Sort would shuffle every group at scale."""
    plan = plan_of(spark, sf_dir, "q10_returned_revenue")
    assert "TakeOrderedAndProject" in plan


def test_q17_subquery_is_decorrelated(spark, sf_dir):
    """The correlated scalar subquery must decorrelate into an aggregate +
    join; a per-row subquery re-scan would be quadratic in the fact table."""
    plan = plan_of(spark, sf_dir, "q17_small_qty_revenue")
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
