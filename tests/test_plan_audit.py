"""Pin the plan-audit detectors (scripts/plan_audit.py) against deliberate
plans, so the audit's "every flag empty" claim can't go vacuous again (a
first version scanned the plan text in the wrong direction — parents print
ABOVE children — and missed MapInPandas entirely)."""

from __future__ import annotations

import importlib.util
import os
import re

from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SPEC = importlib.util.spec_from_file_location(
    "plan_audit",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "plan_audit.py"),
)
plan_audit = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(plan_audit)

SORT_PAT = r"\bSort\b[^\n]*\n\s*(?::|\+)- Exchange SinglePartition"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_single_partition_sort_detector(spark):
    df = spark.range(100).withColumn("v", F.col("id") % 7)
    bad = df.withColumn("rn", F.row_number().over(Window.orderBy("v")))
    assert re.search(SORT_PAT, _plan(bad)), "unpartitioned window must fire"
    good = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("v").orderBy("id"))
    )
    assert not re.search(SORT_PAT, _plan(good))
    topk = df.orderBy("v").limit(5)
    assert not re.search(SORT_PAT, _plan(topk)), "top-k plans no exchange"


def test_arrow_node_regex_sees_map_in_pandas(spark):
    df = spark.range(10).withColumn("v", F.col("id") * 2)

    def ident(it):
        for pdf in it:
            yield pdf

    mapped = df.mapInPandas(ident, schema="id long, v long")
    plan = _plan(mapped)
    assert re.search(plan_audit.ARROW_NODE_RE, plan), (
        "mapInPandas must be visible to the audit: " + plan.splitlines()[0]
    )


def test_shuffle_count_excludes_broadcast_and_reuse(spark):
    big = spark.range(1000).withColumn("k", F.col("id") % 13)
    small = spark.range(13).withColumnRenamed("id", "k")
    joined = big.join(F.broadcast(small), "k").groupBy("k").count()
    plan = _plan(joined)
    n = 0
    for line in plan.splitlines():
        if "ReusedExchange" in line:
            continue
        if re.search(
            r"\bExchange (hashpartitioning|rangepartitioning"
            r"|SinglePartition|RoundRobinPartitioning)",
            line,
        ):
            n += 1
    assert "BroadcastExchange" in plan
    assert n == 1, f"one shuffle (the groupBy), broadcasts excluded: {n}"


def test_mini_planted_ivf_recall_is_perfect(spark, tmp_path):
    """The BASELINE ANN claim as an invariant: on a clustered corpus, IVF
    with cells = the true clusters recalls the exact top-k in full while
    scanning ~nprobe/cells of the corpus (every true neighbor lives in the
    query's cluster, whose centroid is nearest). Mini corpus: 8 clusters
    x 25 vectors, 16-dim, deterministic — no RNG."""
    import math

    from pandemic_knowledge_spark.operators.similarity import (
        ivf_topk,
        knn_brute_force,
        rp_hyperplanes,
    )

    dim, n_clusters, per = 16, 8, 25
    centers = rp_hyperplanes(dim, n_clusters, seed=9007)
    rows = []
    vid = 0
    for c in range(n_clusters):
        for i in range(per):
            noise = rp_hyperplanes(dim, 1, seed=10_000 + vid)[0]
            v = [centers[c][d] + 0.25 * noise[d] for d in range(dim)]
            nrm = math.sqrt(sum(x * x for x in v))
            rows.append((vid, [x / nrm for x in v], c))
            vid += 1
    emb = spark.createDataFrame(
        rows, schema="vec_id long, embedding array<float>, label int"
    ).cache()
    hits = total = 0
    for q_vid in (3, 60, 137, 199):
        qvec = [float(x) for x in rows[q_vid][1]]
        exact = {r.vec_id for r in knn_brute_force(
            emb, "embedding", "vec_id", qvec, k=10).collect()}
        approx = {r.vec_id for r in ivf_topk(
            emb, "embedding", "vec_id", "label", qvec, k=10, nprobe=2
        ).collect()}
        hits += len(exact & approx)
        total += 10
    assert hits == total, f"IVF recall on clustered corpus: {hits}/{total}"


def test_tokenize_per_position_detector(spark):
    """The r10 pathology signature — element_at over an UNMATERIALIZED
    tokenize — must fire on a deliberately bad plan and stay silent on the
    fixed positional scorers (materialized token column)."""
    from pandemic_knowledge_spark.functions.text import tokenize
    from pandemic_knowledge_spark.operators.search import span_near_search

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a")], "doc_id long, text string"
    )
    toks = tokenize("text")  # inline expression, NOT a column
    bad = docs.select(
        F.filter(
            F.sequence(F.lit(1), F.size(toks)),
            lambda i: F.element_at(toks, i.cast("int")) == F.lit("a"),
        ).alias("hits")
    )
    assert "element_at(regexp_extract_all(" in _plan(bad)
    good = span_near_search(docs, "doc_id", "text", "a b", slop=1, k=5)
    assert "element_at(regexp_extract_all(" not in _plan(good)
