"""Catalog-wide physical-plan audit.

tests/test_plan_shape.py pins the load-bearing plans (broadcasts, pushdown,
no-Python, explicit exchanges); this sweeps ALL catalog queries for the
anti-patterns the targeted gates don't cover:

- row-wise Python in any plan (BatchEvalPython) — banned everywhere
- Arrow Python nodes outside the operators documented to use them
- CartesianProduct / BroadcastNestedLoopJoin — accidental cross joins
- global single-partition sorts (Exchange SinglePartition followed by Sort)
  that aren't a final top-k/limit
- exchange counts per query (distribution recorded; outliers listed)

Usage: python scripts/plan_audit.py [--sf-dir /root/testdata/sf0.01]
Prints one JSON line with per-flag offender lists + exchange histogram.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandemic_knowledge_spark.plans import REGISTRY
from pandemic_knowledge_spark.session import get_spark

# Operators DOCUMENTED to run grouped/cogrouped/mapped Arrow kernels
# (multimodal decode, bin packing, the near-dup pair kernel) — Arrow nodes
# there are the design, not a finding.
ARROW_OK = {
    "multimodal_byte_stats",
    "multimodal_media_features",
    "pack_training_bins",
    "emb_near_dup_pairs",
    "dedup_semantic_clusters",
    # r6: PQ code assignment is a documented mapInPandas kernel — the m·k
    # interpreted-HOF argmin measured 22 s at sf0.01 for m=8/k=64; the
    # vectorized int64 numpy argmin is bit-identical (similarity.py).
    "ann_pq_topk",
}

# Every Arrow-batched Python node Spark can plan — including MapInPandas
# (the multimodal form) and the windowed/aggregating variants; the audit
# must see them all or ARROW_OK is a dead letter.
ARROW_NODE_RE = (
    r"ArrowEvalPython|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas"
    r"|MapInPandas|AggregateInPandas|WindowInPandas|PythonMapInArrow"
)

# Queries DOCUMENTED to sort on one partition because the sorted side is
# provably bounded (not fact-sized): the quantile walk runs over the
# MERGED decimal-bucket histogram — a few thousand rows regardless of
# corpus size (operators/sketches.py::quantiles_over docstring).
SINGLE_SORT_OK = {"sketch_quantile_rollup"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_spark(app_name="pk-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    flags: dict[str, list] = {
        "python_row_wise": [],
        "arrow_unexpected": [],
        "cartesian_product": [],
        "bnlj_multiple": [],  # >1 nested-loop join: not the scalar pattern
        "global_single_partition_sort": [],
        # The r10 find: positional access straight off an UNMATERIALIZED
        # tokenize — element_at(regexp_extract_all(...)) — re-runs the
        # regex per position accessed (HOF lambda bodies sit outside CSE;
        # a pushed-down computed-column predicate re-inlines the array
        # expression). The 6-20× pathology fixed in the positional
        # scorers. Healthy plans tokenize into a materialized column and
        # element_at the attribute.
        "tokenize_per_position": [],
        "errored": [],
    }
    exchange_counts: dict[str, int] = {}
    scalar_bnlj = 0  # exactly one BNLJ = one-row stats broadcast (by design:
    # corpus totals / thresholds joined keylessly; build side is one row)
    multi_tokenize_filters: list = []  # reported, not flagged (see below)

    for name, spec in REGISTRY.items():
        try:
            df = spec.fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - audit must survive any query
            flags["errored"].append([name, str(e).splitlines()[0][:120]])
            continue
        if "BatchEvalPython" in plan:
            flags["python_row_wise"].append(name)
        if name not in ARROW_OK and re.search(ARROW_NODE_RE, plan):
            flags["arrow_unexpected"].append(name)
        if "CartesianProduct" in plan:
            flags["cartesian_product"].append(name)
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        if n_bnlj == 1:
            scalar_bnlj += 1
        elif n_bnlj > 1:
            flags["bnlj_multiple"].append(name)
        # A Sort whose DIRECT CHILD is a single-partition exchange — the
        # unpartitioned-window / sort-everything-on-one-task smell the
        # ranks/ntile rewrites exist to avoid. Plan text prints parents
        # above children, so the pattern is a Sort line immediately
        # followed by its "+- Exchange SinglePartition" child line.
        # (TakeOrderedAndProject — the healthy top-k — plans no exchange
        # and never matches.)
        if name not in SINGLE_SORT_OK and re.search(
            r"\bSort\b[^\n]*\n\s*(?::|\+)- Exchange SinglePartition", plan
        ):
            flags["global_single_partition_sort"].append(name)
        # HARD flag: per-position tokenize (see flag comment above).
        # Softer smell, reported not flagged: a Filter evaluating the
        # tokenizer k>=2 times per row (pushed-down computed-column
        # predicates) — linear, k× scan-side regex, tracked so k can't
        # silently grow.
        if "element_at(regexp_extract_all(" in plan:
            flags["tokenize_per_position"].append(name)
        for line in plan.splitlines():
            # node label = first word after the tree-drawing prefix; the
            # prefix may stack any number of ':'/'+'/'-' branch tokens
            # plus a '*(n)' codegen id (an earlier anchored regex missed
            # every Filter nested under a ':' branch — r10 review find)
            if re.match(r"[\s:+\-*()\d]*Filter\b", line) and (
                line.count("regexp_extract_all") >= 2
            ):
                multi_tokenize_filters.append(
                    [name, line.count("regexp_extract_all")]
                )
                break
        # Count SHUFFLE exchanges only: broadcasts move dims by design and
        # ReusedExchange re-prints its target's description per reference —
        # neither belongs in a shuffle distribution.
        n_ex = 0
        for line in plan.splitlines():
            if "ReusedExchange" in line:
                continue
            if re.search(
                r"\bExchange (hashpartitioning|rangepartitioning"
                r"|SinglePartition|RoundRobinPartitioning)",
                line,
            ):
                n_ex += 1
        exchange_counts[name] = n_ex

    hist: dict[str, int] = {}
    for n in exchange_counts.values():
        b = str(n) if n < 8 else "8+"
        hist[b] = hist.get(b, 0) + 1
    top = sorted(exchange_counts.items(), key=lambda kv: -kv[1])[:8]
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "plan_audit",
                "n_queries": len(REGISTRY),
                "flags": flags,
                "scalar_bnlj_queries": scalar_bnlj,
                "multi_tokenize_filters": multi_tokenize_filters,
                "exchange_histogram": dict(sorted(hist.items())),
                "most_exchanges": top,
            }
        )
    )


if __name__ == "__main__":
    main()
