"""sf3 asymptotics spot-check: 30× sf0.1, the scale-tier representatives.

The sf1 tables in BASELINE.md prove 10× behavior; this script stretches the
same derivation to 30 key-shifted copies and times the operators whose
SCALE TIERS carry the 100 TB story (LSH banding, capped winnow postings,
gram-hash substring spans, the adaptive-band correlation sketch, the Arrow
near-dup grid, rank-targeted percentiles, partitioned ntile, fused-round
PageRank). A healthy entry grows ~linearly vs its sf1 number; superlinear
growth here is the earliest local warning a tier has a hidden frontier
(exactly how the r5 sweep caught the correlation band-key and Jaccard
aggregate issues at 10×).

Usage: python scripts/bench_sf3.py [--regen]   # prints one JSON line
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])

import time

import bench_sf1

QUERIES = [
    "dedup_minhash_lsh",
    "dedup_winnow_pairs",
    "dedup_substring_spans",
    "timeseries_corr_topk",
    "emb_near_dup_pairs",
    "dedup_semantic_clusters",
    "agg_percentile_quantity",
    "retail_rfm_segments",
    "graph_trade_pagerank",
    "q1_pricing_summary",
    # r6 additions whose sf1 cost was non-trivial — stretch their shapes:
    "sample_dsir_rank",        # bigram-bucket models (3.7 s at sf1)
    "dedup_ngram_containment", # exact pair core, ΣC(df,2) contract (8.2 s)
    "search_more_like_this",   # TF shuffle + broadcast term scoring
    "search_fuzzy_match",      # r7: TF shuffle + banded levenshtein (3.1 s at sf1)
]


def main() -> None:
    from pandemic_knowledge_spark.plans import REGISTRY
    from pandemic_knowledge_spark.session import get_spark

    global QUERIES
    if "--only" in sys.argv:  # targeted probe: --only name1,name2
        i = sys.argv.index("--only") + 1
        if i >= len(sys.argv) or sys.argv[i].startswith("--") or not sys.argv[i]:
            raise SystemExit("--only needs a comma-separated query list")
        QUERIES = sys.argv[i].split(",")
        unknown = [n for n in QUERIES if n not in REGISTRY]
        if unknown:
            raise SystemExit(f"--only: unknown queries {unknown}")
    n_runs = 2
    if "--runs" in sys.argv:  # e.g. --runs 3: the min-of-3 re-measure protocol
        n_runs = int(sys.argv[sys.argv.index("--runs") + 1])
    bench_sf1.DST = "/tmp/pk_sf3"
    bench_sf1.COPIES = 30
    spark = get_spark(app_name="pk-bench-sf3")
    spark.sparkContext.setLogLevel("ERROR")
    bench_sf1.ensure_data(spark, "--regen" in sys.argv)

    spark.range(1000).selectExpr("sum(id)").collect()
    for name in QUERIES:  # one settling pass
        spark.catalog.clearCache()
        REGISTRY[name].fn(spark, bench_sf1.DST).collect()
    runs = {name: [] for name in QUERIES}
    for _ in range(n_runs):
        for name in QUERIES:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, bench_sf1.DST).collect()
            runs[name].append(time.perf_counter() - t0)
    timings = {name: round(min(ts), 3) for name, ts in runs.items()}
    print(
        json.dumps(
            {
                "metric": "sf3_asymptotics_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": 3.0,
                "derived_from": "sf0.1 x30 key-shifted copies",
                "protocol": f"steady_state_min_of_{n_runs}_cache_cleared",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
