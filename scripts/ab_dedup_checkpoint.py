"""Paired A/B: dedup-family lazy vs eager localCheckpoint (r13 verdict
item 3 — the one touched family where no independent sample showed the
r13 lazy flip neutral-or-better).

One invocation = ONE mode (the files are flipped by the driver loop in
scripts/ab_dedup_checkpoint.sh-style usage below): warm the queries
twice, then report median-of-3 cache-cleared collect() seconds per query.
Interleave modes across invocations (L E L E ...) so box drift lands on
both arms equally; compare PAIRED medians.

Usage: python scripts/ab_dedup_checkpoint.py [--sf-dir ...] [--names a,b]
Prints one JSON line {"mode_witness": ..., "queries": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_NAMES = (
    "dedup_minhash_lsh,dedup_winnow_pairs,dedup_substring_spans,"
    "decontaminate_train_split"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--names", default=DEFAULT_NAMES)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    # Witness which mode the source is actually in (the driver loop seds
    # the files before spawning us) — guards against a stale flip.
    src = open(
        os.path.join(REPO, "pandemic_knowledge_spark", "operators", "dedup.py")
    ).read()
    n_lazy = len(re.findall(r"localCheckpoint\(eager=False\)", src))
    n_eager = len(re.findall(r"localCheckpoint\(eager=True\)", src))

    from pandemic_knowledge_spark.plans import REGISTRY
    from pandemic_knowledge_spark.session import get_spark

    spark = get_spark(app_name="pk-ab-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n in args.names.split(",") if n]
    spark.range(1000).selectExpr("sum(id)").collect()
    for _ in range(2):
        for name in names:
            spark.catalog.clearCache()
            REGISTRY[name].fn(spark, args.sf_dir).collect()
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.runs):
        for name in names:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, args.sf_dir).collect()
            runs[name].append(time.perf_counter() - t0)
    out = {
        "dedup_lazy_sites": n_lazy,
        "dedup_eager_sites": n_eager,
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "queries": {
            n: round(sorted(ts)[len(ts) // 2], 3) for n, ts in runs.items()
        },
    }
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    sys.stdout.flush()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
