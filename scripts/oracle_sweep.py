"""Full-registry DuckDB oracle sweep under a PLAIN SparkSession.

Replicates the round driver's CORRECTNESS gate over EVERY registered
query (not just the 50-row window): run queries()[name] at the given
SF dir, compare against oracle_sql()[name] via tests.oracle_harness
(sorted columns, order-insensitive rowset, bit-exact floats).

Usage: python scripts/oracle_sweep.py [sf_dir] [--names n1,n2] [--out file.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--names", default="")
    ap.add_argument("--out", default="/tmp/oracle_sweep.json")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # Plain session on purpose: the driver does NOT use session.get_spark().
    spark = SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs, osql = mod.queries(), mod.oracle_sql()

    from tests.oracle_harness import compare_query

    names = [n for n in args.names.split(",") if n] or list(qs)
    results: dict[str, dict] = {}
    n_red = 0
    t_start = time.time()
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            problems, nrows = compare_query(spark, args.sf_dir, qs[name], osql[name])
            results[name] = {
                "ok": not problems,
                "problems": problems,
                "rows": nrows,
                "sec": round(time.time() - t0, 2),
            }
        except Exception as e:  # noqa: BLE001
            results[name] = {
                "ok": False,
                "problems": [f"EXCEPTION: {e!r}"],
                "trace": traceback.format_exc()[-2000:],
                "sec": round(time.time() - t0, 2),
            }
        if not results[name]["ok"]:
            n_red += 1
            print(f"RED  {name}: {results[name]['problems'][:1]}", flush=True)
        if (i + 1) % 25 == 0:
            print(
                f"... {i + 1}/{len(names)} ({n_red} red, "
                f"{round(time.time() - t_start)}s)",
                flush=True,
            )
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(
        json.dumps(
            {
                "total": len(names),
                "red": n_red,
                "sec": round(time.time() - t_start, 1),
                "out": args.out,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
