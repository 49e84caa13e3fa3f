"""ANN recall evaluation: recall@k of the approximate tiers vs brute force.

The catalog proves the ANN operators' *determinism* (each hash-matches a
DuckDB oracle that replays the same algorithm); this script measures their
*quality* — the number the FAISS-style tiers are actually traded on:

    recall@k = |approx_topk ∩ exact_topk| / k, averaged over query vectors

plus the scan fraction (candidate rows / corpus rows), the cost side of the
trade. Queries are corpus vectors sampled deterministically (md5 order), so
the run is reproducible; ground truth is knn_brute_force on the full table.

Usage: python scripts/ann_recall.py [--sf-dir /root/testdata/sf0.1]
                                    [--queries 24] [--k 10]
Prints one JSON line; results are recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import functions as F

from pandemic_knowledge_spark.operators.similarity import (
    ivf_topk,
    ivfpq_topk,
    knn_brute_force,
    pq_topk,
    rp_bucket_col,
    rp_hyperplanes,
    rp_lsh_topk,
    rp_python_bucket,
    _probe_cells,
)
from pandemic_knowledge_spark.session import get_spark
from pandemic_knowledge_spark.tables import load


def sample_queries(emb, n: int) -> list[tuple[int, list[float]]]:
    rows = (
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(n)
        .collect()
    )
    return [(r.vec_id, [float(x) for x in r.embedding]) for r in rows]


def ids_of(df) -> set[int]:
    return {r[0] for r in df.select(df.columns[0]).collect()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", type=int, default=24)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nprobe", type=int, default=2)
    ap.add_argument("--lsh-bits", type=int, default=4)
    args = ap.parse_args()

    spark = get_spark(app_name="pk-ann-recall")
    emb = load(spark, args.sf_dir, "embeddings").cache()
    n_corpus = emb.count()
    n_cells = emb.select("label").distinct().count()
    dim = len(emb.select("embedding").first()[0])
    queries = sample_queries(emb, args.queries)

    # scan fractions are query-independent aggregates, computed once:
    # IVF scans nprobe/n_cells of a balanced corpus; LSH scans its bucket.
    planes = rp_hyperplanes(dim, args.lsh_bits)
    bucket_sizes = {
        r.b: r.c
        for r in emb.groupBy(
            rp_bucket_col(F.col("embedding"), planes).alias("b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    cell_sizes = {
        r.label: r.c
        for r in emb.groupBy("label").agg(F.count(F.lit(1)).alias("c")).collect()
    }

    methods = {
        "ivf": lambda q: ivf_topk(
            emb, "embedding", "vec_id", "label", q, k=args.k, nprobe=args.nprobe
        ),
        "rp_lsh": lambda q: rp_lsh_topk(
            emb, "embedding", "vec_id", q, k=args.k, n_bits=args.lsh_bits
        ),
        "pq": lambda q: pq_topk(emb, "embedding", "vec_id", q, top_k=args.k),
        "ivfpq": lambda q: ivfpq_topk(
            emb, "embedding", "vec_id", "label", q, top_k=args.k,
            nprobe=args.nprobe,
        ),
    }

    recalls: dict[str, list[float]] = {m: [] for m in methods}
    scanned: dict[str, list[float]] = {m: [] for m in methods}
    t0 = time.time()
    for _vid, qvec in queries:
        exact = ids_of(knn_brute_force(emb, "embedding", "vec_id", qvec, k=args.k))
        probed_cells = {
            r.cell
            for r in _probe_cells(
                emb, "embedding", "label", qvec, args.nprobe
            ).select(F.col("label").alias("cell")).distinct().collect()
        }
        ivf_rows = sum(cell_sizes[c] for c in probed_cells)
        lsh_rows = bucket_sizes.get(rp_python_bucket(qvec, planes), 0)
        frac = {
            "ivf": ivf_rows / n_corpus,
            "rp_lsh": lsh_rows / n_corpus,
            "pq": 1.0,  # ADC ranks every code — scans codes, not vectors
            "ivfpq": ivf_rows / n_corpus,
        }
        for m, fn in methods.items():
            got = ids_of(fn(qvec))
            recalls[m].append(len(got & exact) / args.k)
            scanned[m].append(frac[m])

    out = {
        "metric": "ann_recall_at_k",
        "sf_dir": args.sf_dir,
        "n_corpus": n_corpus,
        "n_cells": n_cells,
        "dim": dim,
        "k": args.k,
        "n_queries": len(queries),
        "nprobe": args.nprobe,
        "lsh_bits": args.lsh_bits,
        "elapsed_sec": round(time.time() - t0, 1),
        "recall": {
            m: round(sum(v) / len(v), 4) for m, v in recalls.items()
        },
        "scan_fraction": {
            m: round(sum(v) / len(v), 4) for m, v in scanned.items()
        },
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
