"""ANN recall evaluation: recall@k of the approximate tiers vs brute force.

The catalog proves the ANN operators' *determinism* (each hash-matches a
DuckDB oracle that replays the same algorithm); this script measures their
*quality* — the number the FAISS-style tiers are actually traded on:

    recall@k = |approx_topk ∩ exact_topk| / k, averaged over query vectors

plus the scan fraction (candidate rows / corpus rows), the cost side of the
trade. Queries are corpus vectors sampled deterministically (md5 order), so
the run is reproducible; ground truth is knn_brute_force on the full table.

Two corpora, because recall is a property of DATA STRUCTURE as much as of
the index: the raw testdata embeddings are uniform random unit vectors
(measured: within-label mean cosine 1.8e-5 vs 1.3e-5 across — labels carry
zero geometric signal), where information theory caps any pruned method at
recall ≈ scan_fraction (+ the self-hit) and full-scan PQ at the quantization
noise floor. The 'planted' corpus re-derives the same vectors around
deterministic per-label centers (v' = normalize(center[label] + a·v),
within-cluster cosine ≈ 1/(1+a²)), the regime real text/image embeddings
live in — there the tiers must approach recall 1.0 while still scanning a
fraction. Reporting both shows the operators are correct AND that the
uniform numbers are the data's fault, not the index's.

Usage: python scripts/ann_recall.py [--sf-dir /root/testdata/sf0.1]
                                    [--queries 24] [--k 10] [--alpha 0.7]
Prints one JSON line; results are recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pandemic_knowledge_spark.operators.similarity import (
    PQ_K,
    PQ_M,
    ivf_topk,
    ivfpq_topk,
    knn_brute_force,
    pq_topk,
    rp_bucket_col,
    rp_hyperplanes,
    rp_lsh_topk,
    rp_lsh_topk_multi,
    rp_multi_table_pred,
    rp_python_bucket,
    _probe_cells,
)
from pandemic_knowledge_spark.session import get_spark
from pandemic_knowledge_spark.tables import load


PLANT_SEED_OFFSET = 1000  # centers MUST be disjoint from every LSH table's
# planes (tables seed at RP_SEED..RP_SEED+T-1): if a center IS a plane h_j,
# dot(v', h_j) = |h_j| + a·dot(v, h_j) > 0 for every member of that cluster,
# deterministically fixing LSH bit j and inflating LSH recall for free.


def planted_corpus(spark, emb, alpha: float, out_dir: str):
    """Derive a clustered corpus from the uniform one: same ids/labels,
    vectors pulled toward a deterministic per-label center (rp_hyperplanes
    reused as the center source — md5-seeded, no RNG, at a seed offset
    disjoint from the LSH tables under evaluation). Written to parquet so
    the eval reads the same scan shape as the raw table."""
    import numpy as np

    from pandemic_knowledge_spark.operators.similarity import RP_SEED

    rows = emb.select("vec_id", "embedding", "label").collect()
    dim = len(rows[0].embedding)
    n_labels = 1 + max(r.label for r in rows)
    centers = np.array(
        rp_hyperplanes(dim, n_labels, seed=RP_SEED + PLANT_SEED_OFFSET),
        dtype=np.float64,
    )
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    out = []
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        v = centers[r.label] + alpha * v / np.linalg.norm(v)
        v /= np.linalg.norm(v)
        out.append((r.vec_id, [float(round(x, 6)) for x in v], r.label))
    spark.createDataFrame(
        out, schema="vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir)


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


def evaluate(emb, args) -> dict:
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
        "rp_lsh_multi": lambda q: rp_lsh_topk_multi(
            emb, "embedding", "vec_id", q, k=args.k,
            n_bits=args.lsh_bits, n_tables=args.lsh_tables,
        ),
        "pq": lambda q: pq_topk(
            emb, "embedding", "vec_id", q, top_k=args.k,
            m=args.pq_m, k=args.pq_k,
        ),
        "ivfpq": lambda q: ivfpq_topk(
            emb, "embedding", "vec_id", "label", q, top_k=args.k,
            nprobe=args.nprobe, m=args.pq_m, k=args.pq_k,
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
        multi_rows = emb.filter(
            rp_multi_table_pred("embedding", qvec, args.lsh_bits, args.lsh_tables)
        ).count()
        frac = {
            "ivf": ivf_rows / n_corpus,
            "rp_lsh": lsh_rows / n_corpus,
            "rp_lsh_multi": multi_rows / n_corpus,
            "pq": 1.0,  # ADC ranks every code — scans codes, not vectors
            "ivfpq": ivf_rows / n_corpus,
        }
        for m, fn in methods.items():
            got = ids_of(fn(qvec))
            recalls[m].append(len(got & exact) / args.k)
            scanned[m].append(frac[m])

    return {
        "n_corpus": n_corpus,
        "n_cells": n_cells,
        "dim": dim,
        "elapsed_sec": round(time.time() - t0, 1),
        "recall": {
            m: round(sum(v) / len(v), 4) for m, v in recalls.items()
        },
        "scan_fraction": {
            m: round(sum(v) / len(v), 4) for m, v in scanned.items()
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", type=int, default=24)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nprobe", type=int, default=2)
    ap.add_argument("--lsh-bits", type=int, default=4)
    ap.add_argument("--lsh-tables", type=int, default=4)
    ap.add_argument("--alpha", type=float, default=0.7)
    # track the catalog defaults (similarity.PQ_M/PQ_K) so the eval measures
    # what the catalog actually ships
    ap.add_argument("--pq-m", type=int, default=PQ_M)
    ap.add_argument("--pq-k", type=int, default=PQ_K)
    ap.add_argument(
        "--corpus", choices=["both", "uniform", "planted"], default="both"
    )
    args = ap.parse_args()

    spark = get_spark(app_name="pk-ann-recall")
    raw = load(spark, args.sf_dir, "embeddings").cache()
    out = {
        "metric": "ann_recall_at_k",
        "sf_dir": args.sf_dir,
        "k": args.k,
        "n_queries": args.queries,
        "nprobe": args.nprobe,
        "lsh_bits": args.lsh_bits,
        "lsh_tables": args.lsh_tables,
        "alpha": args.alpha,
        "pq_m": args.pq_m,
        "pq_k": args.pq_k,
    }
    if args.corpus in ("both", "uniform"):
        out["uniform"] = evaluate(raw, args)
    if args.corpus in ("both", "planted"):
        import tempfile

        planted_dir = os.path.join(
            tempfile.gettempdir(),
            f"pk_ann_planted_{os.path.basename(args.sf_dir.rstrip('/'))}",
        )
        planted = planted_corpus(spark, raw, args.alpha, planted_dir).cache()
        out["planted"] = evaluate(planted, args)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
