"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; IVF (inverted-file) probe
as the scale path: partition vectors into coarse cells, search only the
cells nearest the query. At 100 TB the cell assignment is the partition
key — a probe touches nprobe/ncells of the data and the scan is pruned by
an equi-filter on the cell id, which Parquet partition pruning serves.

All vector math is JVM-side (F.zip_with/F.aggregate, functions.vectors) —
sequential fold order matches the DuckDB oracle's list_sum, so scores are
bit-identical before rounding.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pandemic_knowledge_spark.functions.vectors import as_double, cosine, dot, norm


def query_vec_col(vec: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in vec])


def knn_brute_force(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: one pruned column scan + TakeOrderedAndProject
    (no shuffle of the full table — Spark's top-k is per-partition heaps
    merged at the driver)."""
    q = query_vec_col(query)
    return (
        emb.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def ivf_kmeans_topk(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k_cells: int = 8,
    iters: int = 2,
    top_k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF with a TRAINED coarse quantizer — the production shape when no
    ingest-time cell column exists: cells come from the shared integer
    Lloyd fit (bit-identical to kmeans_embeddings and its SQL unroll), the
    probe is :func:`ivf_topk` over the assigned frame. At ingest scale the
    fit runs once and `cl` is written as the partition key; a probe is then
    a partition-pruned scan of nprobe cells — this operator is the
    train+assign+probe pipeline end-to-end, oracle-checked against the
    unrolled-Lloyd + centroid-probe SQL (catalog:ann_ivf_kmeans_topk)."""
    assigned, _, _ = _kmeans_fit(
        emb, vec_col, id_col, k_cells, iters, extra_cols=(F.col(vec_col),)
    )
    # _kmeans_fit aliases the id to vec_id internally; restore the caller's
    # id_col so the output schema matches the sibling ANN tiers.
    assigned = assigned.withColumnRenamed("vec_id", id_col)
    return ivf_topk(assigned, vec_col, id_col, "cl", query, k=top_k, nprobe=nprobe)


def centroids_by_label(emb: DataFrame, vec_col: str, cell_col: str) -> DataFrame:
    """IVF coarse cells from a partition column: per-cell mean vector.

    posexplode → (cell, pos) mean → re-assemble ordered by pos. Components
    rounded to 6 dp so downstream cosine is reproducible cross-engine
    despite double-sum ordering differences.
    """
    pos = emb.select(
        F.col(cell_col).alias("cell"),
        F.posexplode(as_double(F.col(vec_col))).alias("pos", "v"),
    )
    means = pos.groupBy("cell", "pos").agg(F.round(F.avg("v"), 6).alias("m"))
    return means.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("centroid")
    )


def ivf_topk(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    cell_col: str,
    query: Sequence[float],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF probe: rank cells by centroid-cosine, scan only the top-nprobe
    cells, exact cosine inside them. The cell filter is an equi-IN filter →
    partition pruning on a cell-partitioned layout."""
    pruned = _probe_cells(emb, vec_col, cell_col, query, nprobe)
    return knn_brute_force(pruned, vec_col, id_col, query, k)


def _probe_cells(
    emb: DataFrame, vec_col: str, cell_col: str, query: Sequence[float], nprobe: int
) -> DataFrame:
    """Prune the corpus to the top-nprobe cells by centroid cosine — the
    shared coarse stage of ivf_topk and ivfpq_topk (one probe definition,
    so rounding/tie-break/nprobe semantics cannot desynchronize)."""
    q = query_vec_col(query)
    cents = centroids_by_label(emb, vec_col, cell_col)
    top_cells = (
        cents.select("cell", F.round(cosine(F.col("centroid"), q), 6).alias("cc"))
        .orderBy(F.desc("cc"), F.col("cell"))
        .limit(nprobe)
        .select("cell")
    )
    return emb.join(
        F.broadcast(top_cells), emb[cell_col] == top_cells["cell"], "left_semi"
    )


RP_SEED = 7


def rp_hyperplanes(dim: int, n_bits: int, seed: int = RP_SEED) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for sign-LSH.

    Components are md5-derived exact decimals (k/1000), so the identical
    constant arrays are embedded verbatim in both the Spark expression and
    the DuckDB oracle text — no RNG state to reproduce cross-engine.
    """
    import hashlib

    planes: list[list[float]] = []
    for j in range(n_bits):
        comps = []
        for d in range(dim):
            h = int(hashlib.md5(f"rp-{seed}-{j}-{d}".encode()).hexdigest()[:15], 16)
            comps.append(((h % 2001) - 1000) / 1000.0)
        planes.append(comps)
    return planes


def rp_bucket_col(vec, planes: list[list[float]]):
    """Sign-LSH bucket id: bit j = sign(v · h_j). Pure JVM fold per plane."""
    total = F.lit(0)
    v = as_double(vec)
    for j, p in enumerate(planes):
        pl = F.array(*[F.lit(x) for x in p])
        total = total + F.when(dot(v, pl) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return total.cast("long")


def rp_python_bucket(query: Sequence[float], planes: list[list[float]]) -> int:
    """The query vector's bucket, computed driver-side with the SAME
    sequential left-to-right double accumulation the engines use."""

    def pdot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    return sum((1 << j) for j, p in enumerate(planes) if pdot(query, p) >= 0)


def rp_lsh_topk(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    n_bits: int = 4,
) -> DataFrame:
    """Random-hyperplane (sign) LSH ANN: candidates = rows in the query's
    bucket, exact cosine re-rank inside. Complements IVF: no training pass
    at all — the bucket is a pure function of the vector, so at 100 TB it is
    precomputed at ingest as a partition column and a probe becomes a
    partition-pruned scan of 1/2^bits of the corpus."""
    cand = emb.filter(rp_multi_table_pred(vec_col, query, n_bits, 1))
    return knn_brute_force(cand, vec_col, id_col, query, k)


def rp_multi_table_pred(
    vec_col: str, query: Sequence[float], n_bits: int, n_tables: int
):
    """Candidate predicate for multi-table sign-LSH: a row qualifies iff it
    shares the query's bucket in ANY of n_tables independent hyperplane
    sets (table t seeds rp_hyperplanes at RP_SEED + t, so table 0 IS the
    single-table tier). Scan-side codegen — a sum of sign-CASE dots per
    table, no shuffle, no training pass."""
    if n_tables < 1:
        raise ValueError("rp_multi_table_pred: n_tables must be >= 1")
    pred = None
    for t in range(n_tables):
        planes = rp_hyperplanes(len(query), n_bits, seed=RP_SEED + t)
        qb = rp_python_bucket(query, planes)
        c = rp_bucket_col(F.col(vec_col), planes) == F.lit(qb)
        pred = c if pred is None else (pred | c)
    return pred


def rp_lsh_topk_multi(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    n_bits: int = 4,
    n_tables: int = 4,
) -> DataFrame:
    """Multi-table sign-LSH ANN — the standard recall knob for LSH: per-table
    hit probability p becomes 1-(1-p)^T across T tables at ~T/2^bits scan
    cost (measured on the planted-cluster corpus, scripts/ann_recall.py:
    recall@10 0.36 single-table → 0.80 at T=4; BASELINE.md). Candidates come
    from ONE pruned scan (OR of the per-table bucket equalities — never T
    scans unioned), exact cosine re-rank inside. At ingest the T bucket ids
    are T precomputed partition columns; a probe scans T partitions."""
    pred = rp_multi_table_pred(vec_col, query, n_bits, n_tables)
    return knn_brute_force(emb.filter(pred), vec_col, id_col, query, k)


NEAR_DUP_GRID = 8  # sub-groups per block for the fragment-replicate pair join
NEAR_DUP_TILE = 4096  # rows per side of an Arrow-tier score tile (≤128 MiB acc)


def near_dup_pairs(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    block_col: str,
    threshold: float,
    grid: int = NEAR_DUP_GRID,
    impl: str = "auto",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked on a cell column so
    the pairwise term is bounded per block (LSH/IVF cells at scale; at
    corpus scale pass an LSH/IVF cell as the block, or use SemDeDup,
    rather than a fixed-cardinality data column).

    Both tiers spread each block's quadratic term fragment-replicate over
    a ``grid`` of hash sub-groups: a bare equi-join on the block key caps
    parallelism at the number of blocks (10 labels → ≤10 tasks for the
    whole workload, measured ~30 s at the derived sf1 with 22 cores
    idle). The SQL tier replicates the left side across the right side's
    ``grid`` sub-groups (block_count × grid join cells; sort-merge only
    buffers the bounded right group). The Arrow tier uses the full 2-D
    grid — each side keeps its own sub-group and replicates across the
    OTHER side's axis, so pair (x, y) lands in exactly one of
    block_count × grid² cogroup cells and the kernel never materializes
    more than block/grid rows per side (cogroup hands the kernel whole
    groups, so group size — not tile size — is the executor-memory
    bound). Either way every ordered pair matches exactly once, the
    output is identical at any grid, and replication multiplies shuffle
    volume by ``grid`` — a linear cost against the quadratic term it
    spreads.

    Tiers (``impl``): the Ω(pairs) inner loop is a dot product, and no
    JVM expression form evaluates it well — the zip_with/aggregate fold
    is interpreted (~1.5M pairs/s TOTAL on 32 cores), and an unrolled
    64-term codegen chain is worse (the generated method blows past the
    JIT's huge-method bytecode limit and runs as interpreted bytecode;
    measured 182 s vs the fold's 13 s at the derived sf1). So ``auto``
    routes fixed-dimension corpora (proven by a linear min=max size agg,
    not assumed) to the ``arrow`` tier: a cogrouped applyInPandas over
    the same (block, sub-group) grid whose kernel accumulates
    DIMENSION-BY-DIMENSION over numpy pair tiles — acc += A[:,i]·B[:,i]
    walks i in ascending order, so every pair's accumulation is the same
    left-to-right IEEE sequence as the fold (and the DuckDB oracle's
    list_sum): bit-identical doubles, at vectorized speed (sf1: 2.1 s vs
    13.3 s). Ragged/empty corpora keep the ``sql`` JVM tier, whose
    zip_with NULL-padding defines the semantics both tiers share. The
    kernel pre-filters on raw_cos ≥ threshold − 1e-6 (admissible: ROUND
    can lift a value by at most 5e-7), and the final HALF_UP rounding +
    threshold test run Spark-side so both tiers share one filter."""
    g = max(1, int(grid))
    if impl not in ("auto", "sql", "arrow"):
        raise ValueError(f"impl must be auto|sql|arrow, got {impl!r}")
    dim = 0
    if impl != "sql":
        mm_dim = emb.agg(
            F.min(F.size(F.col(vec_col))).alias("mn"),
            F.max(F.size(F.col(vec_col))).alias("mx"),
        ).first()
        if mm_dim is not None and mm_dim.mn is not None and mm_dim.mn == mm_dim.mx:
            dim = int(mm_dim.mn)
        if impl == "arrow" and dim <= 0:
            raise ValueError(
                "impl='arrow' requires a fixed-dimension, non-empty vector column"
            )
    if dim > 0:
        return _near_dup_pairs_arrow(
            emb, vec_col, id_col, block_col, threshold, g, dim
        )
    return _near_dup_pairs_sql(emb, vec_col, id_col, block_col, threshold, g)


def _near_dup_pairs_sql(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    block_col: str,
    threshold: float,
    g: int,
) -> DataFrame:
    """JVM tier: fragment-replicate pair join + interpreted fold cosine.

    Norms are precomputed per ROW before the pair join (linear work), so
    each emitted pair pays one dot product instead of three (cosine
    inlined per pair re-derives both norms — 3× the fold work on a
    workload whose cost is Ω(pairs); same accumulation order, so the
    resulting doubles are bit-identical)."""
    par = emb.sparkSession.sparkContext.defaultParallelism
    base = emb.select(
        F.col(id_col).alias("vid"),
        F.col(block_col).alias("blk"),
        as_double(F.col(vec_col)).alias("v"),
    ).withColumn("nrm", norm(F.col("v")))
    # The explicit repartitions are MATERIALIZATION BARRIERS, not (only)
    # layout: v is a transform() and nrm an interpreted HOF fold, and any
    # join plan that leaves a side exchange-less (broadcast-hash streams
    # the probe side straight off the scan) re-evaluates those producer
    # expressions per PAIR — each element access re-runs the whole
    # 64-element transform (measured: 277 s vs 17 s for the identical
    # query at the derived sf1). An exchange pins both to once-per-row,
    # and when the planner picks sort-merge it doubles as the join
    # distribution, so no extra shuffle is ever paid.
    # __gt must be LONG like __gb (pmod of a crc32): an int key under the
    # join condition analyzes to cast(__gt as bigint) = __gb, which the
    # explicit hashpartitioning on the raw column no longer satisfies —
    # EnsureRequirements would re-shuffle the side the barrier just paid
    # for.
    a = (
        base.withColumn(
            "__gt",
            F.explode(F.sequence(F.lit(0).cast("long"), F.lit(g - 1).cast("long"))),
        )
        .repartition(par, "blk", "__gt")
        .alias("a")
    )
    b = (
        base.withColumn("__gb", F.pmod(F.crc32(F.col("vid").cast("string")), F.lit(g)))
        .repartition(par, "blk", "__gb")
        .alias("b")
    )
    denom = F.col("a.nrm") * F.col("b.nrm")
    cos = F.when(denom != 0, dot(F.col("a.v"), F.col("b.v")) / denom)
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.__gt") == F.col("b.__gb"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .withColumn("cos_sim", F.round(cos, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            "cos_sim",
        )
    )


def _near_dup_pairs_arrow(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    block_col: str,
    threshold: float,
    g: int,
    dim: int,
) -> DataFrame:
    """Arrow tier: cogrouped numpy kernel over the (block, sub-group) grid.

    Each cogroup pairs the block's full left fragment with one right
    sub-group; the kernel scores them in ≤ NEAR_DUP_TILE² tiles (bounding
    the accumulator at ~128 MiB however large a block gets) and walks the
    vector dimension in ascending order so every double matches the JVM
    fold bit-for-bit. Rows whose vector, id or block is NULL — or whose
    vector CONTAINS a NULL element — can never emit under the SQL tier's
    fold/predicate semantics and are dropped scan-side (the NULL-element
    case must be decided there: Arrow hands NULL list elements to numpy
    as NaN, erasing the distinction the fold preserves). A true NaN
    element scores NaN under both tiers and then PASSES the filter —
    Spark orders NaN above every number — so the kernel re-admits NaN
    scores explicitly and flags them for transport (pandas→Arrow would
    turn an emitted NaN into NULL). The emitted rowset is identical
    either way."""
    import numpy as np

    id_type = emb.schema[id_col].dataType
    # NaN scores ride out of the kernel as a FLAG, not as NaN doubles:
    # the pandas→Arrow conversion treats NaN as the missing-value
    # sentinel, so an emitted NaN arrives in Spark as NULL and silently
    # fails the threshold filter the JVM tier passes (Spark orders NaN
    # above every number). The flag rebuilds a true NaN Spark-side.
    out_schema = T.StructType(
        [
            T.StructField("vec_a", id_type),
            T.StructField("vec_b", id_type),
            T.StructField("raw_cos", T.DoubleType()),
            T.StructField("is_nan", T.BooleanType()),
        ]
    )
    # NULL-id and NULL-block rows never pair in the SQL tier (both sit
    # in join predicates, and NULL matches nothing) — drop them here too,
    # or cogroup would happily line up the two sides' NULL-key groups
    # (and a None id inside an object ndarray makes `<` raise). Rows with
    # a NULL ELEMENT inside the vector also never emit there (the fold
    # scores them NULL, dropped by the filter) but MUST be excluded
    # before Arrow transport: Arrow hands a NULL list element to numpy as
    # NaN, indistinguishable from a true NaN element — and true NaN has
    # the opposite fate (scores NaN, which Spark orders above every
    # number, so it PASSES). Only the scan-side exists() can tell the
    # two apart.
    base = emb.select(
        F.col(id_col).alias("vid"),
        F.col(block_col).alias("blk"),
        as_double(F.col(vec_col)).alias("v"),
    ).filter(
        F.col("v").isNotNull()
        & (F.size("v") == dim)
        & F.col("vid").isNotNull()
        & F.col("blk").isNotNull()
        & ~F.exists("v", lambda x: x.isNull())
    )
    # 2-D grid cells: pair (x, y) is scored in exactly one cogroup cell,
    # (blk, gx, gy) — the left side keeps its own sub-group gx and
    # replicates across the TARGET axis gy; the right side keeps gy and
    # replicates across the SOURCE axis gx. Both pdfs a kernel ever sees
    # are therefore ≤ block/g rows (a 1-D grid bounded only the right
    # side — the left pdf was the ENTIRE block, an executor-memory cliff
    # for corpus-scale blocks that no tile loop can fix because cogroup
    # materializes the whole group before the kernel runs). Replication
    # multiplies each side's shuffle by g: linear cost, quadratic spread.
    #
    # All grid keys must be LONG (the explode'd axis would otherwise be
    # int vs the pmod-of-crc32 long): cogroup routes each side's groups
    # through its own groupBy shuffle, and an int-vs-long key pair hashes
    # to DIFFERENT partitions — the two halves of a group then each
    # cogroup against an empty peer and the kernel silently emits nothing
    # (invisible at tiny scale, where AQE coalesces both shuffles into
    # one partition and the sort-based in-partition cogroup still lines
    # the keys up).
    axis = F.sequence(F.lit(0).cast("long"), F.lit(g - 1).cast("long"))
    a = base.withColumn(
        "__ga", F.pmod(F.crc32(F.col("vid").cast("string")), F.lit(g))
    ).withColumn("__gt", F.explode(axis))
    # The right side MUST be alias-renamed: both sides derive from `base`,
    # so their attributes share exprIds and the cogroup plan deduplicates
    # them — the right child gets column-pruned down to its grouping keys
    # and the kernel sees no vectors (the same self-derived-lineage trap
    # as bare same-name join predicates, in cogroup clothing).
    b = (
        base.select(
            F.col("vid").alias("bvid"),
            F.col("blk").alias("bblk"),
            F.col("v").alias("bv"),
        )
        .withColumn("__gb", F.pmod(F.crc32(F.col("bvid").cast("string")), F.lit(g)))
        .withColumn("__gs", F.explode(axis))
    )
    loose = float(threshold) - 1e-6
    tile = NEAR_DUP_TILE

    def score(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "vec_a": left["vid"][:0],
                "vec_b": left["vid"][:0],
                "raw_cos": pd.Series([], dtype="float64"),
                "is_nan": pd.Series([], dtype="bool"),
            }
        )
        if left.empty or right.empty:
            return empty
        av = np.stack(left["v"].to_numpy())
        bv = np.stack(right["bv"].to_numpy())
        aid = left["vid"].to_numpy()
        bid = right["bvid"].to_numpy()

        def seq_norm(m: "np.ndarray") -> "np.ndarray":
            acc = np.zeros(m.shape[0])
            for i in range(dim):  # ascending dims = the fold's add order
                acc += m[:, i] * m[:, i]
            return np.sqrt(acc)

        an, bn = seq_norm(av), seq_norm(bv)
        outs = []
        for i0 in range(0, len(aid), tile):
            a1 = min(i0 + tile, len(aid))
            for j0 in range(0, len(bid), tile):
                j1 = min(j0 + tile, len(bid))
                acc = np.zeros((a1 - i0, j1 - j0))
                for i in range(dim):
                    acc += av[i0:a1, i : i + 1] * bv[j0:j1, i][None, :]
                denom = an[i0:a1, None] * bn[j0:j1][None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    raw = acc / denom
                # NaN scores (a NaN element in either vector) PASS the
                # JVM tier's filter — Spark and DuckDB both order NaN
                # above every number, so round(NaN,6) >= t is TRUE —
                # while numpy's >= is False for NaN: re-admit them.
                mask = (
                    (denom != 0)
                    & (aid[i0:a1, None] < bid[j0:j1][None, :])
                    & ((raw >= loose) | np.isnan(raw))
                )
                ii, jj = np.nonzero(mask)
                if len(ii):
                    sel = raw[ii, jj]
                    isn = np.isnan(sel)
                    outs.append(
                        pd.DataFrame(
                            {
                                "vec_a": aid[i0:a1][ii],
                                "vec_b": bid[j0:j1][jj],
                                "raw_cos": np.where(isn, 0.0, sel),
                                "is_nan": isn,
                            }
                        )
                    )
        return pd.concat(outs, ignore_index=True) if outs else empty

    scored = (
        a.groupBy("blk", "__ga", "__gt")
        .cogroup(b.groupBy("bblk", "__gs", "__gb"))
        .applyInPandas(score, schema=out_schema)
    )
    return (
        scored.withColumn(
            "cos_sim",
            F.when(F.col("is_nan"), F.lit(float("nan"))).otherwise(
                F.round(F.col("raw_cos"), 6)
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )


# --------------------------------------------------------------- k-means

KM_SCALE = 1000  # float32 → integer-quantized coordinates (exact arithmetic)


def _quantize(vec_col: str):
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * KM_SCALE).cast("long"),
    )


def _kmeans_fit(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    iters: int,
    extra_cols: tuple = (),
):
    """Shared Lloyd fit: returns (final assignment frame with (vec_id, q,
    *extra_cols, cl), final centroids, effective k). See
    :func:`kmeans_embeddings` for the algorithm and scale notes."""
    base = emb.select(
        F.col(id_col).alias("vec_id"), _quantize(vec_col).alias("q"), *extra_cols
    )
    # Each iteration re-reads `base` (init + iters×(assign, update) + final
    # assign). Materialize the quantized vectors ONCE — localCheckpoint, not
    # cache, so the plan truncates and the ContextCleaner reclaims blocks
    # when the frame is dereferenced (k·dim longs per row; tiny vs re-scanning
    # and re-quantizing the parquet five times).
    base = base.localCheckpoint(eager=False)  # init collect materializes
    init = base.select("vec_id", "q").orderBy("vec_id").limit(k).collect()
    if not init:
        raise ValueError("kmeans_embeddings: empty input")
    k = min(k, len(init))  # fewer vectors than clusters: shrink k
    cents: list[list[int]] = [list(r.q) for r in init]
    dim = len(cents[0])

    def assign(frame: DataFrame) -> DataFrame:
        enc = F.array_min(
            F.array(
                *[
                    F.aggregate(
                        F.zip_with(
                            F.col("q"),
                            F.array(*[F.lit(int(v)) for v in c]),
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0).cast("long"),
                        lambda acc, x: acc + x,
                    )
                    * F.lit(k)
                    + F.lit(cl)
                    for cl, c in enumerate(cents)
                ]
            )
        )
        return frame.withColumn("cl", (enc % F.lit(k)).cast("long"))

    for _ in range(iters):
        a = assign(base)
        upd = (
            a.select("cl", F.posexplode("q").alias("i", "val"))
            .groupBy("cl", "i")
            .agg(
                F.floor(F.sum("val") / F.count(F.lit(1))).cast("long").alias("cv")
            )
            .collect()
        )
        new = {}
        for r in upd:
            new.setdefault(r.cl, [0] * dim)[r.i] = r.cv
        cents = [new.get(cl, cents[cl]) for cl in range(k)]  # empty cluster keeps old

    return assign(base), cents, k  # assignment against the final centroids


def kmeans_embeddings(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Lloyd k-means over INTEGER-QUANTIZED embeddings — the corpus
    clustering pass (topic bucketing, IVF coarse-quantizer training,
    diversity-aware sampling strata).

    Everything is exact int64 arithmetic, so results are bit-identical on
    any engine and any partitioning: coordinates quantize to
    round(x·1000); assignment minimizes the exact squared distance with
    ties broken by lowest cluster id (encoded min(dist·k + cl)); centroid
    updates floor-divide exact integer sums. Init = the k lowest ``id_col``
    rows (deterministic, engine-portable).

    Scale shape per iteration: ONE corpus pass for assignment (centroids are
    k broadcast literals — k·dim int64s — baked into the plan, the same
    driver-collect every distributed k-means does, incl. MLlib), one
    posexplode→groupBy(cl, dim) shuffle for the update (map-side combined;
    k·dim result rows to the driver). The driver loop carries PLANS, not
    data; each round's frame is a fresh scan, so no lineage blowup.

    Output: (cluster_id, n_vecs, centroid_c0) — final-round assignment
    counts and the dim-0 coordinate of the final centroids.
    """
    final, cents, k = _kmeans_fit(emb, vec_col, id_col, k, iters)
    return (
        final.groupBy("cl")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .select(
            F.col("cl").alias("cluster_id"),
            "n_vecs",
            # dim-0 coordinate of the final centroid, mapped via a literal
            F.element_at(
                F.array(*[F.lit(int(c[0])) for c in cents]),
                (F.col("cl") + 1).cast("int"),
            ).alias("centroid_c0"),
        )
    )


def _sql_kmeans_ctes(table: str, vec_col: str, id_col: str, k: int,
                     iters: int, prefix: str = "",
                     train_limit: int | None = None) -> tuple[list[str], str]:
    """Shared CTE prefix for the k-means oracles: Lloyd unrolled to one
    assignment + one update CTE pair per round, final assignment in
    ``afin``. Returns (ctes, name of the final-centroid CTE). ``prefix``
    namespaces every CTE so independent fits (PQ subspaces) can coexist
    in one WITH list. ``train_limit`` mirrors the engine's sample-bounded
    training (``pq_fit_codes``): the Lloyd iterations run over the
    md5-ordered first ``train_limit`` vectors while ``afin`` still assigns
    the full table."""
    from pandemic_knowledge_spark.functions.text import md5_int_expr

    P = prefix
    q = (
        f"{P}q AS (SELECT {id_col} AS vec_id, "
        f"list_transform({vec_col}, x -> CAST(round(CAST(x AS DOUBLE)*{KM_SCALE}) AS BIGINT)) AS q "
        f"FROM {table})"
    )
    ctes = [q]
    t = f"{P}q"
    if train_limit is not None:
        h = md5_int_expr("CAST(vec_id AS VARCHAR)")
        ctes.append(
            f"{P}t AS (SELECT vec_id, q FROM {P}q "
            f"ORDER BY {h}, vec_id LIMIT {train_limit})"
        )
        t = f"{P}t"
    c_prev = f"{P}c0"
    ctes.append(
        f"{P}c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, q AS c "
        f"FROM {t} ORDER BY vec_id LIMIT {k})"
    )
    dist = (
        "list_sum(list_transform(range(1, len(v.q) + 1), "
        "i -> (v.q[i]-c.c[i])*(v.q[i]-c.c[i])))"
    )
    for it in range(1, iters + 1):
        ctes.append(
            f"{P}a{it} AS (SELECT v.vec_id, CAST(min({dist}*{k} + c.cl) % {k} AS BIGINT) AS cl "
            f"FROM {t} v CROSS JOIN {c_prev} c GROUP BY v.vec_id)"
        )
        ctes.append(
            f"{P}u{it} AS (SELECT a.cl, u.i, "
            f"CAST(floor(CAST(sum(v.q[u.i]) AS DOUBLE)/count(*)) AS BIGINT) AS cv "
            f"FROM {P}a{it} a JOIN {t} v USING (vec_id) "
            f"CROSS JOIN (SELECT DISTINCT unnest(range(1, len(q) + 1)) AS i FROM {t}) u "
            f"GROUP BY a.cl, u.i)"
        )
        ctes.append(
            f"{P}c{it} AS (SELECT p.cl, "
            f"coalesce((SELECT list(u.cv ORDER BY u.i) FROM {P}u{it} u WHERE u.cl = p.cl), p.c) AS c "
            f"FROM {c_prev} p)"
        )
        c_prev = f"{P}c{it}"
    ctes.append(
        f"{P}afin AS (SELECT v.vec_id, CAST(min({dist}*{k} + c.cl) % {k} AS BIGINT) AS cl "
        f"FROM {P}q v CROSS JOIN {c_prev} c GROUP BY v.vec_id)"
    )
    return ctes, c_prev


def sql_kmeans(table: str, vec_col: str, id_col: str, k: int = 8,
               iters: int = 2) -> str:
    """DuckDB SQL reproducing :func:`kmeans_embeddings` exactly — the Lloyd
    iterations unroll via :func:`_sql_kmeans_ctes`, all in exact int64
    arithmetic. Dimensionality is derived from the data (len(q)) on both
    engines, so a testdata dim change can't desync them."""
    ctes, c_prev = _sql_kmeans_ctes(table, vec_col, id_col, k, iters)
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT a.cl AS cluster_id,
       count(*) AS n_vecs,
       min(c.c[1]) AS centroid_c0
FROM afin a JOIN {c_prev} c USING (cl)
GROUP BY a.cl
"""
    )


# --------------------------------------------------------- semantic dedup

SEMDEDUP_THRESHOLD = 0.3


def semantic_dedup(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
    threshold: float = SEMDEDUP_THRESHOLD,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the corpus with k-means, then
    mark near-duplicates ONLY within each cluster — a vector is a duplicate
    iff an earlier-id vector in its cluster has cosine >= threshold
    (earliest-wins, deterministic). Output (vec_id, cluster_id, is_dup);
    the kept set is ``is_dup = false``.

    Scale shape: the k-means fit is the linear pass (see
    :func:`kmeans_embeddings`); the pairwise term is quadratic ONLY within a
    cluster — the whole point of SemDeDup's blocking — and is delegated to
    :func:`near_dup_pairs` with the cluster id as the block, inheriting its
    fragment-replicate grid (a k=8 clustering no longer caps the quadratic
    term at 8 tasks) and its Arrow scoring tier (bit-identical cosines at
    vectorized speed; a pair (earlier y, later x) marks x). Real
    deployments run k ≈ sqrt(N) so blocks stay ~sqrt-sized.
    """
    assigned, _, _ = _kmeans_fit(
        emb, vec_col, id_col, k, iters,
        extra_cols=(as_double(F.col(vec_col)).alias("v"),),
    )
    a = assigned.select("vec_id", "cl", "v")
    dups = (
        near_dup_pairs(a, "v", "vec_id", "cl", threshold)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    return (
        a.select("vec_id", F.col("cl").alias("cluster_id"))
        .join(dups.withColumn("is_dup", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cluster_id",
            F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
        )
    )


def sql_semantic_dedup(
    table: str,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 2,
    threshold: float = SEMDEDUP_THRESHOLD,
) -> str:
    """DuckDB SQL reproducing :func:`semantic_dedup` exactly (same k-means
    CTEs, same cosine fold, same earliest-wins EXISTS)."""
    from pandemic_knowledge_spark.functions.vectors import sql_cosine

    ctes, _ = _sql_kmeans_ctes(table, vec_col, id_col, k, iters)
    return (
        "WITH " + ",\n".join(ctes) + f""",
v2 AS (
  SELECT a.vec_id, a.cl,
         list_transform(e.{vec_col}, x -> CAST(x AS DOUBLE)) AS v
  FROM afin a JOIN {table} e ON e.{id_col} = a.vec_id
)
SELECT a.vec_id,
       a.cl AS cluster_id,
       EXISTS (SELECT 1 FROM v2 b
               WHERE b.cl = a.cl AND b.vec_id < a.vec_id
                 AND round({sql_cosine('a.v', 'b.v')}, 6) >= {threshold}) AS is_dup
FROM v2 a
"""
    )


# --------------------------------------------------- product quantization

PQ_M = 8        # subspaces (dim must divide evenly)
PQ_K = 64       # codewords per subspace codebook — m=8/k=64 measures
# recall@10 = 0.33 planted (ivfpq 0.49) vs 0.11 at the old demo-scale
# m=4/k=16 (BASELINE.md ANN table); the codebook-literal oracle stays
# tractable (~3 s DuckDB at sf0.01) and the Arrow assignment kernel makes
# the Spark side independent of m·k
PQ_ITERS = 2
PQ_TRAIN_CAP = 4096  # codebook training sample (64 vectors/codeword at k=64)


def _py_quant(x: float) -> int:
    """Driver-side quantizer for LITERAL query vectors — round half away
    from zero at KM_SCALE (the query literal is shared verbatim between
    engine and oracle, so only self-consistency matters)."""
    import math

    v = x * KM_SCALE
    return int(math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5))


def _lloyd_sample(
    rows: list[list[int]], k: int, iters: int
) -> list[list[int]]:
    """Driver-side exact-int64 Lloyd over a BOUNDED training sample —
    arithmetic-identical to :func:`_kmeans_fit` (argmin squared distance,
    ties to the lowest cluster id, centroid update floor(sum/count), empty
    cluster keeps its previous centroid). ``rows`` must already be in init
    order (lowest vec_id first): init = the first ``k`` rows."""
    import numpy as np

    x = np.asarray(rows, dtype=np.int64)          # (n, d)
    k = min(k, len(x))
    cents = x[:k].copy()                          # (k, d)
    for _ in range(iters):
        # (n, k) exact squared distances; argmin takes the FIRST minimum,
        # i.e. the lowest cluster id on ties — same as min(dist*k + cl) % k.
        diff = x[:, None, :] - cents[None, :, :]
        cl = np.argmin((diff * diff).sum(axis=2), axis=1)
        for c in range(k):
            mem = x[cl == c]
            if len(mem):
                cents[c] = mem.sum(axis=0) // len(mem)  # floor matches F.floor
    return [[int(v) for v in c] for c in cents]


def pq_fit_codes(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    train_cap: int = PQ_TRAIN_CAP,
) -> tuple[DataFrame, list[list[list[int]]]]:
    """Product quantization (Jégou et al. 2011, "Product Quantization for
    Nearest Neighbor Search"): split each vector into ``m`` subvectors,
    learn an independent ``k``-codeword Lloyd codebook per subspace, and
    store each vector as ``m`` small codes.

    Scale shape — codebook training is SAMPLE-BOUNDED, assignment is ONE
    corpus pass: the quantized table materializes once (eager
    localCheckpoint), the training set is the md5-ordered first
    ``train_cap`` vectors (deterministic, engine-portable; FAISS trains
    IVFADC codebooks on ~k·256 samples the same way), the m Lloyd fits run
    driver-side over that bounded sample in exact int64 (``_lloyd_sample``
    — bit-identical arithmetic to the distributed fit), and every vector's
    m codes come from a SINGLE select whose m argmin expressions carry the
    k·dim centroid literals. Nothing here scales with the corpus except
    the one assignment scan — no per-subspace corpus fits, no m-way code
    join. Corpora ≤ ``train_cap`` train on every vector, so small inputs
    are bit-identical to an unsampled fit.

    Returns (codes, codebooks): codes = (vec_id, code_0..code_{m-1});
    codebooks[j][c] = centroid c of subspace j (quantized ints). The codes
    table is m bytes-ish per vector — the 100 TB memory math that makes
    billion-vector ANN fit an index: 64 floats → 4 codes."""
    from pandemic_knowledge_spark.functions.text import md5_int

    dim = len(emb.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    base = emb.select(
        F.col(id_col).alias("vec_id"), _quantize(vec_col).alias("q")
    ).localCheckpoint(eager=False)  # sample collect materializes
    sample = (
        base.orderBy(md5_int(F.col("vec_id").cast("string")), "vec_id")
        .limit(max(1, train_cap))
        .orderBy("vec_id")  # init order: lowest vec_id first
        .collect()
    )
    if not sample:
        raise ValueError("pq_fit_codes: empty input")
    books: list[list[list[int]]] = [
        _lloyd_sample([list(r.q[j * d : (j + 1) * d]) for r in sample], k, iters)
        for j in range(m)
    ]

    # Assignment is a VECTORIZED Arrow kernel (mapInPandas), not m·k
    # interpreted HOF expressions: the first cut built one zip_with+
    # aggregate tree per (subspace, codeword) — m·k·n interpreted evals,
    # measured 22 s at sf0.01 for m=8/k=64 vs <0.5 s here (the same
    # interpreted-fold-to-numpy move as the near-dup pair kernel, and the
    # shape FAISS's SIMD ADC scan takes at billion scale). Bit-exactness
    # holds by construction: quantized coords are exact int64 (|q| ≤ 1000
    # → diff² sums ≪ 2^63), and np.argmin takes the FIRST minimum — the
    # lowest codeword id on ties, identical to the min(dist·k + cl) % k
    # encoding the HOF form used and the DuckDB oracle replays.
    id_field = base.schema["vec_id"]
    out_schema = T.StructType(
        [id_field]
        + [T.StructField(f"code_{j}", T.LongType(), False) for j in range(m)]
    )
    books_plain = [[list(c) for c in b] for b in books]

    def assign_codes(batches):
        import numpy as np

        bks = [np.asarray(b, dtype=np.int64) for b in books_plain]
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.asarray(
                [np.asarray(v, dtype=np.int64) for v in pdf["q"]],
                dtype=np.int64,
            )
            out = {"vec_id": pdf["vec_id"]}
            for j, bk in enumerate(bks):
                x = q[:, j * d : (j + 1) * d]
                dist = ((x[:, None, :] - bk[None, :, :]) ** 2).sum(axis=2)
                out[f"code_{j}"] = np.argmin(dist, axis=1).astype(np.int64)
            yield pd.DataFrame(out)

    codes = base.mapInPandas(assign_codes, schema=out_schema)
    return codes, books


def pq_topk(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    query: "Sequence[float]",
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    top_k: int = 10,
    train_cap: int = PQ_TRAIN_CAP,
) -> DataFrame:
    """ANN top-k by asymmetric distance computation (ADC): the query stays
    un-quantized-to-codes; its exact distance to every codeword is a tiny
    driver-side table, and each vector's approximate distance is the SUM
    of m table lookups on its codes — integer arithmetic end-to-end, so
    the ranking is bit-stable. Output (vec_id, adc_dist)."""
    codes, books = pq_fit_codes(
        emb, vec_col, id_col, m, k, iters, train_cap=train_cap
    )
    d = len(books[0][0])
    qq = [_py_quant(x) for x in query]
    adc = None
    for j, book in enumerate(books):
        qsub = qq[j * d : (j + 1) * d]
        table = [
            sum((a - b) * (a - b) for a, b in zip(qsub, cent)) for cent in book
        ]
        term = F.element_at(
            F.array(*[F.lit(int(v)) for v in table]),
            (F.col(f"code_{j}") + 1).cast("int"),
        )
        adc = term if adc is None else adc + term
    return (
        codes.select("vec_id", adc.cast("long").alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(top_k)
    )


def sql_pq_topk(
    table: str,
    vec_col: str,
    id_col: str,
    query: "Sequence[float]",
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    top_k: int = 10,
    dim: int = 64,
    train_cap: int = PQ_TRAIN_CAP,
) -> str:
    """DuckDB oracle for :func:`pq_topk`: m namespaced Lloyd CTE chains
    (one per subspace slice, each training over the md5-ordered first
    ``train_cap`` vectors exactly as :func:`pq_fit_codes` samples), ADC as
    per-subspace codeword distances to the same quantized query literal,
    summed over the code joins."""
    d = dim // m
    qq = [_py_quant(x) for x in query]
    ctes: list[str] = []
    finals: list[tuple[str, str]] = []
    for j in range(m):
        sub_ctes, c_prev = _sql_kmeans_ctes(
            table, f"{vec_col}[{j * d + 1}:{(j + 1) * d}]", id_col, k, iters,
            prefix=f"p{j}_", train_limit=max(1, train_cap),
        )
        ctes.extend(sub_ctes)
        finals.append((f"p{j}_afin", c_prev))
    qlits = {
        j: "[" + ", ".join(str(v) for v in qq[j * d : (j + 1) * d]) + "]"
        for j in range(m)
    }
    joins = [f"FROM {finals[0][0]} a0 JOIN {finals[0][1]} x0 ON x0.cl = a0.cl"]
    for j in range(1, m):
        joins.append(f"JOIN {finals[j][0]} a{j} ON a{j}.vec_id = a0.vec_id")
        joins.append(f"JOIN {finals[j][1]} x{j} ON x{j}.cl = a{j}.cl")
    dist_terms = [
        f"list_sum(list_transform(range(1, {d} + 1), "
        f"i -> ({qlits[j]}[i] - x{j}.c[i]) * ({qlits[j]}[i] - x{j}.c[i])))"
        for j in range(m)
    ]
    return f"""
WITH {','.join(ctes)}
SELECT a0.vec_id, CAST({' + '.join(dist_terms)} AS BIGINT) AS adc_dist
{chr(10).join(joins)}
ORDER BY adc_dist, a0.vec_id LIMIT {top_k}
"""


def ivfpq_topk(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    cell_col: str,
    query: "Sequence[float]",
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    top_k: int = 10,
    nprobe: int = 2,
    train_cap: int = PQ_TRAIN_CAP,
) -> DataFrame:
    """IVF-PQ: the two-stage billion-scale ANN shape (FAISS's IVFADC) —
    coarse cells prune the corpus to nprobe partitions (partition pruning
    on a cell-partitioned layout), then PQ asymmetric distance ranks only
    the surviving vectors. Composes :func:`ivf_topk`'s cell probe with
    :func:`pq_topk`'s code ranking; the PQ codebooks here are fit on a
    bounded sample of the probed subset (at ingest scale you fit them
    corpus-wide once and store codes alongside the cell id — the probe
    then touches codes only)."""
    pruned = _probe_cells(emb, vec_col, cell_col, query, nprobe)
    return pq_topk(
        pruned, vec_col, id_col, query,
        m=m, k=k, iters=iters, top_k=top_k, train_cap=train_cap,
    )
