"""SemDeDup semantics: earliest-wins marking, cluster blocking, threshold
monotonicity — on a hand-built embedding set with known geometry."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandemic_knowledge_spark.operators.similarity import semantic_dedup

# Two tight groups far apart (clusters), plus one orthogonal outlier.
# Within group A, vecs 0/1/2 are near-identical; in group B, 10/11 are.
VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.999, 0.01, 0.0, 0.0]),
    (2, [0.998, -0.01, 0.0, 0.0]),
    (10, [0.0, 0.0, 1.0, 0.0]),
    (11, [0.0, 0.0, 0.999, 0.01]),
    (20, [0.0, 1.0, 0.0, 0.0]),
]


def _run(spark, threshold=0.95, k=3):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in VECS],
        "vec_id long, embedding array<float>",
    )
    rows = semantic_dedup(df, "embedding", "vec_id", k=k, iters=2, threshold=threshold)
    return {r.vec_id: (r.cluster_id, r.is_dup) for r in rows.collect()}


def test_earliest_wins_within_cluster(spark):
    got = _run(spark)
    # lowest id in each near-dup group survives, later ones marked
    assert got[0][1] is False and got[1][1] is True and got[2][1] is True
    assert got[10][1] is False and got[11][1] is True
    assert got[20][1] is False


def test_dups_share_cluster(spark):
    got = _run(spark)
    assert got[0][0] == got[1][0] == got[2][0]
    assert got[10][0] == got[11][0]


def test_threshold_monotone(spark):
    loose = sum(v[1] for v in _run(spark, threshold=0.5).values())
    tight = sum(v[1] for v in _run(spark, threshold=0.9999).values())
    assert tight <= loose
    assert sum(v[1] for v in _run(spark, threshold=1.1).values()) == 0


def test_every_vector_reported_once(spark):
    got = _run(spark)
    assert sorted(got) == sorted(i for i, _ in VECS)


# --------------------------------------------------- product quantization

def test_pq_retrieves_query_cluster(spark):
    """Three well-separated clusters; ADC top-k must come entirely from
    the query's cluster (PQ's coarse distances preserve cluster-level
    ranking even at 4 codes/vector)."""
    import random

    from pandemic_knowledge_spark.operators.similarity import pq_topk

    rng = random.Random(9)
    centers = {0: 5.0, 1: -5.0, 2: 0.0}
    rows = []
    vid = 0
    for label, c in centers.items():
        for _ in range(40):
            rows.append((vid, label, [c + rng.uniform(-0.3, 0.3) for _ in range(16)]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    query = [5.0] * 16
    top = pq_topk(emb, "embedding", "vec_id", query, m=4, k=8, iters=2, top_k=10)
    labels = {r.label for r in top.join(emb.select("vec_id", "label"), "vec_id").collect()}
    assert labels == {0}


def test_pq_codes_shape_and_determinism(spark):
    import random

    from pandemic_knowledge_spark.operators.similarity import pq_fit_codes, pq_topk

    rng = random.Random(1)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    codes, books = pq_fit_codes(emb, "embedding", "vec_id", m=2, k=4, iters=2)
    assert len(books) == 2 and all(len(b[0]) == 4 for b in books)
    got = codes.orderBy("vec_id").collect()
    assert {r.vec_id for r in got} == set(range(30))
    assert all(0 <= r.code_0 < 4 and 0 <= r.code_1 < 4 for r in got)
    q = [0.1] * 8
    a = pq_topk(emb, "embedding", "vec_id", q, m=2, k=4, iters=2).collect()
    b = pq_topk(emb, "embedding", "vec_id", q, m=2, k=4, iters=2).collect()
    assert a == b


def test_ivfpq_prunes_cells_and_ranks_within(spark):
    """IVF-PQ: results come only from the probed cells, and on separated
    clusters the query's own cluster dominates the top-k."""
    import random

    from pandemic_knowledge_spark.operators.similarity import ivfpq_topk

    rng = random.Random(21)
    rows = []
    vid = 0
    for cell, center in ((0, 4.0), (1, -4.0), (2, 0.5)):
        for _ in range(30):
            rows.append(
                (vid, cell, [center + rng.uniform(-0.2, 0.2) for _ in range(16)])
            )
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    top = ivfpq_topk(
        emb, "embedding", "vec_id", "label", [4.0] * 16,
        m=4, k=8, iters=2, top_k=10, nprobe=1,
    )
    hits = top.join(emb.select("vec_id", "label"), "vec_id").collect()
    assert len(hits) == 10 and {r.label for r in hits} == {0}

def test_pq_sample_training_parity_with_oracle(spark, sf_dir):
    """The SAMPLING arm (train_cap < corpus) must stay engine/oracle
    lockstep: both sides train every codebook on the md5-ordered first
    train_cap vectors and assign the FULL table against those centroids.
    The catalog row can't prove this (testdata corpora sit under the
    default cap, where sampling degenerates to full training), so force a
    sub-corpus cap here."""
    from pandemic_knowledge_spark.operators.similarity import pq_topk, sql_pq_topk
    from pandemic_knowledge_spark.plans.catalog import QUERY_VEC
    from pandemic_knowledge_spark.tables import load

    from tests.oracle_harness import compare_query

    cap = 64  # every testdata embeddings table holds >= 500 vectors
    sdf = pq_topk(
        load(spark, sf_dir, "embeddings"), "embedding", "vec_id",
        QUERY_VEC, train_cap=cap,
    )
    oracle = sql_pq_topk("embeddings", "embedding", "vec_id", QUERY_VEC,
                         train_cap=cap)
    problems, n = compare_query(spark, sf_dir, None, oracle, sdf=sdf)
    assert not problems and n == 10, problems


# ------------------------------------------------------- near_dup_pairs


def _ndp_rows(spark, data, schema, threshold=0.25, **kw):
    from pandemic_knowledge_spark.operators.similarity import near_dup_pairs

    df = spark.createDataFrame(data, schema)
    out = near_dup_pairs(df, "embedding", "vec_id", "label", threshold, **kw)
    return {tuple(r) for r in out.collect()}


_NDP_SCHEMA = "vec_id long, label long, embedding array<float>"
_NDP_DATA = [
    (0, 0, [1.0, 0.0, 0.0]),
    (1, 0, [0.9, 0.1, 0.0]),
    (2, 0, [0.0, 1.0, 0.0]),
    (3, 0, [0.0, 0.0, 0.0]),  # zero norm: cosine NULL, never emitted
    (4, 0, None),  # null vector: never emitted
    (5, 1, [1.0, 0.0, 0.0]),  # other block: never pairs with label 0
    (6, 1, [1.0, 0.01, 0.0]),
]


def test_near_dup_tiers_bit_identical(spark):
    sql = _ndp_rows(spark, _NDP_DATA, _NDP_SCHEMA, impl="sql")
    arrow = _ndp_rows(spark, _NDP_DATA, _NDP_SCHEMA, impl="arrow")
    assert sql == arrow and len(sql) > 0
    ids = {(a, b) for a, b, _ in sql}
    assert (0, 1) in ids and (5, 6) in ids
    assert all(a < b for a, b in ids)
    assert not any(3 in p or 4 in p for p in ids)  # zero-norm / null dropped
    assert not any((a < 5) != (b < 5) for a, b in ids)  # blocked


def test_near_dup_grid_invariant(spark):
    base = _ndp_rows(spark, _NDP_DATA, _NDP_SCHEMA)
    for g in (1, 3, 16):
        assert _ndp_rows(spark, _NDP_DATA, _NDP_SCHEMA, grid=g) == base


def test_near_dup_ragged_corpus_takes_sql_tier(spark):
    # mixed dims: auto must fall back to the fold tier (zip_with pads),
    # and impl='arrow' must refuse rather than silently truncate
    import pytest

    ragged = _NDP_DATA + [(7, 0, [1.0, 0.0, 0.0, 0.5])]
    auto = _ndp_rows(spark, ragged, _NDP_SCHEMA)
    sql = _ndp_rows(spark, ragged, _NDP_SCHEMA, impl="sql")
    assert auto == sql
    with pytest.raises(ValueError):
        _ndp_rows(spark, ragged, _NDP_SCHEMA, impl="arrow")


def test_near_dup_arrow_tile_boundary(spark):
    # force multi-tile scoring inside one cogroup: identical output
    import pandemic_knowledge_spark.operators.similarity as sim

    data = [(i, 0, [1.0, float(i % 7) / 10.0, 0.5]) for i in range(23)]
    base = _ndp_rows(spark, data, _NDP_SCHEMA, impl="arrow")
    old = sim.NEAR_DUP_TILE
    sim.NEAR_DUP_TILE = 4
    try:
        tiled = _ndp_rows(spark, data, _NDP_SCHEMA, impl="arrow")
    finally:
        sim.NEAR_DUP_TILE = old
    assert tiled == base and len(base) > 0


def test_near_dup_nan_element_emitted_by_both_tiers(spark):
    # a true NaN element (not NULL) scores NaN, and Spark/DuckDB order NaN
    # above every number, so round(NaN,6) >= t PASSES — the Arrow kernel
    # must re-admit what numpy's >= drops
    nan = float("nan")
    data = [
        (0, 0, [1.0, 0.0, 0.0]),
        (1, 0, [nan, 0.1, 0.0]),
        (2, 0, [0.9, 0.1, 0.0]),
    ]
    import math

    def norm_rows(rows):
        return {(a, b, "nan" if math.isnan(c) else c) for a, b, c in rows}

    sql = norm_rows(_ndp_rows(spark, data, _NDP_SCHEMA, impl="sql"))
    arrow = norm_rows(_ndp_rows(spark, data, _NDP_SCHEMA, impl="arrow"))
    assert sql == arrow
    assert (0, 1, "nan") in arrow and (1, 2, "nan") in arrow and (0, 2, 0.993884) in arrow


def test_near_dup_null_id_or_block_dropped_by_both_tiers(spark):
    data = [
        (0, 0, [1.0, 0.0, 0.0]),
        (1, 0, [0.9, 0.1, 0.0]),
        (None, 0, [0.95, 0.05, 0.0]),  # NULL id: joins/compares to nothing
        (7, None, [1.0, 0.0, 0.0]),  # NULL block: matches no block
        (8, None, [0.99, 0.01, 0.0]),
    ]
    sql = _ndp_rows(spark, data, _NDP_SCHEMA, impl="sql")
    arrow = _ndp_rows(spark, data, _NDP_SCHEMA, impl="arrow")
    assert sql == arrow
    assert {(a, b) for a, b, _ in sql} == {(0, 1)}


def test_near_dup_null_element_dropped_by_both_tiers(spark):
    # a NULL ELEMENT inside a vector folds to a NULL score (dropped) in
    # the SQL tier; the arrow tier must not resurrect it as NaN (Arrow
    # transports NULL list elements as NaN, so only a scan-side exists()
    # can preserve the NULL-vs-NaN distinction)
    data = [
        (0, 0, [1.0, 0.0, 0.0]),
        (1, 0, [None, 0.1, 0.0]),
        (2, 0, [0.9, 0.1, 0.0]),
    ]
    sql = _ndp_rows(spark, data, _NDP_SCHEMA, impl="sql")
    arrow = _ndp_rows(spark, data, _NDP_SCHEMA, impl="arrow")
    assert sql == arrow
    assert {(a, b) for a, b, _ in sql} == {(0, 2)}


def test_near_dup_matches_python_reference(spark):
    """Seeded randomized cross-check against an independent pure-Python
    cosine (same left-to-right double accumulation, same HALF_UP
    rounding) — both tiers must reproduce it exactly."""
    import math
    import random
    from decimal import ROUND_HALF_UP, Decimal

    rng = random.Random(99)
    dim = 5
    rows = []
    for i in range(60):
        base = [rng.randint(-1000, 1000) / 1000.0 for _ in range(dim)]
        rows.append((i, rng.randint(0, 2), [float(x) for x in base]))

    def seq_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def round6(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    expect = set()
    for ai in range(len(rows)):
        for bi in range(ai + 1, len(rows)):
            ia, la, va = rows[ai]
            ib, lb, vb = rows[bi]
            if la != lb:
                continue
            na, nb = math.sqrt(seq_dot(va, va)), math.sqrt(seq_dot(vb, vb))
            if na * nb == 0:
                continue
            c = round6(seq_dot(va, vb) / (na * nb))
            if c >= 0.25:
                expect.add((ia, ib, c))
    assert len(expect) > 10

    schema = "vec_id long, label long, embedding array<double>"
    for impl in ("sql", "arrow"):
        got = _ndp_rows(spark, rows, schema, impl=impl)
        assert got == expect, impl
