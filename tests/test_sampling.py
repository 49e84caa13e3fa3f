"""Sampling operators: membership must be a pure function of (salt, key) —
invariant under partitioning, rerun, and upstream subsampling. These are the
properties ``df.sample`` cannot give (per-partition seeding) and the reason
the operators exist (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandemic_knowledge_spark.operators.sampling import (
    hash_sample,
    hash_split,
    stratified_sample,
)
from pandemic_knowledge_spark.tables import load


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_membership_invariant_under_partitioning(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    a = hash_sample(d.repartition(1), F.col("doc_id"), 300, "s1")
    b = hash_sample(d.repartition(7, "lang"), F.col("doc_id"), 300, "s1")
    assert _ids(a) == _ids(b)
    assert len(_ids(a)) > 0


def test_rates_nest_and_salts_are_independent(spark, sf_dir):
    """A 200‰ sample is a subset of the 500‰ sample under the SAME salt
    (buckets nest), while a different salt draws a different sample."""
    d = load(spark, sf_dir, "documents")
    small = set(_ids(hash_sample(d, F.col("doc_id"), 200, "s1")))
    big = set(_ids(hash_sample(d, F.col("doc_id"), 500, "s1")))
    other = set(_ids(hash_sample(d, F.col("doc_id"), 200, "s2")))
    assert small <= big
    assert small != other  # astronomically unlikely to collide if independent


def test_stratified_rates_apply_per_stratum(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    sampled = stratified_sample(
        d, F.col("doc_id"), F.col("lang"), {"en": 0}, 1000, "s1"
    )
    langs = {r.lang for r in sampled.select("lang").distinct().collect()}
    assert "en" not in langs  # rate 0 strips the stratum entirely
    n_non_en = d.filter(F.col("lang") != "en").count()
    assert sampled.count() == n_non_en  # rate 1000 keeps every other row


def test_split_is_total_disjoint_and_stable_under_subsampling(spark, sf_dir):
    """Every row lands in exactly one split, and a document's split does
    not change when the corpus is subsampled upstream (only the key feeds
    the hash)."""
    d = load(spark, sf_dir, "documents")
    full = hash_split(d, F.col("doc_id"), 900, "sp1")
    assert full.count() == d.count()
    assert set(r.split for r in full.select("split").distinct().collect()) == {
        "train",
        "test",
    }
    sub = hash_split(
        hash_sample(d, F.col("doc_id"), 500, "s1"), F.col("doc_id"), 900, "sp1"
    )
    joined = sub.alias("a").join(
        full.alias("b"), F.col("a.doc_id") == F.col("b.doc_id")
    )
    assert joined.filter(F.col("a.split") != F.col("b.split")).count() == 0


def test_upsample_factors_and_copy_ids(spark, sf_dir):
    """Each row repeats factor(stratum) times with copy = 1..factor, so
    (doc_id, copy) stays unique; factor-1 strata are untouched."""
    from pandemic_knowledge_spark.operators.sampling import upsample_by_stratum

    d = load(spark, sf_dir, "documents")
    up = upsample_by_stratum(d, F.col("lang"), {"en": 1}, 3)
    n_en = d.filter(F.col("lang") == "en").count()
    n_rest = d.count() - n_en
    assert up.count() == n_en + 3 * n_rest
    assert up.select("doc_id", "copy").distinct().count() == up.count()
    assert up.filter((F.col("lang") == "en") & (F.col("copy") > 1)).count() == 0


def test_budget_mixture_rates_and_saturation(spark, sf_dir):
    from pandemic_knowledge_spark.functions.text import tokenize
    from pandemic_knowledge_spark.operators.sampling import budget_mixture_sample

    d = load(spark, sf_dir, "documents")
    tokens = F.size(tokenize("text"))
    totals = {
        r.source: r.T
        for r in d.groupBy("source").agg(F.sum(tokens).alias("T")).collect()
    }
    budgets = {"src0": 10**9, "src1": 700}  # src0 saturates, src1 halves
    out = budget_mixture_sample(
        d, F.col("doc_id"), "source", tokens, budgets, 400, "mixt"
    ).select("doc_id", "source", "n_tokens", "rate_permille")
    rows = out.collect()
    rates = {}
    for r in rows:
        rates.setdefault(r.source, set()).add(r.rate_permille)
    assert all(len(v) == 1 for v in rates.values())  # one rate per stratum
    # saturated stratum keeps every row
    n_src0 = d.filter(F.col("source") == "src0").count()
    assert rates["src0"] == {1000}
    assert sum(1 for r in rows if r.source == "src0") == n_src0
    # derived rate matches the declarative formula for a downsampled stratum
    assert rates["src1"] == {min(1000, 700 * 1000 // totals["src1"])}
    # membership invariant under partitioning
    again = budget_mixture_sample(
        d.repartition(13, "lang"), F.col("doc_id"), "source", tokens,
        budgets, 400, "mixt",
    )
    assert _ids(out) == _ids(again)


def test_fixed_n_per_stratum_exact_counts_and_stability(spark, sf_dir):
    from pandemic_knowledge_spark.operators.sampling import fixed_n_per_stratum

    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    out = fixed_n_per_stratum(d, F.col("doc_id"), "source", 3, "pick")
    counts = {r.source: r.c for r in out.groupBy("source").agg(F.count("*").alias("c")).collect()}
    sizes = {r.source: r.c for r in d.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert counts == {s: min(3, n) for s, n in sizes.items()}
    # picks are stable when OTHER strata change (membership is per-stratum)
    one = d.filter(F.col("source") == "src1")
    solo = fixed_n_per_stratum(one, F.col("doc_id"), "source", 3, "pick")
    assert _ids(solo) == _ids(out.filter(F.col("source") == "src1"))


def test_dsir_rank_prefers_target_like_candidates(spark):
    """Candidates sharing the target slice's vocabulary must outrank
    candidates that don't; target docs themselves are never candidates;
    the ranking is partitioning-invariant (integer micro-log-unit sums)."""
    from pandemic_knowledge_spark.operators.sampling import dsir_rank

    rows = [
        (1, "de", "katze hund maus katze hund haus"),
        (2, "de", "katze hund vogel katze baum hund"),
        (10, "xx", "katze hund maus baum katze hund"),   # target-like
        (11, "xx", "stream state checkpoint watermark batch shuffle"),
        (12, "xx", "filter scan column vector batch window"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = dsir_rank(
        d, "doc_id", "text", F.col("lang") == "de", n_buckets=256, top_k=10
    )
    got = [(r.doc_id, r.log_w) for r in out.collect()]
    ids = [i for i, _ in got]
    assert 1 not in ids and 2 not in ids          # targets excluded
    assert ids[0] == 10                            # target-like leads
    scores = dict(got)
    assert scores[10] > scores[11] and scores[10] > scores[12]
    again = dsir_rank(
        d.repartition(7), "doc_id", "text", F.col("lang") == "de",
        n_buckets=256, top_k=10,
    ).collect()
    assert [(r.doc_id, r.log_w) for r in again] == got
