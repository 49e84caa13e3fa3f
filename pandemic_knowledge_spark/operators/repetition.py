"""Repetition / diversity quality signals for corpus curation.

The Gopher-style repetition filters (Rae et al. 2021, table A1): documents
dominated by a single token or by repeated n-grams are boilerplate, spam, or
generation loops, and get culled before training. The reference has no
notion of this (its quality gate is Elasticsearch-side relevance); a
training-data engine needs it first-class next to dedup and decontamination.

Per document:
- ``n_tokens`` / ``n_distinct_tokens`` — vocabulary size vs length
- ``top_token_frac``  — frequency of the most common token / n_tokens
  (the "fraction of most common word" filter)
- ``dup_2gram_frac``  — 1 − distinct-2-grams / total-2-grams (the
  "duplicate n-gram fraction" filter); null for docs too short to 2-gram
- ``token_entropy``   — Shannon entropy of the token distribution in nats,
  H = ln N − (Σ c·ln c)/N — low entropy = repetitive/templated text

Scale shape: ONE scan; the 2-gram fraction is computed array-side BEFORE the
explode (two O(1) slices + zip_with per row, no shuffle); token frequencies
are two keyed aggregations — (doc, token) counts then per-doc rollup — both
map-side combined, so the shuffles carry one row per distinct (doc, token)
and one per doc. Linear at any corpus size, no pairwise anything.

Cross-engine parity: counts are exact integers; the entropy/fraction doubles
round to 6 dp (same budget BM25 uses for its ln-based scores, which
hash-match DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandemic_knowledge_spark.functions.text import sql_tokenize, tokenize


def repetition_signals(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, top_token_frac, dup_2gram_frac,
    token_entropy) for every doc with >= 1 token (empty docs have no
    distribution to score; they are the length filter's job, not this one's).
    """
    # Tokens as a NAMED column (second select below): inlined, dup_frac's
    # ~5 references would paste the tokenizer regexp that many times per
    # row into one Project (functions.pinning module docs).
    toks = F.col("__toks")
    n = F.size(toks)
    # Raw (non-distinct) 2-gram array via the ONE shared gram-assembly
    # definition (dedup._kgram_concat — shingles would array_distinct,
    # which is exactly what this signal must not do). Only evaluated
    # under the n >= 2 branches below, so short docs are safe.
    from pandemic_knowledge_spark.operators.dedup import _kgram_concat

    grams = _kgram_concat(toks, 2)
    n_grams = F.when(n >= 2, n - 1).otherwise(F.lit(0))
    dup_frac = F.when(
        n_grams > 0,
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(grams)).cast("double") / n_grams,
            6,
        ),
    )
    # pin(), not a plain alias: the explode below makes Spark infer a
    # size(__toks) > 0 filter (InferFiltersFromGenerate), and predicate
    # pushdown re-inlines a plain alias into that Filter — the regexp ran
    # 2x per row in the Filter next to the Project's own evaluation. The
    # Generate barrier keeps the inferred filter on the attribute.
    from pandemic_knowledge_spark.functions.pinning import pin

    base = pin(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
        __toks=tokenize(text_col),
    ).select("doc_id", "__toks", dup_frac.alias("dup_2gram_frac"))
    # dup_2gram_frac rides through both aggregations as first() — constant
    # per doc, and carrying it beats a join back to the scan side (which
    # would shuffle the per-doc frame a second time).
    cnt = (
        base.select("doc_id", "dup_2gram_frac", F.explode("__toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"), F.first("dup_2gram_frac").alias("dup"))
    )
    n_tok = F.sum("c")
    return (
        cnt.groupBy("doc_id")
        .agg(
            n_tok.alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.max("c").alias("__top_c"),
            F.first("dup").alias("dup_2gram_frac"),
            F.sum(F.col("c") * F.log(F.col("c"))).alias("__clnc"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_distinct_tokens").cast("long").alias("n_distinct_tokens"),
            F.round(
                F.col("__top_c").cast("double") / F.col("n_tokens"), 6
            ).alias("top_token_frac"),
            "dup_2gram_frac",
            F.round(
                F.log(F.col("n_tokens")) - F.col("__clnc") / F.col("n_tokens"), 6
            ).alias("token_entropy"),
        )
    )


def sql_repetition_signals(table: str, id_col: str, text_col: str) -> str:
    """DuckDB SQL reproducing :func:`repetition_signals` exactly."""
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id,
         {sql_tokenize(text_col)} AS toks
  FROM {table}
), dup AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 2 THEN round(
           1.0 - CAST(len(list_distinct(
                   list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
                 )) AS DOUBLE) / (len(toks) - 1), 6)
         END AS dup_2gram_frac
  FROM t
), cnt AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
  GROUP BY doc_id, tok
), agg AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_distinct_tokens,
         max(c) AS top_c,
         sum(c * ln(c)) AS clnc
  FROM cnt GROUP BY doc_id
)
SELECT a.doc_id, a.n_tokens, a.n_distinct_tokens,
       round(CAST(a.top_c AS DOUBLE) / a.n_tokens, 6) AS top_token_frac,
       d.dup_2gram_frac,
       round(ln(a.n_tokens) - a.clnc / a.n_tokens, 6) AS token_entropy
FROM agg a JOIN dup d USING (doc_id)
"""
