"""Byte-pair-encoding vocabulary learning (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") as a Spark plan.

The tokenizer-training step of an LLM data pipeline. The algorithm's
structure is exactly the scalable shape: the ONLY corpus-sized operation
is one groupBy(word) building the weighted VOCABULARY (Sennrich §3.2
trains on the word-frequency dict, not the corpus); every merge round then
runs on that vocab table — thousands of rows however big the corpus is.
Per round: adjacent-pair counts (scan-side explode of the symbol arrays,
one tiny shuffle), a deterministic argmax (count desc, then lexicographic
pair — ONE scalar to the driver, same boundary class as the crawler
watermark), and merge application as a greedy-left fold over each word's
symbol array (F.aggregate — codegen, no Python).

The fold IS the left-to-right non-overlapping single-pass substitution of
Sennrich's `re.sub`: append each symbol, but when the accumulator's last
element equals `a` and the incoming symbol equals `b`, replace the last
element with `ab`. (A merged token can never re-merge within the same
round as the LEFT part of a new match, because that would need ab == a —
impossible for non-empty b; and the incoming symbol is always an original
one, so it can't be a merged RIGHT part. Hence fold ≡ single-pass scan.)

The DuckDB oracle replays every round: pair counts from the same vocab,
the same argmax tie-break, and the merge walk as a recursive CTE stepping
a cursor through each word (pos += 2 on match else += 1) — bit-identical
merges, counts, and final symbol sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandemic_knowledge_spark.functions.text import sql_tokenize, tokenize

N_MERGES = 8
END_MARK = "</w>"  # end-of-word sentinel so merges can't cross words


def word_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq, syms) — the weighted vocabulary with each word split
    into characters + the end-of-word mark. The one corpus-sized pass."""
    return (
        docs.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "syms",
            F.concat(
                F.regexp_extract_all("word", F.lit("."), 0),
                F.array(F.lit(END_MARK)),
            ),
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = F.transform(
        F.sequence(F.lit(0), F.size("syms") - 2),
        lambda i: F.struct(
            F.element_at("syms", (i + 1).cast("int")).alias("a"),
            F.element_at("syms", (i + 2).cast("int")).alias("b"),
        ),
    )
    return (
        vocab.where(F.size("syms") >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    merged = a + b
    fold = F.aggregate(
        "syms",
        F.lit(None).cast("array<string>"),
        lambda acc, x: F.when(acc.isNull(), F.array(x)).otherwise(
            F.when(
                (F.element_at(acc, -1) == a) & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
                ),
            ).otherwise(F.concat(acc, F.array(x)))
        ),
    )
    return vocab.withColumn("syms", fold)


def bpe_learn(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = N_MERGES,
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges. Returns (merges, final_vocab):
    merges = (it, left, right, cnt) in learn order; final_vocab =
    (word, freq, syms) after all merges. Caches the vocab per round
    (vocab-sized, not corpus-sized) and truncates lineage so the k-round
    loop doesn't grow the plan."""
    spark = docs.sparkSession
    vocab = word_vocab(docs, text_col).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    for it in range(1, n_merges + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("cnt"), "a", "b")
            .select("a", "b", "cnt")
            .first()
        )
        if top is None:
            break
        merges.append((it, top.a, top.b, top.cnt))
        vocab = _apply_merge(vocab, top.a, top.b).localCheckpoint(eager=False)
    mdf = spark.createDataFrame(
        merges, "it int, left_sym string, right_sym string, cnt long"
    )
    return mdf, vocab


def _bpe_ctes(table: str, text_col: str, n_merges: int) -> list[str]:
    """The shared CTE chain: vocab0 → (pairs, best, walk, vocab) × rounds.
    Every non-recursive CTE is MATERIALIZED: plain CTEs inline at each
    reference, and this chain references each level ~5 times — naive
    inlining would expand 5^k copies of the corpus scan."""
    ctes = [
        f"""vocab0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq,
         list_append(regexp_extract_all(word, '.'), '{END_MARK}') AS syms
  FROM (SELECT unnest({sql_tokenize(text_col)}) AS word FROM {table})
  GROUP BY word
)"""
    ]
    for k in range(1, n_merges + 1):
        prev = f"vocab{k - 1}"
        ctes.append(
            f"""pairs{k} AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i + 1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
  FROM {prev}, UNNEST(range(1, len(syms))) AS u(i)
  GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"""best{k} AS MATERIALIZED (SELECT a, b, cnt FROM pairs{k}
  ORDER BY cnt DESC, a, b LIMIT 1)"""
        )
        ctes.append(
            f"""walk{k}(word, freq, syms, pos, acc) AS (
  SELECT word, freq, syms, 1, CAST([] AS VARCHAR[]) FROM {prev}
  UNION ALL
  SELECT word, freq, syms,
         CASE WHEN pos < len(syms)
                   AND syms[pos] = (SELECT a FROM best{k})
                   AND syms[pos + 1] = (SELECT b FROM best{k})
              THEN pos + 2 ELSE pos + 1 END,
         list_append(acc,
           CASE WHEN pos < len(syms)
                     AND syms[pos] = (SELECT a FROM best{k})
                     AND syms[pos + 1] = (SELECT b FROM best{k})
                THEN (SELECT a || b FROM best{k}) ELSE syms[pos] END)
  FROM walk{k} WHERE pos <= len(syms)
)"""
        )
        ctes.append(
            f"""vocab{k} AS MATERIALIZED (
  SELECT word, freq, acc AS syms FROM walk{k} WHERE pos > len(syms)
)"""
        )
    return ctes


def sql_bpe_merges(
    table: str = "documents",
    text_col: str = "text",
    n_merges: int = N_MERGES,
) -> str:
    """DuckDB oracle for the merges table: each round's pair counts,
    argmax, and recursive-cursor merge walk, chained n_merges times."""
    ctes = _bpe_ctes(table, text_col, n_merges)
    sel = "\nUNION ALL\n".join(
        f"SELECT {k} AS it, a AS left_sym, b AS right_sym, cnt FROM best{k}"
        for k in range(1, n_merges + 1)
    )
    return f"""
WITH RECURSIVE {','.join(ctes)}
SELECT * FROM ({sel}) ORDER BY it
"""


def sql_bpe_encode(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = N_MERGES,
) -> str:
    """DuckDB oracle for :func:`bpe_encode_report`: re-encode every doc
    with the final learned vocab and report subword compression."""
    ctes = _bpe_ctes(table, text_col, n_merges)
    return f"""
WITH RECURSIVE {','.join(ctes)},
doc_tok AS MATERIALIZED (
  SELECT {id_col} AS doc_id, unnest({sql_tokenize(text_col)}) AS word
  FROM {table}
),
enc AS (
  SELECT t.doc_id, count(*) AS n_words,
         sum(len(v.syms)) AS n_subwords
  FROM doc_tok t JOIN vocab{n_merges} v USING (word)
  GROUP BY t.doc_id
)
SELECT d.{id_col} AS doc_id,
       CAST(coalesce(e.n_words, 0) AS BIGINT) AS n_words,
       CAST(coalesce(e.n_subwords, 0) AS BIGINT) AS n_subwords,
       round(CAST(coalesce(e.n_subwords, 0) AS DOUBLE)
             / greatest(coalesce(e.n_words, 0), 1), 6) AS subwords_per_word
FROM {table} d LEFT JOIN enc e ON d.{id_col} = e.doc_id
"""


def bpe_encode_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = N_MERGES,
) -> DataFrame:
    """Re-encode every document with the learned vocab: per-doc word and
    subword counts plus the compression ratio — the "how many tokens will
    training see" accounting step. One broadcast join of the (tiny) merged
    vocab onto the exploded corpus; everything else scan-side."""
    merges, vocab = bpe_learn(docs, id_col, text_col, n_merges)
    vlen = vocab.select("word", F.size("syms").cast("long").alias("n_syms"))
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokenize(text_col)).alias("word")
    )
    enc = (
        tok.join(F.broadcast(vlen), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_syms").alias("n_subwords"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(enc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_subwords", F.lit(0)).cast("long").alias("n_subwords"),
            F.round(
                F.coalesce("n_subwords", F.lit(0))
                / F.greatest(F.coalesce("n_words", F.lit(0)), F.lit(1)),
                6,
            ).alias("subwords_per_word"),
        )
    )
