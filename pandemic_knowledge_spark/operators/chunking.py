"""Document chunking: fixed token-budget windows with overlap.

Context-window preparation for LLM training/indexing: long documents are cut
into chunks of at most ``chunk_tokens`` tokens, consecutive chunks sharing
``overlap_tokens`` tokens so no span of context is lost at a boundary. The
reference has no notion of this (its documents are ES-indexed whole,
/root/reference/flow/scripts/crawl_mapping.py:1-24); a training-data engine
needs chunking first-class next to packing and dedup — it is the step that
turns a raw corpus into model-sized sequences.

Chunk grid for a doc with n tokens, size S = chunk_tokens, stride
T = S - overlap_tokens (> 0):

- n = 0  → no chunks (empty docs are the length filter's job),
- n <= S → one chunk, the whole doc,
- else  → n_chunks = 1 + ceil((n - S) / T); chunk i covers 1-based token
  positions [i*T + 1, min(i*T + S, n)]. Every position is covered, every
  boundary is straddled by an overlap, and the last chunk is never empty
  (its size is in [1, S]).

Scale shape: ONE scan, NO shuffle, NO Python. Tokenize, the chunk count,
the exploded chunk index, and the per-chunk slice are all codegen'd array
expressions — chunking 100 TB is embarrassingly parallel and this plan keeps
it that way (a chunk never crosses a row, a row never crosses a partition).
The explode multiplies rows by ~n/T, which is the output's true size, not
overhead.

Cross-engine parity: all arithmetic is integer (the ceil is the exact
integer identity 1 + (n - S + T - 1) div T); chunk text is a single-space
join of the token slice. DuckDB reproduces every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandemic_knowledge_spark.functions.text import sql_tokenize, tokenize

CHUNK_TOKENS = 32
OVERLAP_TOKENS = 8


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = CHUNK_TOKENS,
    overlap_tokens: int = OVERLAP_TOKENS,
    carry_cols: tuple[str, ...] = (),
    tokens_col: str | None = None,
) -> DataFrame:
    """(doc_id, *carry_cols, chunk_id, chunk_text, n_chunk_tokens) — the
    sliding chunk grid above. chunk_id is 0-based and dense per doc;
    ``carry_cols`` ride along unchanged (e.g. source/lang for downstream
    grouping without a join back).

    ``tokens_col``: an already-materialized token-array column to chunk
    from INSTEAD of tokenizing ``text_col`` — the fusion handle for
    pipelines whose upstream op already tokenized (e.g.
    ``quality_keep_gate(..., keep_tokens=...)``): the corpus is then
    tokenized once end-to-end (r13). Must be a real (pinned/materialized)
    column, not a lazy alias of tokenize()."""
    s, t = _grid(chunk_tokens, overlap_tokens)
    from pandemic_knowledge_spark.functions.pinning import pin

    # Tokens behind a pin barrier: with a plain alias the __n > 0 filter
    # pushes below the projection and re-runs the tokenizer regexp per row
    # next to the Project's own evaluation (r13 census —
    # corpus_training_prep's before plan tokenized 2x on the chunk side).
    # Upstream predicates (e.g. a quality gate on the raw docs) are applied
    # to `docs` BEFORE this select, so they still reach the scan below the
    # barrier.
    if tokens_col is not None:
        toked = docs.select(
            F.col(id_col).alias("doc_id"), *carry_cols,
            F.col(tokens_col).alias("__toks"),
        )
    else:
        toked = pin(
            docs.select(
                F.col(id_col).alias("doc_id"), *carry_cols, F.col(text_col)
            ),
            __toks=tokenize(text_col),
        ).select("doc_id", *carry_cols, "__toks")  # drop raw text pre-explode
    base = toked.withColumn("__n", F.size("__toks")).filter(F.col("__n") > 0)
    # exact integer ceil: 1 + (n - S + T - 1) div T  ==  1 + ceil((n-S)/T)
    n_chunks = F.when(F.col("__n") <= s, F.lit(1)).otherwise(
        (F.lit(1) + (F.col("__n") - s + (t - 1)) / t).cast("int")
    )
    start = F.col("chunk_id") * t + 1
    length = F.least(F.lit(s), F.col("__n") - F.col("chunk_id") * t)
    return (
        base.withColumn(
            "chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1))
        )
        .select(
            "doc_id",
            *carry_cols,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.array_join(F.slice("__toks", start, length), " ").alias(
                "chunk_text"
            ),
            length.cast("long").alias("n_chunk_tokens"),
        )
    )


def sql_chunk_documents(
    table: str,
    id_col: str,
    text_col: str,
    chunk_tokens: int = CHUNK_TOKENS,
    overlap_tokens: int = OVERLAP_TOKENS,
) -> str:
    """DuckDB SQL reproducing :func:`chunk_documents` exactly."""
    s, t = _grid(chunk_tokens, overlap_tokens)
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id, {sql_tokenize(text_col)} AS toks
  FROM {table}
), n AS (
  SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0
), c AS (
  SELECT doc_id, toks, n,
         CASE WHEN n <= {s} THEN 1
              ELSE 1 + (n - {s} + {t - 1}) // {t} END AS n_chunks
  FROM n
), e AS (
  SELECT doc_id, toks, n, unnest(range(0, n_chunks)) AS chunk_id FROM c
)
SELECT doc_id,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       array_to_string(
         list_slice(toks, chunk_id * {t} + 1,
                    least(chunk_id * {t} + {s}, n)), ' ') AS chunk_text,
       CAST(least({s}, n - chunk_id * {t}) AS BIGINT) AS n_chunk_tokens
FROM e
"""


def _grid(chunk_tokens: int, overlap_tokens: int) -> tuple[int, int]:
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap ({overlap_tokens}) < chunk size "
            f"({chunk_tokens}) so the stride is positive"
        )
    return chunk_tokens, chunk_tokens - overlap_tokens
