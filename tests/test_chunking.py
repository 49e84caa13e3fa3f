"""Document chunking: grid semantics vs a direct Python reference, coverage
and overlap invariants, and degenerate inputs."""

from __future__ import annotations

import re

import pytest

from pandemic_knowledge_spark.operators.chunking import (
    CHUNK_TOKENS,
    OVERLAP_TOKENS,
    chunk_documents,
)

TOKEN_RE = re.compile("[a-z0-9]+")


def py_chunks(text: str, s: int, t: int) -> list[tuple[int, str, int]]:
    toks = TOKEN_RE.findall(text.lower())
    n = len(toks)
    if n == 0:
        return []
    n_chunks = 1 if n <= s else 1 + -((n - s) // -t)
    out = []
    for i in range(n_chunks):
        piece = toks[i * t : min(i * t + s, n)]
        out.append((i, " ".join(piece), len(piece)))
    return out


DOCS = [
    (0, "one two three four five six seven eight nine ten"),
    (1, "a"),
    (2, ""),
    (3, "???"),  # tokenizes to nothing
    (4, " ".join(f"w{i}" for i in range(100))),
    (5, " ".join(f"w{i % 7}" for i in range(33))),  # exactly S+1 at S=32
    (6, " ".join("x" for _ in range(32))),  # exactly S
]


@pytest.fixture(scope="module")
def chunked(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = chunk_documents(df, "doc_id", "text").collect()
    return sorted((r.doc_id, r.chunk_id, r.chunk_text, r.n_chunk_tokens) for r in rows)


def test_matches_python_reference(chunked):
    expect = sorted(
        (doc_id, i, txt, k)
        for doc_id, text in DOCS
        for i, txt, k in py_chunks(text, CHUNK_TOKENS, CHUNK_TOKENS - OVERLAP_TOKENS)
    )
    assert chunked == expect


def test_empty_docs_produce_no_chunks(chunked):
    assert {d for d, *_ in chunked} == {0, 1, 4, 5, 6}


def test_coverage_and_overlap(chunked):
    """Every token position of every doc is covered; consecutive chunks
    overlap by exactly OVERLAP_TOKENS (except a shorter final chunk)."""
    t = CHUNK_TOKENS - OVERLAP_TOKENS
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for doc_id, chunk_id, _txt, k in chunked:
        by_doc.setdefault(doc_id, []).append((chunk_id, k))
    for doc_id, chunks in by_doc.items():
        chunks.sort()
        n = len(TOKEN_RE.findall(dict(DOCS)[doc_id].lower()))
        covered = set()
        for i, k in chunks:
            assert 1 <= k <= CHUNK_TOKENS
            covered.update(range(i * t, i * t + k))
        assert covered == set(range(n))


def test_single_chunk_at_exact_size(chunked):
    assert [c for c in chunked if c[0] == 6] == [(6, 0, " ".join(["x"] * 32), 32)]


def test_bad_overlap_rejected(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=8, overlap_tokens=8)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=8, overlap_tokens=-1)


def test_no_shuffle_no_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = chunk_documents(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_fused_gate_chunker_equals_unfused_composition(spark):
    """The single-tokenize fusion (quality_keep_gate(keep_tokens=...) ->
    chunk_documents(tokens_col=...)) returns exactly the rows of the
    unfused composition, and its plan runs the tokenizer regexp at ONE
    site where the unfused plan has two (r13 optimization)."""
    from pandemic_knowledge_spark.operators.quality import (
        hash_weights,
        quality_keep_gate,
    )

    df = spark.createDataFrame(
        [(i, t, f"src{i % 2}") for i, t in DOCS], "doc_id long, text string, source string"
    )
    w = hash_weights()
    unfused = chunk_documents(
        quality_keep_gate(df, "text", w), "doc_id", "text", carry_cols=("source",)
    )
    fused = chunk_documents(
        quality_keep_gate(df, "text", w, keep_tokens="__toks"),
        "doc_id", "text", carry_cols=("source",), tokens_col="__toks",
    )
    assert sorted(map(tuple, fused.collect())) == sorted(map(tuple, unfused.collect()))
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("regexp_extract_all") == 1, plan
