"""Bigram LM scoring (operators.lm): a Python reference on planted
corpora, plus the behavioral property that matters — text unlike the
training corpus scores worse than text drawn from it."""

from __future__ import annotations

import math
import re

from pandemic_knowledge_spark.operators.lm import MICRO, lm_score


def _toks(t):
    return re.findall(r"[a-z0-9]+", t.lower())


def ref_scores(train_texts, score_texts):
    big: dict[tuple, int] = {}
    hist: dict[str, int] = {}
    vocab = set()
    for t in train_texts:
        ts = _toks(t)
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            hist[a] = hist.get(a, 0) + 1
    v = len(vocab)
    out = {}
    for i, t in enumerate(score_texts):
        ts = _toks(t)
        if len(ts) < 2:
            continue
        s = 0
        for a, b in zip(ts, ts[1:]):
            p = (big.get((a, b), 0) + 1) / (hist.get(a, 0) + v)
            # Python round() is half-even; the engines round half away from
            # zero — match them explicitly
            x = math.log(p) * MICRO
            s += math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)
        out[i] = (len(ts) - 1, round(-s / (len(ts) - 1) / MICRO, 4))
    return out


def _spark_scores(spark, train_texts, score_texts):
    mk = lambda texts: spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    return {
        r.doc_id: (r.n_bigrams, r.xent_nats)
        for r in lm_score(mk(train_texts), mk(score_texts)).collect()
    }


def test_matches_python_reference(spark):
    train = ["the cat sat on the mat", "the dog sat on the rug", "cat and dog"]
    score = ["the cat sat", "dog the mat on", "zz yy xx", "single"]
    assert _spark_scores(spark, train, score) == ref_scores(train, score)


def test_in_domain_beats_gibberish(spark):
    train = ["alpha beta gamma delta"] * 5 + ["beta gamma delta epsilon"] * 5
    score = ["alpha beta gamma delta", "epsilon delta beta alpha"]
    out = _spark_scores(spark, train, score)
    assert out[0][1] < out[1][1]  # fluent order scores lower cross-entropy


def test_short_docs_dropped(spark):
    out = _spark_scores(spark, ["a b c"], ["only", ""])
    assert out == {}


def test_collocations_pmi_finds_planted_phrase(spark):
    from pandemic_knowledge_spark.operators.lm import collocations_pmi

    # "hong kong" always co-occurs; filler words are independent
    import random
    rng = random.Random(2)
    filler = ["the", "of", "data", "table", "row", "scan"]
    texts = []
    for i in range(30):
        words = [rng.choice(filler) for _ in range(12)]
        words[4:4] = ["hong", "kong"]
        texts.append(" ".join(words))
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    top = collocations_pmi(docs, top_k=5, min_count=5).collect()
    assert (top[0].a, top[0].b) == ("hong", "kong")
    assert top[0].pmi > 1.0


def test_collocations_min_count_guard(spark):
    from pandemic_knowledge_spark.operators.lm import collocations_pmi

    docs = spark.createDataFrame(
        [(0, "rare pair here"), (1, "other words entirely")],
        "doc_id long, text string",
    )
    assert collocations_pmi(docs, min_count=5).collect() == []
