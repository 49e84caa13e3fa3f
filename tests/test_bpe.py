"""BPE vocabulary learning (operators.bpe): the Spark merge loop must
reproduce the Sennrich reference algorithm exactly — merge choice,
tie-breaks, greedy-left application — on planted and random corpora."""

from __future__ import annotations

import collections
import random
import re

from pandemic_knowledge_spark.operators.bpe import END_MARK, bpe_learn


def ref_bpe(texts, n):
    """Sennrich et al. 2016 reference: char vocab + end mark, argmax pair
    (count desc, lexicographic tie-break), single-pass greedy-left merge."""
    vocab = collections.Counter()
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            vocab[tuple(list(w) + [END_MARK])] += 1
    merges = []
    for it in range(1, n + 1):
        pairs = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((it, a, b, cnt))
        nv = collections.Counter()
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] += f
        vocab = nv
    return merges


def _learn(spark, texts, n):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    mdf, vocab = bpe_learn(docs, n_merges=n)
    got = [(r.it, r.left_sym, r.right_sym, r.cnt) for r in mdf.orderBy("it").collect()]
    return got, vocab


def test_matches_reference_on_planted_corpus(spark):
    texts = ["low lower lowest", "new newer newest", "low low new"]
    got, _ = _learn(spark, texts, 6)
    assert got == ref_bpe(texts, 6)


def test_matches_reference_on_random_corpus(spark):
    rng = random.Random(5)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
             for _ in range(30)]
    texts = [" ".join(rng.choice(words) for _ in range(15)) for _ in range(20)]
    got, _ = _learn(spark, texts, 10)
    assert got == ref_bpe(texts, 10)


def test_overlapping_run_merges_left_to_right(spark):
    # "aaaa" -> pair (a,a) merges non-overlapping left-to-right: aa aa
    texts = ["aaaa aaaa aaaa"]
    got, vocab = _learn(spark, texts, 1)
    assert got == ref_bpe(texts, 1)
    assert got[0][1] == "a" and got[0][2] == "a"
    syms = vocab.collect()[0].syms
    assert syms == ["aa", "aa", END_MARK]


def test_merge_stops_at_word_boundary(spark):
    # end mark prevents cross-word merges: "ab ab" learns (a,b) with count
    # 2, never a pair spanning the boundary
    texts = ["ab ab"]
    got, _ = _learn(spark, texts, 1)
    assert got == ref_bpe(texts, 1)
    assert (got[0][1], got[0][2]) != (END_MARK, "a")


def test_exhausted_corpus_stops_early(spark):
    # single 1-char word: only pair is (x, END); after merging it there are
    # no pairs left -> fewer merges than requested
    got, _ = _learn(spark, ["x x x"], 5)
    assert got == ref_bpe(["x x x"], 5)
    assert len(got) == 1


def test_encode_report_counts_and_compression(spark):
    from pandemic_knowledge_spark.operators.bpe import bpe_encode_report

    texts = ["low low low lower lowest", "low lower", "...!!!"]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = {r.doc_id: r for r in bpe_encode_report(docs, n_merges=6).collect()}
    assert set(out) == {0, 1, 2}                 # empty doc keeps its row
    assert out[2].n_words == 0 and out[2].n_subwords == 0
    assert out[0].n_words == 5
    # merges compress: subwords per word < chars+endmark per word
    chars_plus_end = sum(len(w) + 1 for w in texts[0].split())
    assert out[0].n_subwords < chars_plus_end
    # frequent 'low' should be fully merged after 6 rounds on this corpus:
    # every word's symbol count >= 1, ratio >= 1 subword per word
    assert out[0].subwords_per_word >= 1.0
