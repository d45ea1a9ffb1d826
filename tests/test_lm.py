"""Bigram-LM perplexity filter (functions/lm.py): handcrafted integer
surprisal tables, Spark==Python scoring parity, and the semantic sanity
that in-domain text outscores gibberish."""

import math

from pyspark.sql import functions as F

from jobscrawler_spark.functions import lm


def test_train_tables_handcrafted():
    # sample: "a b a b" and "a c" -> V=3; c1: a=3,b=2,c=1
    # bigrams: (a,b)x2, (b,a)x1, (a,c)x1
    pair, back, unk = lm.train_bigram_lm([(0, "a b a b"), (1, "a c")])
    assert unk == round(math.log2(3) * 1000)
    assert pair[("a", "b")] == round(-math.log2((2 + 1) / (3 + 3)) * 1000) == 1000
    assert pair[("b", "a")] == round(-math.log2((1 + 1) / (2 + 3)) * 1000)
    assert pair[("a", "c")] == round(-math.log2((1 + 1) / (3 + 3)) * 1000)
    assert back["c"] == round(math.log2(1 + 3) * 1000) == 2000
    assert set(back) == {"a", "b", "c"}


def test_score_matches_python_and_handles_short_docs(spark):
    pair, back, unk = lm.train_bigram_lm([(0, "a b a b"), (1, "a c")])
    docs = spark.createDataFrame(
        [
            (0, "a b a b"),     # all observed bigrams
            (1, "a b z"),       # (a,b) observed, (b,z) -> backoff[b]
            (2, "z q"),         # unseen w1 -> unk
            (3, "solo"),        # < 2 tokens -> unk
            (4, ""),            # empty -> unk
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["ppl_scaled"]
        for r in lm.score_perplexity(docs, pair, back, unk).collect()
    }
    def py(text):
        toks = text.split()
        bs = list(zip(toks, toks[1:]))
        if not bs:
            return unk
        return sum(pair.get(g, back.get(g[0], unk)) for g in bs) // len(bs)
    assert got == {i: py(t) for i, t in
                   [(0, "a b a b"), (1, "a b z"), (2, "z q"), (3, "solo"), (4, "")]}
    assert got[3] == unk and got[4] == unk


def test_in_domain_beats_gibberish(spark):
    sample = [(i, "the quick brown fox jumps over the lazy dog") for i in range(8)]
    pair, back, unk = lm.train_bigram_lm(sample)
    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps"), (1, "zyx wvu tsr qpo nml")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["ppl_scaled"]
        for r in lm.score_perplexity(docs, pair, back, unk).collect()
    }
    assert got[0] < got[1]
