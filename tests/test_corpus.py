"""Handcrafted unit tests for the corpus-assembly operators
(operators/corpus.py): decontamination, sequence packing, weighted mixing.
The sf0.01 oracle equivalence lives in test_entry_oracle; these pin the
operator semantics on tiny, fully-understood inputs."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from jobscrawler_spark.operators.corpus import (
    HEX_SPAN,
    decontaminate_ngram,
    mix_threshold_hex,
    pack_sequences,
    weighted_mix,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    )


W = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 wa wb wc wd we wf"  # 16 distinct tokens


def test_decontaminate_flags_quoted_span(spark):
    docs = _docs(
        spark,
        [
            (1, "web", W),                      # contains the benchmark span
            (2, "web", "totally different text with no overlap at all here ok"),
            (3, "web", "w0 w1 w2 w3 w4 w5 w6 w7 tail tail2"),  # one shared 8-gram
        ],
    )
    bench = spark.createDataFrame(
        pd.DataFrame({"bench_id": [100], "text": ["w0 w1 w2 w3 w4 w5 w6 w7 w8"]})
    )
    out = {
        (r["doc_id"], r["bench_id"]): r["n_shared_grams"]
        for r in decontaminate_ngram(docs, bench, n=8).collect()
    }
    # bench has two 8-grams (w0..w7, w1..w8); doc1 contains both, doc3 one
    assert out == {(1, 100): 2, (3, 100): 1}


def test_decontaminate_min_shared_and_df_cap(spark):
    docs = _docs(
        spark,
        [(i, "web", "w0 w1 w2 w3 w4 w5 w6 w7 suffix%d" % i) for i in range(5)],
    )
    bench = spark.createDataFrame(
        pd.DataFrame({"bench_id": [9], "text": ["w0 w1 w2 w3 w4 w5 w6 w7"]})
    )
    # the shared gram appears in 5 docs; a DF cap of 4 drops it entirely
    assert decontaminate_ngram(docs, bench, n=8, max_doc_freq=4).count() == 0
    # without the cap all 5 are flagged; min_shared=2 then unflags them
    assert decontaminate_ngram(docs, bench, n=8, max_doc_freq=None).count() == 5
    assert (
        decontaminate_ngram(docs, bench, n=8, max_doc_freq=None, min_shared=2).count()
        == 0
    )


def test_pack_sequences_handcrafted_bins(spark):
    # token counts: 3, 4, 5, 10 in doc_id order within one source
    docs = _docs(
        spark,
        [
            (1, "s", "a b c"),
            (2, "s", "a b c d"),
            (3, "s", "a b c d e"),
            (4, "s", " ".join(["t"] * 10)),
            (9, "other", "x y"),
        ],
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["bin_id"], r["bin_offset"])
        for r in pack_sequences(docs, budget=8).collect()
    }
    # preceding totals in (source, doc_id) order: 0, 3, 7, 12
    assert out[1] == (3, 0, 0)
    assert out[2] == (4, 0, 3)
    assert out[3] == (5, 0, 7)   # starts in bin 0 at offset 7 (spills into 1)
    assert out[4] == (10, 1, 4)
    assert out[9] == (2, 0, 0)   # other source packs independently


def test_pack_sequences_deterministic_across_partitionings(spark):
    rows = [(i, f"s{i % 3}", " ".join(["w"] * (1 + i % 7))) for i in range(60)]
    a = pack_sequences(_docs(spark, rows), budget=16).collect()
    b = pack_sequences(_docs(spark, rows).repartition(13), budget=16).collect()
    key = lambda r: (r["source"], r["doc_id"])
    assert sorted(map(tuple, a), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, b), key=lambda t: (t[0], t[1])
    )


def test_mix_threshold_hex_contract():
    assert mix_threshold_hex(0.0) == "00000000"
    assert mix_threshold_hex(0.25) == "40000000"
    assert mix_threshold_hex(0.5) == "80000000"
    assert mix_threshold_hex(1.0) == "g"  # above every hex prefix
    assert mix_threshold_hex(2.0) == "g"
    assert "ffffffff" < "g"  # the keep-everything compare actually holds


@pytest.mark.parametrize("rate,lo,hi", [(0.0, 0, 0), (0.5, 350, 650), (1.0, 1000, 1000)])
def test_weighted_mix_rates(spark, rate, lo, hi):
    docs = _docs(spark, [(i, "s", "x") for i in range(1000)])
    rates = spark.createDataFrame(
        [("s", mix_threshold_hex(rate))], "source string, threshold_hex string"
    )
    n = weighted_mix(docs, rates).count()
    assert lo <= n <= hi, (rate, n)


def test_weighted_mix_missing_source_keeps_all(spark):
    docs = _docs(spark, [(i, "unlisted", "x") for i in range(50)])
    rates = spark.createDataFrame(
        [("s", mix_threshold_hex(0.0))], "source string, threshold_hex string"
    )
    out = weighted_mix(docs, rates)
    assert out.count() == 50
    assert set(out.columns) == {"doc_id", "source", "text"}  # helper cols dropped


def test_weighted_mix_is_a_stable_subset(spark):
    """Lowering a rate must select a SUBSET of the higher rate's survivors
    (threshold comparison is monotone in the rate) — the property that
    makes mixture re-weighting reproducible."""
    docs = _docs(spark, [(i, "s", "x") for i in range(500)])
    survivors = {}
    for rate in (0.2, 0.6):
        rates = spark.createDataFrame(
            [("s", mix_threshold_hex(rate))], "source string, threshold_hex string"
        )
        survivors[rate] = {r["doc_id"] for r in weighted_mix(docs, rates).collect()}
    assert survivors[0.2] <= survivors[0.6]
    assert len(survivors[0.2]) < len(survivors[0.6])


# --- property tests (hypothesis) -------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=30),
    st.integers(min_value=1, max_value=64),
)
def test_prop_packing_invariants(token_counts, budget):
    """Pure-Python mirror of the window-cumsum pack: offsets stay inside
    the budget, bins are monotone non-decreasing, and each document's
    (bin_id, bin_offset) equals floor/mod of the preceding total — the
    exact contract the Spark window implements."""
    pre = 0
    last_bin = 0
    for n in token_counts:
        bin_id, off = pre // budget, pre % budget
        assert 0 <= off < budget
        assert bin_id >= last_bin
        last_bin = bin_id
        pre += n
