"""Handcrafted unit tests for the corpus-assembly operators
(operators/corpus.py): decontamination, sequence packing, weighted mixing.
The sf0.01 oracle equivalence lives in test_entry_oracle; these pin the
operator semantics on tiny, fully-understood inputs."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from jobscrawler_spark.operators.corpus import (
    ASPECT_BUCKETS,
    HEX_SPAN,
    decontaminate_ngram,
    mix_threshold_hex,
    pack_image_batches,
    pack_sequences,
    temperature_thresholds,
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


def test_temperature_thresholds_contract():
    """size^alpha temperature sampling: equal sizes degrade to the flat
    target rate, alpha=1 is proportional sampling (flat rate again), the
    low-resource boost caps at keep-everything, and sizes are chosen so
    every intermediate float is exact (no boundary luck)."""
    assert dict(temperature_thresholds({"a": 100, "b": 100})) == {
        "a": mix_threshold_hex(0.5),
        "b": mix_threshold_hex(0.5),
    }
    t1 = dict(temperature_thresholds({"a": 768, "b": 256}, alpha=1.0))
    assert t1["a"] == t1["b"] == mix_threshold_hex(0.5)
    t = dict(temperature_thresholds({"big": 900, "small": 100}))
    assert t["small"] == "g"  # boosted past 1.0 -> keep everything
    assert t["big"] < mix_threshold_hex(0.5)  # dominant source damped


def test_temperature_mix_boosts_low_resource(spark):
    rows = [(i, "big" if i < 900 else "small", "x") for i in range(1000)]
    docs = _docs(spark, rows)
    trates = spark.createDataFrame(
        temperature_thresholds({"big": 900, "small": 100}),
        "source string, threshold_hex string",
    )
    kept = {
        r["source"]: r["count"]
        for r in weighted_mix(docs, trates).groupBy("source").count().collect()
    }
    assert kept["small"] == 100  # low-resource source fully kept
    assert kept["small"] / 100 > kept["big"] / 900
    assert 350 <= kept["big"] + kept["small"] <= 650  # near the N/2 target


# --- image batch packing (r5) ----------------------------------------------


def _imgs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "w", "h"])
    )


def test_aspect_buckets_match_float_nearest_class(spark):
    """The integer cross-multiplication bucketing must agree with the
    straightforward float nearest-ratio assignment (boundaries = the
    arithmetic midpoints the thresholds encode) on a sweep of shapes —
    the integer form exists so DuckDB and Spark cannot disagree on a
    float's last ulp, not to change the classes."""
    ratios = [0.5, 9 / 16, 0.75, 1.0, 4 / 3, 16 / 9, 2.0]
    shapes = [(w, h) for w in range(8, 80, 7) for h in range(8, 80, 9)]
    df = _imgs(spark, [(f"i{w}x{h}", w, h) for w, h in shapes])
    got = {
        r["image_id"]: r["aspect_bucket"]
        for r in pack_image_batches(df, pixel_budget=1 << 20).collect()
    }
    for w, h in shapes:
        r = min(max(w / h, 0.5), 2.0)  # extremes clamp into the end classes
        want = ASPECT_BUCKETS[min(range(7), key=lambda i: abs(r - ratios[i]))]
        assert got[f"i{w}x{h}"] == want, (w, h, got[f"i{w}x{h}"], want)


def test_pack_image_batches_handcrafted(spark):
    # all square -> one bucket; pixel counts 64, 256, 1024 in id order
    df = _imgs(spark, [("a", 8, 8), ("b", 16, 16), ("c", 32, 32)])
    out = {
        r["image_id"]: (r["n_px"], r["bin_id"], r["bin_offset"])
        for r in pack_image_batches(df, pixel_budget=300).collect()
    }
    assert out["a"] == (64, 0, 0)
    assert out["b"] == (256, 0, 64)   # spills into bin 1
    assert out["c"] == (1024, 1, 20)  # preceding 320 -> bin 1 offset 20


def test_pack_image_batches_sharding_splits_groups(spark):
    rows = [(f"img{i:03d}", 8 + i % 17, 8 + (i * 7) % 17) for i in range(200)]
    flat = pack_image_batches(_imgs(spark, rows), pixel_budget=1024)
    sharded = pack_image_batches(
        _imgs(spark, rows), pixel_budget=1024, shard_hex_chars=1
    )
    n_flat = flat.select("aspect_bucket").distinct().count()
    n_sharded = sharded.select("aspect_bucket").distinct().count()
    assert n_flat <= 7
    assert n_sharded > n_flat  # the md5 shard actually widens the key space
    # sharding re-groups but never changes an item's pixel count
    a = {r["image_id"]: r["n_px"] for r in flat.collect()}
    b = {r["image_id"]: r["n_px"] for r in sharded.collect()}
    assert a == b


def test_pack_image_batches_deterministic_across_partitionings(spark):
    rows = [(f"img{i:03d}", 8 + i % 29, 8 + (i * 11) % 29) for i in range(120)]
    a = pack_image_batches(_imgs(spark, rows), pixel_budget=2048, shard_hex_chars=1)
    b = pack_image_batches(
        _imgs(spark, rows).repartition(13), pixel_budget=2048, shard_hex_chars=1
    )
    key = lambda t: (t[0], t[1])
    assert sorted(map(tuple, a.collect()), key=key) == sorted(
        map(tuple, b.collect()), key=key
    )


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


# ---------------------------------------------------- epoch shuffle / split

@pytest.fixture(scope="module")
def sdocs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source", "lang"
    ).cache()


def test_epoch_shuffle_matches_python_global_order(spark, sdocs):
    """The two-phase sharded ranking must equal the naive global order:
    positions are a 0..n-1 permutation sorted by (md5 key, id), re-derived
    in pure Python from collected ids."""
    import hashlib

    from jobscrawler_spark.operators.corpus import epoch_shuffle

    got = {r["doc_id"]: r["pos"] for r in epoch_shuffle(sdocs, epoch=1).collect()}
    ids = [r["doc_id"] for r in sdocs.select("doc_id").collect()]
    order = sorted(
        ids, key=lambda i: (hashlib.md5(f"shuffle|1|{i}".encode()).hexdigest(), i)
    )
    want = {i: pos for pos, i in enumerate(order)}
    assert got == want
    assert sorted(got.values()) == list(range(len(ids)))


def test_epoch_shuffle_epochs_differ_and_rerun_identical(spark, sdocs):
    from jobscrawler_spark.operators.corpus import epoch_shuffle

    e1a = {r["doc_id"]: r["pos"] for r in epoch_shuffle(sdocs, epoch=1).collect()}
    e1b = {r["doc_id"]: r["pos"] for r in epoch_shuffle(sdocs, epoch=1).collect()}
    e2 = {r["doc_id"]: r["pos"] for r in epoch_shuffle(sdocs, epoch=2).collect()}
    assert e1a == e1b
    assert e1a != e2


def test_hash_split_disjoint_exhaustive_fractions(spark, sdocs):
    from jobscrawler_spark.operators.corpus import hash_split

    rows = hash_split(sdocs).select("doc_id", "split").collect()
    n = sdocs.count()
    assert len(rows) == n  # exhaustive, one split per doc
    share = {s: 0 for s in ("train", "val", "test")}
    for r in rows:
        share[r["split"]] += 1
    assert abs(share["train"] / n - 0.9) < 0.05, share
    assert abs(share["val"] / n - 0.05) < 0.03, share
    assert abs(share["test"] / n - 0.05) < 0.03, share


def test_hash_split_prefix_monotone(spark, sdocs):
    """Growing a prefix split keeps every id it already had — the
    cumulative-interval property that makes ratios re-tunable."""
    from jobscrawler_spark.operators.corpus import hash_split

    small = {
        r["doc_id"]
        for r in hash_split(sdocs, [("train", 0.5), ("rest", 0.5)])
        .filter(F.col("split") == "train")
        .collect()
    }
    big = {
        r["doc_id"]
        for r in hash_split(sdocs, [("train", 0.7), ("rest", 0.3)])
        .filter(F.col("split") == "train")
        .collect()
    }
    assert small <= big
    assert len(big) > len(small)


# ------------------------------------------------------------- chunking

def test_chunk_documents_handcrafted(spark):
    from jobscrawler_spark.operators.corpus import chunk_documents

    toks = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame(
        [(1, "s", toks), (2, "s", "a b"), (3, "s", "")],
        "doc_id long, source string, text string",
    )
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["start"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(df, window=4, stride=3).collect()
    )
    # doc 1: n=10, W=4, S=3 -> n_chunks = ceil((10-4)/3)+1 = 3; starts 0,3,6
    # (last chunk [6..10) reaches the final token)
    assert rows == [
        (1, 0, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 3, 4, "t3 t4 t5 t6"),
        (1, 2, 6, 4, "t6 t7 t8 t9"),
        (2, 0, 0, 2, "a b"),
        (3, 0, 0, 0, ""),
    ]


def test_chunk_documents_covers_every_token_with_overlap(spark):
    from jobscrawler_spark.operators.corpus import chunk_documents

    n = 101  # (n - W) not divisible by S -> short-tail case
    df = spark.createDataFrame(
        [(1, "s", " ".join(f"w{i}" for i in range(n)))],
        "doc_id long, source string, text string",
    )
    rows = sorted(
        (r["chunk_idx"], r["start"], r["n_chunk_tokens"])
        for r in chunk_documents(df, window=16, stride=12).collect()
    )
    # consecutive chunks overlap by W - S tokens; union covers [0, n)
    covered = set()
    for idx, start, k in rows:
        assert start == idx * 12
        covered.update(range(start, start + k))
    assert covered == set(range(n))
    assert rows[-1][1] + 16 >= n  # final window reaches the last token


def test_chunk_documents_plan_is_mapside(spark, sdocs):
    """SCALING.md claim: chunking is pure map-side — no Exchange, no
    Join, no Window in the physical plan."""
    from jobscrawler_spark.operators.corpus import chunk_documents

    plan = (
        chunk_documents(sdocs.withColumn("text", F.col("source")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    for node in ("Exchange", "Join", "Window"):
        assert node not in plan, f"{node} in chunking plan:\n{plan}"


def test_epoch_shuffle_never_single_partitions(spark, sdocs):
    """SCALING.md claim: the ranking window partitions on the 256-way
    shard key — no SinglePartition Exchange anywhere in the plan."""
    from jobscrawler_spark.operators.corpus import epoch_shuffle

    plan = epoch_shuffle(sdocs, epoch=1)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    assert "Window" in plan  # the partitioned window is there


def _tfidf_py(rows, n_buckets=1024, top_k=3, scale=1000):
    """Pure-Python recompute of the tfidf_keywords contract (hashing-trick
    bucket df -> scaled-integer smooth idf -> tf * idf -> top-k by
    (score desc, token asc)) — independent of the operator code path."""
    import hashlib
    import math
    from collections import Counter

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % n_buckets

    df = Counter()
    for _, text in rows:
        df.update({bucket(t) for t in text.split() if t})
    n = len(rows)
    idf = {b: round((math.log((n + 1) / (d + 1)) + 1.0) * scale) for b, d in df.items()}
    out = []
    for doc_id, text in rows:
        tf = Counter(t for t in text.split() if t)
        scored = sorted(
            ((t, c, c * idf[bucket(t)]) for t, c in tf.items()),
            key=lambda x: (-x[2], x[0]),
        )
        for rn, (t, c, s) in enumerate(scored[:top_k], start=1):
            out.append((doc_id, t, c, s, rn))
    return sorted(out)


def test_tfidf_keywords_matches_python_recompute(spark):
    from jobscrawler_spark.operators.corpus import tfidf_keywords

    rows = [
        (1, "alpha alpha alpha the the of common alpha"),
        (2, "the the the of of beta beta gamma"),
        (3, "the of common common common delta"),
        (4, "the of common epsilon epsilon epsilon epsilon"),
    ]
    docs = _docs(spark, [(i, "web", t) for i, t in rows]).select("doc_id", "text")
    got = sorted(
        (r["doc_id"], r["token"], r["tf"], r["score"], r["rn"])
        for r in tfidf_keywords(docs).collect()
    )
    assert got == _tfidf_py(rows)


def test_tfidf_keywords_rare_term_outranks_stopword(spark):
    from jobscrawler_spark.operators.corpus import tfidf_keywords

    # 'the' appears in every doc (df=8 -> low idf); each doc's unique term
    # appears once (df=1 -> high idf). With tf('the')=2 vs tf(unique)=1 the
    # unique term must still win rank 1 in every doc.
    rows = [(i, f"the the uniq{i}") for i in range(8)]
    docs = _docs(spark, [(i, "web", t) for i, t in rows]).select("doc_id", "text")
    top1 = {
        r["doc_id"]: r["token"]
        for r in tfidf_keywords(docs, top_k=1).collect()
    }
    assert top1 == {i: f"uniq{i}" for i in range(8)}


def test_tfidf_keywords_deterministic_across_partitionings(spark):
    from jobscrawler_spark.operators.corpus import tfidf_keywords

    rows = [(i, "web", f"tok{i % 5} tok{i % 7} shared text body {i % 3}") for i in range(40)]
    docs = _docs(spark, rows).select("doc_id", "text")
    a = sorted(map(tuple, tfidf_keywords(docs).collect()))
    b = sorted(map(tuple, tfidf_keywords(docs.repartition(13)).collect()))
    assert a == b


# ---------------------------------------------------------------- DSIR


def _dsir_docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "lang", "text"])
    )


@pytest.fixture()
def dsir_corpus(spark):
    # target-like docs share the "alpha beta ..." vocabulary; off-target
    # docs are digit gibberish with no gram overlap
    rows = []
    vocab = "alpha beta gamma delta epsilon zeta eta theta"
    for i in range(12):
        toks = vocab.split()
        rot = toks[i % 8 :] + toks[: i % 8]
        rows.append((i, f"s{i % 2}", "en", " ".join(rot)))
    for i in range(12, 24):
        # same token count as the vocab docs so raw score sums compare
        # per-gram quality, not document length
        gib = " ".join(f"g{i}x{j}" for j in range(8))
        rows.append((i, f"s{i % 2}", "xx", gib))
    return rows


def test_dsir_select_matches_python_recompute(spark, dsir_corpus):
    from jobscrawler_spark.operators.corpus import dsir_select
    from jobscrawler_spark.oracle.expected import dsir_selected_independent

    d = _dsir_docs(spark, dsir_corpus)
    got = {
        (r["doc_id"], r["dsir_score"])
        for r in dsir_select(d, d.filter(F.col("lang") == "en"), 0.5).collect()
    }
    want = set(
        dsir_selected_independent(
            [(i, t, lang) for i, _s, lang, t in dsir_corpus], keep_frac=0.5
        )
    )
    assert got == want and len(got) > 0


def test_dsir_prefers_target_like_docs(spark, dsir_corpus):
    from jobscrawler_spark.operators.corpus import dsir_select

    d = _dsir_docs(spark, dsir_corpus)
    kept = {
        r["doc_id"]
        for r in dsir_select(d, d.filter(F.col("lang") == "en"), 0.5).collect()
    }
    # the 12 vocabulary-sharing docs out-score the 12 gibberish docs
    assert kept == set(range(12))


def test_dsir_keep_frac_monotone_subset(spark, dsir_corpus):
    from jobscrawler_spark.operators.corpus import dsir_select

    d = _dsir_docs(spark, dsir_corpus)
    tgt = d.filter(F.col("lang") == "en")
    small = {r["doc_id"] for r in dsir_select(d, tgt, 0.25).collect()}
    big = {r["doc_id"] for r in dsir_select(d, tgt, 0.75).collect()}
    assert small < big


def test_dsir_partitioning_invariant(spark, dsir_corpus):
    from jobscrawler_spark.operators.corpus import dsir_select

    d = _dsir_docs(spark, dsir_corpus)
    tgt = d.filter(F.col("lang") == "en")
    one = sorted(
        (r["doc_id"], r["dsir_score"])
        for r in dsir_select(d.coalesce(1), tgt, 0.5).collect()
    )
    many = sorted(
        (r["doc_id"], r["dsir_score"])
        for r in dsir_select(d.repartition(7), tgt, 0.5).collect()
    )
    assert one == many


# ------------------------------------------------------- domain share


def test_domain_share_integer_floor_contract(spark):
    from jobscrawler_spark.operators.corpus import domain_share

    rows = [
        # srcA: 1 of 3 flagged -> (1*10000) div 3 = 3333 (floor, not round)
        (1, "srcA", "en"), (2, "srcA", "xx"), (3, "srcA", "xx"),
        # srcB: all flagged -> 10000
        (4, "srcB", "en"), (5, "srcB", "en"),
        # srcC: none flagged -> 0
        (6, "srcC", "xx"),
    ]
    d = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "lang"])
    )
    got = {
        r["source"]: r["share_e4"]
        for r in domain_share(d, F.col("lang") == "en").collect()
    }
    assert got == {"srcA": 3333, "srcB": 10000, "srcC": 0}


def test_domain_share_partitioning_invariant(spark):
    from jobscrawler_spark.operators.corpus import domain_share

    rows = [(i, f"s{i % 3}", "en" if i % 2 == 0 else "xx") for i in range(30)]
    d = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "lang"])
    )
    one = sorted(map(tuple, domain_share(d.coalesce(1), F.col("lang") == "en").collect()))
    many = sorted(map(tuple, domain_share(d.repartition(7), F.col("lang") == "en").collect()))
    assert one == many


# --------------------------------------- incremental decontamination


def test_incremental_decontaminate_equals_oneshot(spark, tmp_path):
    """A new benchmark screening against the persisted corpus gram store
    must EXACTLY equal the one-shot screen — including the DF cap, whose
    per-gram decision depends only on total corpus row counts. Also
    pins the SnapshotTable round-trip (store-read path == direct)."""
    from jobscrawler_spark.operators.corpus import (
        corpus_gram_table,
        incremental_decontaminate,
    )
    from jobscrawler_spark.plans.tables import SnapshotTable

    docs = _docs(
        spark,
        [(i, "web", W + f" tail{i}") for i in range(6)]       # shared 8-grams
        + [(i, "web", f"unique text {i} " * 4) for i in range(6, 10)],
    )
    bench = spark.createDataFrame(
        pd.DataFrame(
            {"bench_id": [100, 101], "text": ["w0 w1 w2 w3 w4 w5 w6 w7 w8", "nothing shared here at all in this benchmark row x"]}
        )
    )
    for cap in (None, 4, 64):
        one = sorted(
            map(tuple, decontaminate_ngram(docs, bench, n=8, max_doc_freq=cap).collect())
        )
        grams = corpus_gram_table(docs, n=8)
        incr = sorted(
            map(
                tuple,
                incremental_decontaminate(bench, grams, n=8, max_doc_freq=cap).collect(),
            )
        )
        assert incr == one, cap
    # store round-trip: persist grams, append a second corpus batch, read
    store = SnapshotTable(str(tmp_path / "grams"))
    store.append(corpus_gram_table(docs.filter(F.col("doc_id") < 5), n=8))
    store.append(corpus_gram_table(docs.filter(F.col("doc_id") >= 5), n=8))
    via_store = sorted(
        map(
            tuple,
            incremental_decontaminate(bench, store.read(spark), n=8).collect(),
        )
    )
    assert via_store == sorted(
        map(tuple, decontaminate_ngram(docs, bench, n=8).collect())
    )


def test_incremental_decontaminate_two_bench_batches_union(spark):
    """Benchmarks arriving in two batches: the union of the two
    incremental screens == the one-shot screen over both."""
    from jobscrawler_spark.operators.corpus import (
        corpus_gram_table,
        incremental_decontaminate,
    )

    docs = _docs(spark, [(i, "web", W + f" t{i}") for i in range(8)])
    b1 = spark.createDataFrame(
        pd.DataFrame({"bench_id": [1], "text": ["w0 w1 w2 w3 w4 w5 w6 w7"]})
    )
    b2 = spark.createDataFrame(
        pd.DataFrame({"bench_id": [2], "text": ["w1 w2 w3 w4 w5 w6 w7 w8"]})
    )
    grams = corpus_gram_table(docs, n=8)
    got = sorted(
        map(tuple, incremental_decontaminate(b1, grams, n=8).collect())
    ) + sorted(map(tuple, incremental_decontaminate(b2, grams, n=8).collect()))
    want = sorted(
        map(
            tuple,
            decontaminate_ngram(docs, b1.unionByName(b2), n=8).collect(),
        ),
        key=lambda t: (t[1], t[0]),
    )
    assert sorted(got, key=lambda t: (t[1], t[0])) == want


def test_cdc_chunks_cover_text_exactly(spark):
    """Chunks tile the document: concatenation reconstructs the text,
    offsets/lengths are consistent, every doc appears."""
    from jobscrawler_spark.operators.corpus import cdc_chunks

    docs = spark.createDataFrame(
        [("s", 0, "the quick brown fox jumps over the lazy dog " * 8),
         ("s", 1, "short"),          # shorter than the window: one chunk
         ("s", 2, "")],              # empty doc: one empty chunk
        "source string, doc_id int, text string",
    )
    rows = sorted(
        cdc_chunks(docs).collect(), key=lambda r: (r["doc_id"], r["chunk_no"])
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    texts = {0: "the quick brown fox jumps over the lazy dog " * 8, 1: "short", 2: ""}
    for doc_id, chunks in by_doc.items():
        joined = "".join(c["chunk_text"] for c in chunks)
        assert joined == texts[doc_id]
        pos = 0
        for c in chunks:
            assert c["start"] == pos and c["chunk_len"] == len(c["chunk_text"])
            pos += c["chunk_len"]
    assert len(by_doc[1]) == 1 and len(by_doc[2]) == 1
    assert by_doc[2][0]["chunk_len"] == 0
    assert len(by_doc[0]) > 1  # long repetitive doc actually splits


def test_cdc_chunks_resync_after_insertion(spark):
    """THE content-defined property: prepending junk must leave every
    chunk after the first resynced boundary byte-identical (fixed-window
    chunking would shift them all)."""
    from jobscrawler_spark.operators.corpus import cdc_chunks

    base_text = " ".join(f"w{i}tok{(i * 7) % 13}" for i in range(120))
    docs = spark.createDataFrame(
        [("s", 0, base_text), ("s", 1, "INSERTED JUNK PREFIX " + base_text)],
        "source string, doc_id int, text string",
    )
    rows = cdc_chunks(docs).collect()
    a = [r["chunk_md5"] for r in sorted(rows, key=lambda r: r["chunk_no"]) if r["doc_id"] == 0]
    b = [r["chunk_md5"] for r in sorted(rows, key=lambda r: r["chunk_no"]) if r["doc_id"] == 1]
    assert len(a) >= 3
    # every chunk after the first resynced boundary is byte-identical:
    # the two chunk lists share their entire suffix except the head
    common = 0
    while common < min(len(a), len(b)) and a[-1 - common] == b[-1 - common]:
        common += 1
    assert common >= len(a) - 1


def test_cdc_chunks_deterministic_across_partitionings(spark):
    from jobscrawler_spark.operators.corpus import cdc_chunks

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    one = sorted(map(tuple, cdc_chunks(d.coalesce(1)).collect()))
    many = sorted(map(tuple, cdc_chunks(d.repartition(9)).collect()))
    assert one == many


def test_cdc_chunks_match_python_recompute(spark):
    """Independent pure-Python port of the boundary contract."""
    from jobscrawler_spark.operators.corpus import (
        CDC_BASE, CDC_MOD, CDC_THRESHOLD, CDC_WINDOW, cdc_chunks,
    )
    import hashlib

    text = "some deterministic text with enough characters to chunk " * 6
    docs = spark.createDataFrame([("s", 0, text)], "source string, doc_id int, text string")
    got = [
        (r["chunk_no"], r["start"], r["chunk_len"], r["chunk_md5"])
        for r in sorted(cdc_chunks(docs).collect(), key=lambda r: r["chunk_no"])
    ]
    powers = [pow(CDC_BASE, j, CDC_MOD) for j in range(CDC_WINDOW)]
    bounds = [
        i for i in range(CDC_WINDOW, len(text))
        if sum(ord(text[i - 1 - j]) * powers[j] for j in range(CDC_WINDOW)) % CDC_MOD
        < CDC_THRESHOLD
    ]
    starts, ends = [0] + bounds, bounds + [len(text)]
    want = [
        (k, s, e - s, hashlib.md5(text[s:e].encode()).hexdigest())
        for k, (s, e) in enumerate(zip(starts, ends))
    ]
    assert got == want
