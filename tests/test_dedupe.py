"""Dedup operator unit tests beyond the DuckDB gate: the n-gram Jaccard
document-frequency cap (a stop-gram must not create a quadratic candidate
bucket) and ANN recall floors vs the exact brute-force baseline."""

import pytest
from pyspark.sql import functions as F

from jobscrawler_spark.operators import dedupe as D
from jobscrawler_spark.operators import similarity as SIM


def test_ngram_jaccard_hot_gram_capped(spark):
    """10 docs share ONLY the stop-gram "of the"; two docs are real near-
    duplicates. With max_doc_freq below 10 the stop-gram is dropped: the
    candidate join must produce exactly the one real pair instead of the
    45 stop-gram pairs."""
    docs = [(i, f"of the unique{i} words{i} here{i} more{i}") for i in range(10)]
    docs += [(100, "alpha beta gamma delta epsilon zeta"),
             (101, "alpha beta gamma delta epsilon eta")]
    df = spark.createDataFrame(docs, "doc_id int, text string")

    capped = D.ngram_jaccard_pairs(df, threshold=0.3, max_doc_freq=5).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in capped] == [(100, 101)]

    # without the cap the stop-gram joins all 10 filler docs pairwise into
    # the candidate set (they fail the threshold, but the bucket exploded —
    # verify the cap is what prevents enumeration, not the threshold)
    grams = D.shingles_df(df, "text", 2).withColumnRenamed("shingle", "gram")
    a = grams.select(F.col("doc_id").alias("doc_a"), "gram")
    b = grams.select(F.col("doc_id").alias("doc_b"), "gram")
    n_uncapped = a.join(b, "gram").filter(F.col("doc_a") < F.col("doc_b")).count()
    assert n_uncapped >= 45


def test_ngram_jaccard_cap_keeps_exact_pairs(spark):
    """A generous cap must not change results on data without stop-grams."""
    docs = [(0, "a b c d e f"), (1, "a b c d e g"), (2, "x y z w v u")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    with_cap = sorted(map(tuple, D.ngram_jaccard_pairs(df, threshold=0.3).collect()))
    no_cap = sorted(map(tuple, D.ngram_jaccard_pairs(df, threshold=0.3, max_doc_freq=None).collect()))
    assert with_cap == no_cap and len(with_cap) == 1


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()


def _queries(emb):
    return emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def _recall_at_k(approx_rows, exact_rows, k=10):
    from collections import defaultdict

    exact, approx = defaultdict(set), defaultdict(set)
    for r in exact_rows:
        exact[r["query_id"]].add(r["vec_id"])
    for r in approx_rows:
        approx[r["query_id"]].add(r["vec_id"])
    per_q = [len(exact[q] & approx[q]) / len(exact[q]) for q in exact]
    return sum(per_q) / len(per_q)


def test_ann_recall_floors(spark, emb):
    """Recall@10 of the approximate ANN paths vs the exact cosine top-k.
    These floors are the quality contract recorded in COVERAGE.md; recall
    trades against the pruning that makes each path scale (IVF scans
    nprobe/n_centroids of the data, sign-LSH one bucket of 2^n_bits/2^B)."""
    q = _queries(emb)
    exact = SIM.cosine_topk(emb, q, k=10).collect()
    ivf1 = SIM.ivf_topk(emb, q, k=10, n_centroids=8, nprobe=1).collect()
    ivf2 = SIM.ivf_topk(emb, q, k=10, n_centroids=8, nprobe=2).collect()
    km = SIM.ivf_topk(
        emb, q, k=10, centroids=SIM.kmeans_codebook(spark, emb, n_centroids=8, iters=10)
    ).collect()
    lsh = SIM.lsh_topk(emb, q, k=10, n_bits=8).collect()
    r1, r2 = _recall_at_k(ivf1, exact), _recall_at_k(ivf2, exact)
    rk, rl = _recall_at_k(km, exact), _recall_at_k(lsh, exact)
    print(f"recall@10: ivf(np1)={r1:.3f} ivf(np2)={r2:.3f} ivf-kmeans={rk:.3f} lsh={rl:.3f}")
    assert r2 > r1  # multi-probe must buy recall
    # on the near-isotropic synthetic embeddings the refined codebook ties
    # the naive one (~0.5); on clustered real data it is the one that wins —
    # the floor pins that the refine never makes recall WORSE
    assert rk >= r1 - 0.05
    assert r1 >= 0.4 and r2 >= 0.5 and rk >= 0.4
    assert rl >= 0.1


# --- repeated-span masking (r5) ---------------------------------------------

BOILER = "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9 ba bb"  # 12 shared tokens


def _span_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_mask_repeated_spans_handcrafted(spark):
    """A 12-token block shared by two docs is masked in BOTH (merged into
    one maximal span each); unshared docs and docs shorter than k pass
    through untouched."""
    docs = _span_docs(spark, [
        (1, "u1 u2 u3 u4 " + BOILER + " t1 t2"),
        (2, "v1 v2 " + BOILER + " v3 v4 v5"),
        (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9 wa"),
        (4, "short text"),
    ])
    out = {r["doc_id"]: r.asDict() for r in D.mask_repeated_spans(docs, k=8, min_df=2).collect()}
    assert out[1]["clean_text"] == "u1 u2 u3 u4 t1 t2"
    assert (out[1]["n_spans"], out[1]["n_masked"]) == (1, 12)
    assert out[2]["clean_text"] == "v1 v2 v3 v4 v5"
    assert out[2]["masked_frac"] == round(12 / 17, 6)
    assert out[3] == dict(doc_id=3, n_tokens=10, n_spans=0, n_masked=0,
                          masked_frac=0.0, clean_text="w1 w2 w3 w4 w5 w6 w7 w8 w9 wa")
    assert out[4]["n_spans"] == 0 and out[4]["clean_text"] == "short text"


def test_mask_repeated_spans_two_disjoint_spans(spark):
    """Two separated shared blocks in one doc yield TWO spans (the
    interval merge must not bridge the gap between them)."""
    other = "c0 c1 c2 c3 c4 c5 c6 c7"  # 8 tokens, exactly one k-gram
    docs = _span_docs(spark, [
        (1, BOILER + " gap1 gap2 gap3 gap4 gap5 gap6 gap7 gap8 gap9 " + other),
        (2, "x1 x2 " + BOILER + " y1 y2"),
        (3, "z1 " + other + " z2 z3"),
    ])
    out = {r["doc_id"]: r.asDict() for r in D.mask_repeated_spans(docs, k=8, min_df=2).collect()}
    assert out[1]["n_spans"] == 2
    assert out[1]["n_masked"] == 20
    assert out[1]["clean_text"] == "gap1 gap2 gap3 gap4 gap5 gap6 gap7 gap8 gap9"


def test_mask_repeated_spans_min_df_counts_distinct_docs(spark):
    """A block repeated TWICE WITHIN one doc but never across docs does
    not reach min_df=2 (document frequency counts distinct docs)."""
    docs = _span_docs(spark, [
        (1, BOILER + " mid1 mid2 " + BOILER),
        (2, "a1 a2 a3 a4 a5 a6 a7 a8 a9"),
    ])
    out = {r["doc_id"]: r.asDict() for r in D.mask_repeated_spans(docs, k=8, min_df=2).collect()}
    assert out[1]["n_spans"] == 0 and out[1]["n_masked"] == 0


def test_mask_repeated_spans_deterministic_across_partitionings(spark):
    rows = [(i, " ".join(f"t{(i * 13 + j) % 40}" for j in range(30))) for i in range(40)]
    df = _span_docs(spark, rows)
    a = sorted(map(tuple, D.mask_repeated_spans(df, k=8).collect()))
    b = sorted(map(tuple, D.mask_repeated_spans(df.repartition(11), k=8).collect()))
    assert a == b


def test_minhash_band_df_cap_silences_boilerplate(spark):
    """30 images share one boilerplate caption; two share a real unique
    caption. Under a band_df_cap below 30 the boilerplate bucket is
    dropped: only the real pair survives. With cap=None (the text gate's
    r3 contract) the boilerplate pairs all appear."""
    docs = [(f"b{i:02d}", "stock photo image banner free download") for i in range(30)]
    docs += [("r00", "red barn under october evening sky"),
             ("r01", "red barn under october evening sky")]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    capped = D.minhash_lsh_pairs(df, band_df_cap=16).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in capped] == [("r00", "r01")]
    uncapped = D.minhash_lsh_pairs(df, band_df_cap=None).count()
    assert uncapped == 30 * 29 // 2 + 1


def _crossmodal_result(spark):
    import __spark_entry__ as E

    fixture = E._phash_fixture_df(spark)
    rows = D.crossmodal_dup_clusters(fixture).collect()
    return fixture, {r["image_id"]: r for r in rows}


def test_crossmodal_caption_pairs_cluster_across_far_phashes(spark):
    """The planted caption pairs (i, i+1 for i % 32 == 0) have phashes far
    beyond the Hamming radius — ONLY the caption signal can merge them.
    They must share a component, via caption edges, with zero px edges
    between the two base images."""
    import __spark_entry__ as E

    fixture, by_id = _crossmodal_result(spark)
    phash = {r["image_id"]: r["phash"] for r in fixture.collect()}
    for i in range(0, 256, 32):
        a, b = f"http://img42.example.com/i/{i}", f"http://img42.example.com/i/{i + 1}"
        assert bin(phash[a] ^ phash[b]).count("1") > 7, (a, b)
        assert by_id[a]["component"] == by_id[b]["component"], (a, b)
        assert by_id[a]["n_cap_edges"] >= 1 and by_id[b]["n_cap_edges"] >= 1


def test_crossmodal_boilerplate_caption_contributes_no_edges(spark):
    """The 32 boilerplate-caption images (i % 8 == 7) exceed the band DF
    cap: their caption degree must be exactly 0 and they must not share a
    component with one another (their only edges are pixel edges to their
    own 1-bit variants)."""
    _, by_id = _crossmodal_result(spark)
    ids = [f"http://img42.example.com/i/{i}" for i in range(7, 256, 8)]
    assert len(ids) == 32
    comps = set()
    for i in ids:
        assert by_id[i]["n_cap_edges"] == 0, i
        comps.add(by_id[i]["component"])
    assert len(comps) == len(ids)


def test_crossmodal_variants_cluster_by_pixels_only(spark):
    """Every 1-bit variant joins its base image's component through the
    pixel signal (caption tokens are variant-unique): n_px_edges >= 1 and
    n_cap_edges == 0 on all variants."""
    _, by_id = _crossmodal_result(spark)
    for i in (3, 40, 77, 128, 255):
        base = f"http://img42.example.com/i/{i}"
        var = base + "~v"
        assert by_id[var]["component"] == by_id[base]["component"]
        assert by_id[var]["n_px_edges"] >= 1
        assert by_id[var]["n_cap_edges"] == 0


def test_phash_dup_graph_exact_first_boilerplate(spark):
    """VERDICT r5 #2 planted scenario: one bit-identical image re-hosted
    many times (the logo/tracking-pixel mode). phash_dup_graph must emit
    O(m) star edges where the full pair set is O(m^2), while keeping
    components AND per-image degrees identical to the full enumeration."""
    from jobscrawler_spark.operators.components import label_clusters
    from jobscrawler_spark.operators.similarity import (
        phash_dup_graph,
        phash_near_dup_pairs,
    )

    m = 60
    hot = 0x0123456789ABCDEF
    rows = [(f"http://h/{i:03d}", hot) for i in range(m)]
    rows += [("http://h/near", hot ^ 0b11)]          # hamming 2 from the hot value
    rows += [("http://h/far", hot ^ ((1 << 60) - 1))]  # far beyond the radius
    rows += [("http://h/solo", 0x5A5A5A5A5A5A5A5A)]
    imgs = spark.createDataFrame(rows, "image_id string, phash long")

    edges, degrees = phash_dup_graph(imgs, max_hamming=7)
    full = phash_near_dup_pairs(imgs, max_hamming=7).select("id_a", "id_b")
    # linear vs quadratic: m-1 star edges + 1 rep near edge
    assert edges.count() == (m - 1) + 1
    assert full.count() == m * (m - 1) // 2 + m  # clique + near-to-all
    # identical components
    lab_g = sorted(map(tuple, label_clusters(imgs, edges, "image_id").collect()))
    lab_f = sorted(map(tuple, label_clusters(imgs, full, "image_id").collect()))
    assert lab_g == lab_f
    # identical true degrees (vs full endpoint counts; absent => 0)
    from collections import Counter

    cnt = Counter()
    for r in full.collect():
        cnt[r["id_a"]] += 1
        cnt[r["id_b"]] += 1
    got = {r["image_id"]: r["n_px_edges"] for r in degrees.collect()}
    assert got == {rid: cnt.get(rid, 0) for rid, _ in rows}


def test_phash_dup_graph_matches_full_on_organic_fixture(spark):
    """On the organic crossmodal fixture (mixed exact groups, 1-bit
    variants, far hashes): graph-edge components == full-pair components
    and degrees == full endpoint counts, at a permissive radius."""
    import __spark_entry__ as E
    from collections import Counter

    from jobscrawler_spark.operators.components import label_clusters
    from jobscrawler_spark.operators.similarity import (
        phash_dup_graph,
        phash_near_dup_pairs,
    )

    imgs = E._phash_fixture_df(spark).select("image_id", "phash").localCheckpoint()
    edges, degrees = phash_dup_graph(imgs, max_hamming=20)
    full = phash_near_dup_pairs(imgs, max_hamming=20).select("id_a", "id_b")
    lab_g = sorted(map(tuple, label_clusters(imgs, edges, "image_id").collect()))
    lab_f = sorted(map(tuple, label_clusters(imgs, full, "image_id").collect()))
    assert lab_g == lab_f and len(lab_g) == imgs.count()
    cnt = Counter()
    for r in full.collect():
        cnt[r["id_a"]] += 1
        cnt[r["id_b"]] += 1
    got = {r["image_id"]: r["n_px_edges"] for r in degrees.collect()}
    exp = {r["image_id"]: cnt.get(r["image_id"], 0) for r in imgs.collect()}
    assert got == exp


def test_embedding_cosine_banded_cap_silences_sign_clustered_boilerplate(spark):
    """VERDICT r5 #3 adversarial scenario: 40 templated embeddings share
    one sign pattern (every band's bucket holds all 40 — the quadratic
    mode). With band_pop_cap the hot buckets contribute ZERO candidates
    while a genuine near-dup pair in a cold bucket survives; uncapped,
    the hot cluster pairs quadratically."""
    import random

    rng = random.Random(13)
    rows = []
    for i in range(40):  # same sign pattern, high mutual cosine
        rows.append((i, [1.0 + 0.01 * rng.random() for _ in range(64)]))
    base = [rng.choice([-1.0, 1.0]) * (1.0 + 0.1 * rng.random()) for _ in range(64)]
    rows.append((100, base))
    rows.append((101, [x * 1.05 for x in base]))  # cosine ~1, same signs
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    capped = D.embedding_cosine_pairs(df, threshold=0.9, band_pop_cap=16)
    assert sorted((r["vec_a"], r["vec_b"]) for r in capped.collect()) == [(100, 101)]
    uncapped = D.embedding_cosine_pairs(df, threshold=0.9, band_pop_cap=None)
    assert uncapped.count() == 40 * 39 // 2 + 1


def test_embedding_cosine_multiband_recall_beats_one_wide_bucket(spark):
    """A near-dup pair whose single sign flip lands in band 0 is missed
    by one wide 64-sign bucket (and by the legacy single-bucket path at
    n_bits covering that component) but found by the 4x16 banded path —
    the recall argument for multi-band in SCALING.md's ANN row."""
    v = [1.0] * 64
    w = list(v)
    w[2] = -0.001  # sign flip inside band 0; cosine still ~1
    df = spark.createDataFrame(
        [(0, v), (1, w)], "vec_id int, embedding array<double>"
    )
    banded = D.embedding_cosine_pairs(df, threshold=0.9)
    assert [(r["vec_a"], r["vec_b"]) for r in banded.collect()] == [(0, 1)]
    single_wide = D.embedding_cosine_pairs(df, threshold=0.9, n_bits=16)
    assert single_wide.count() == 0


# ---------------------------------------------------------------- semantic


def _cents(spark, vecs):
    """Explicit codebook in kmeans_codebook's output shape."""
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "centroid_id int, _c array<double>",
    )
    return df.select("centroid_id", "_c", SIM._norm(F.col("_c")).alias("_nc"))


def test_semantic_dedup_exact_first_star_edges(spark):
    """An identical-embedding pile must contribute O(n) star edges to the
    min-id representative (never the quadratic pair set), cluster into ONE
    component with ONE survivor, and leave unrelated vectors alone."""
    rows = [(i, [0.0, 1.0]) for i in range(10, 20)]  # the pile
    rows.append((0, [1.0, 0.0]))  # orthogonal singleton
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    pairs, members = D.semantic_dedup(
        spark, df, eps=0.9, centroids=_cents(spark, [[1.0, 1.0]])
    )
    got = sorted((r["vec_a"], r["vec_b"], r["cosine"]) for r in pairs.collect())
    assert got == [(10, b, 1.0) for b in range(11, 20)]  # 9 star edges, no n^2
    m = {r["vec_id"]: r for r in members.collect()}
    assert len(m) == 11
    assert all(m[i]["component"] == 10 for i in range(10, 20))
    # identical centroid-cosines tie -> lowest id survives
    assert m[10]["is_survivor"] and not any(m[i]["is_survivor"] for i in range(11, 20))
    assert m[0]["is_survivor"] and m[0]["component"] == 0  # singleton keeps itself


def test_semantic_dedup_survivor_is_most_central(spark):
    """SemDeDup keeps the component member CLOSEST to its centroid — not
    the min id (which is what label_clusters would pick)."""
    df = spark.createDataFrame(
        [(1, [0.9, 0.1]), (5, [1.0, 0.0])], "vec_id int, embedding array<double>"
    )
    pairs, members = D.semantic_dedup(
        spark, df, eps=0.9, centroids=_cents(spark, [[1.0, 0.0]])
    )
    assert [(r["vec_a"], r["vec_b"]) for r in pairs.collect()] == [(1, 5)]
    m = {r["vec_id"]: r for r in members.collect()}
    assert m[5]["is_survivor"] and not m[1]["is_survivor"]
    assert m[1]["survivor_id"] == 5 and m[5]["cent_cos"] == 1.0


def test_semantic_dedup_connectivity_matches_bruteforce(spark, emb):
    """Star + representative edges must yield the SAME components as the
    full within-cluster pair enumeration (the phash_dup_graph equivalence
    argument, now for embeddings), on real sf0.01 vectors plus planted
    exact copies (star path) and a scaled copy (rep-rep cosine-1 path).
    eps=0.3 because the synthetic sf0.01 vectors max out at cosine ~0.44."""
    from jobscrawler_spark.operators.components import components_py

    base = emb.filter(F.col("vec_id") < 150)
    v0 = base.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    planted = spark.createDataFrame(
        [(1000, list(v0)), (1001, list(v0)),
         (1002, [2.0 * x for x in v0])],
        "vec_id long, embedding array<float>",
    )
    df = base.select("vec_id", "embedding").unionByName(planted)
    cents = SIM.kmeans_codebook(spark, df, n_centroids=4, sample_n=153)
    pairs, members = D.semantic_dedup(spark, df, eps=0.3, centroids=cents)

    assigned = SIM.ivf_assign(df, cents, 1)
    a = assigned.select(
        F.col("vec_id").alias("vec_a"), F.col("_v").alias("_va"),
        F.col("_nv").alias("_na"), "centroid_id",
    )
    b = assigned.select(
        F.col("vec_id").alias("vec_b"), F.col("_v").alias("_vb"),
        F.col("_nv").alias("_nb"), "centroid_id",
    )
    brute = (
        a.join(b, "centroid_id")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "c",
            F.round(SIM._dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 4),
        )
        .filter(F.col("c") >= 0.3)
    )
    sem_edges = [(r["vec_a"], r["vec_b"]) for r in pairs.collect()]
    brute_edges = [(r["vec_a"], r["vec_b"]) for r in brute.collect()]
    assert brute_edges, "fixture produced no pairs — threshold too tight"
    want, got = components_py(brute_edges), components_py(sem_edges)
    ids = [r["vec_id"] for r in df.select("vec_id").collect()]
    assert {i: got.get(i, i) for i in ids} == {i: want.get(i, i) for i in ids}
    # and the members view agrees with its own pair set
    mgot = {r["vec_id"]: r["component"] for r in members.collect()}
    assert mgot == {i: got.get(i, i) for i in ids}


def test_semantic_dedup_deterministic(spark, emb):
    df = emb.filter(F.col("vec_id") < 100)
    outs = []
    for _ in range(2):
        pairs, members = D.semantic_dedup(spark, df, eps=0.3, n_clusters=4, sample_n=100)
        outs.append(
            (
                sorted(map(tuple, pairs.collect())),
                sorted(map(tuple, members.collect())),
            )
        )
    assert outs[0] == outs[1]


def test_preferred_survivor_max_pref_ties_lowest_id(spark):
    from jobscrawler_spark.operators.dedupe import preferred_survivor

    labeled = spark.createDataFrame(
        [
            # component c1: b has highest res -> keep_id = b everywhere
            ("a", "c1", 10),
            ("b", "c1", 99),
            ("c", "c1", 50),
            # component c2: tie on res -> lowest id wins
            ("d", "c2", 7),
            ("e", "c2", 7),
            # singleton keeps itself
            ("f", "c3", 1),
        ],
        "image_id string, component string, res int",
    )
    got = {
        r["image_id"]: r["keep_id"]
        for r in preferred_survivor(labeled, "res").collect()
    }
    assert got == {"a": "b", "b": "b", "c": "b", "d": "d", "e": "d", "f": "f"}


# ------------------------------------------------ pixel verification (r6)


def _verify_fixture(spark, n=16):
    from jobscrawler_spark.generators import gen_verify_images

    return spark.createDataFrame(
        gen_verify_images(n),
        "image_id string, bytes binary, w int, h int, fmt string, phash long",
    )


def test_verify_confirms_reencodes_rejects_brightness(spark):
    """The planted outcomes: lossy dct re-encodes are TRUE near-dups
    (confirm); +24-brightness copies collide on phash (hamming 0 — every
    AC-DCT sign preserved) but verification must reject them."""
    imgs = _verify_fixture(spark, 16)
    out = {
        (r["id_a"], r["id_b"]): (r["hamming"], r["sad"], r["verified"])
        for r in SIM.verify_near_dup_pairs(
            SIM.phash_near_dup_pairs(imgs), imgs
        ).collect()
    }
    rebases = [(a, b) for a, b in out if b == a + "~r"]
    brights = [(a, b) for a, b in out if b == a + "~b"]
    assert len(rebases) == 4 and len(brights) == 1
    for p in rebases:
        assert out[p][2] is True, p
    for p in brights:
        ham, sad, verified = out[p]
        assert ham == 0 and verified is False and sad > 512, p


def test_image_grids_partitioning_invariant_and_degenerate(spark):
    import pandas as pd

    from jobscrawler_spark.functions import codecs

    imgs = _verify_fixture(spark, 12)
    one = {r["image_id"]: r["grid"] for r in SIM.image_grids(imgs.coalesce(1)).collect()}
    many = {r["image_id"]: r["grid"] for r in SIM.image_grids(imgs.repartition(5)).collect()}
    assert one == many and all(len(g) == 64 for g in one.values())
    # degenerate: a 4x4 image has empty 8x8 cells -> zeros, no crash
    import numpy as np

    tiny = np.full((4, 4, 3), 100, dtype=np.uint8)
    df = spark.createDataFrame(
        pd.DataFrame(
            [{"image_id": "t", "bytes": codecs.encode(tiny, "raw"), "fmt": "raw"}]
        )
    )
    g = SIM.image_grids(df).collect()[0]["grid"]
    assert len(g) == 64 and set(g) == {0, 300}  # 100*3 luma in occupied cells


def _py_jacc_e6(ta, tb, k=3):
    """Independent Python recompute of the verify_candidate_pairs contract."""
    ga = {" ".join(ta[i : i + k]) for i in range(len(ta) - k + 1)} if len(ta) >= k else set()
    gb = {" ".join(tb[i : i + k]) for i in range(len(tb) - k + 1)} if len(tb) >= k else set()
    union = len(ga | gb)
    return (len(ga & gb) * 1000000) // union if union else 0


def test_verify_candidate_pairs_matches_python_recompute(spark):
    texts = {
        0: "alpha beta gamma delta epsilon zeta eta",
        1: "alpha beta gamma delta epsilon zeta theta",  # near-dup of 0
        2: "one two three four five six seven eight",    # disjoint from 0
        3: "alpha beta gamma nine ten eleven twelve",    # partial overlap with 0
        4: "short doc",                                   # < k tokens: no shingles
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id int, text string")
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4)], "doc_a int, doc_b int"
    )
    got = {(r["doc_a"], r["doc_b"]): r["jacc_e6"]
           for r in D.verify_candidate_pairs(docs, pairs).collect()}
    want = {(a, b): _py_jacc_e6(texts[a].split(), texts[b].split())
            for a, b in [(0, 1), (0, 2), (0, 3), (0, 4)]}
    assert got == want
    assert got[(0, 1)] > 500000          # confirmed near-dup
    assert got[(0, 2)] == 0              # zero-overlap candidate: rejected, kept
    assert 0 < got[(0, 3)] < 500000      # partial overlap: rejected
    assert got[(0, 4)] == 0              # shingle-less doc scores 0, no crash


def test_verify_candidate_pairs_is_candidate_bounded(spark):
    """Docs outside the candidate pair set must not change any score —
    the gram table is semi-joined to the pair docs before the fan-out."""
    base = [(0, "a b c d e f"), (1, "a b c d e g")]
    noise = [(i, f"n{i} m{i} o{i} p{i} q{i}") for i in range(10, 40)]
    pairs = spark.createDataFrame([(0, 1)], "doc_a int, doc_b int")
    small = spark.createDataFrame(base, "doc_id int, text string")
    big = spark.createDataFrame(base + noise, "doc_id int, text string")
    r_small = D.verify_candidate_pairs(small, pairs).collect()
    r_big = D.verify_candidate_pairs(big, pairs).collect()
    assert sorted(map(tuple, r_small)) == sorted(map(tuple, r_big))


def test_cdc_dup_stats_catch_what_paragraph_dedup_misses(spark):
    """Boilerplate riding INSIDE a paragraph behind per-doc text: the
    whole paragraph hashes differently per doc (paragraph dedup reports
    zero sharing), but content-defined chunk boundaries resync inside the
    shared span so cdc_dup_stats flags every carrier doc."""
    boiler = (
        "identical legal disclaimer text repeated verbatim across pages "
        "with enough characters to cover several content defined chunks "
        "so that boundary resynchronization has room to happen"
    )
    docs = spark.createDataFrame(
        [
            (i, f"unique{i} opening words for page number {i} " + boiler)
            for i in range(6)
        ]
        + [(10, "completely unrelated page about something else entirely")],
        "doc_id int, text string",
    )
    para = {r["doc_id"]: r["n_shared_paras"]
            for r in D.paragraph_dup_stats(docs).collect()}
    assert all(v == 0 for v in para.values())  # paragraph dedup is blind here
    cdc = {r["doc_id"]: (r["n_shared_chunks"], r["n_chunks"])
           for r in D.cdc_dup_stats(docs).collect()}
    for i in range(6):
        assert cdc[i][0] >= 1, (i, cdc[i])  # every carrier flagged
    assert cdc[10][0] == 0                   # the unrelated doc is clean
