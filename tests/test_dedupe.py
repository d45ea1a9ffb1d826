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
