"""Connected components (dedup-cluster assembly) vs a union-find oracle:
deep chains (pointer doubling must beat plain propagation), stars, forests,
self-loops — plus clustering of actual MinHash near-dup pairs."""

from pyspark.sql import functions as F

from jobscrawler_spark.operators.components import components_py, connected_components


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    want = components_py(edges)
    assert got == want, (got, want)
    return got


def test_deep_chain_converges_via_doubling(spark):
    """A 200-node path has diameter 199 >> max_iter=25 — only the pointer
    doubling makes min-label reach the far end."""
    edges = [(i, i + 1) for i in range(199)]
    got = _run(spark, edges)
    assert set(got.values()) == {0}


def test_forest_stars_and_self_loops(spark):
    edges = (
        [(100, i) for i in range(101, 110)]  # star at 100
        + [(7, 7)]                            # isolated self-loop
        + [(200, 201), (201, 202), (203, 204)]  # path + separate edge
    )
    got = _run(spark, edges)
    assert got[7] == 7
    assert {got[i] for i in range(100, 110)} == {100}
    assert got[202] == 200 and got[204] == 203


def test_components_cluster_minhash_pairs(spark):
    """End-to-end: near-dup PAIRS -> duplicate CLUSTERS. Synthetic docs
    where A~B and B~C but A!~C still land in one cluster."""
    from jobscrawler_spark.operators.dedupe import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = [
        (0, base),
        (1, base + " extra"),
        (2, base.replace("quick", "quick very") + " extra more"),
        (10, "completely different text about spark dataframes and shuffles here"),
        (11, "completely different text about spark dataframes and shuffles here now"),
        (20, "an unrelated singleton document with its own words entirely"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    pairs = minhash_lsh_pairs(df, n_perm=8, band_size=2, k=3)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    # 0/1/2 form one cluster, 10/11 another; 20 has no pair so no node
    assert comp.get(0) == comp.get(1) == comp.get(2) == 0
    assert comp.get(10) == comp.get(11) == 10
    assert 20 not in comp
