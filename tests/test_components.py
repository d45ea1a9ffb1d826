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


def test_label_clusters_handcrafted(spark):
    from pyspark.sql import Row

    from jobscrawler_spark.operators.components import label_clusters

    items = spark.createDataFrame(
        [Row(image_id=x) for x in ["a", "b", "c", "d", "e"]]
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "id_a string, id_b string"
    )
    out = {r["image_id"]: (r["component"], r["n_members"], r["is_survivor"])
           for r in label_clusters(items, pairs, "image_id").collect()}
    assert out == {
        "a": ("a", 3, True),
        "b": ("a", 3, False),
        "c": ("a", 3, False),
        "d": ("d", 1, True),   # singleton labels itself
        "e": ("e", 1, True),
    }


def test_engine_image_dedup_report(spark, tmp_path):
    """Post-crawl dedup over the real landed table: organic payloads are
    unique (all singleton survivors); a planted 1-bit phash variant row
    must merge into a 2-cluster with the original as survivor."""
    from pyspark.sql import functions as F

    from jobscrawler_spark.engine import CrawlEngine
    from jobscrawler_spark.generators import gen_politeness, gen_robots, gen_seeds

    eng = CrawlEngine(spark, str(tmp_path / "idr"), n_shards=4, default_budget=6,
                      max_depth=0)
    eng.bootstrap(gen_seeds(n=120, n_hosts=6, seed=3), gen_politeness(6, 3),
                  gen_robots(6, 3))
    eng.run(1)
    n_images = eng.images_df().count()
    assert n_images > 10

    rep = eng.image_dedup_report()
    assert rep.count() == n_images
    assert rep.filter(~F.col("is_survivor")).count() == 0  # organic: unique

    # plant a near-duplicate of the lexicographically FIRST image
    first = eng.images_df().orderBy("image_id").limit(1).collect()[0]
    dup = spark.createDataFrame(
        [(first["image_id"] + "~v", int(first["phash"]) ^ (1 << 13))]
        + [(r["image_id"], r["phash"]) for r in
           eng.images_df().select("image_id", "phash").collect()],
        "image_id string, phash long",
    )
    from jobscrawler_spark.operators.components import label_clusters
    from jobscrawler_spark.operators.similarity import phash_near_dup_pairs

    rep2 = label_clusters(dup, phash_near_dup_pairs(dup), "image_id")
    assert rep2.count() == n_images + 1
    clustered = {r["image_id"]: r for r in rep2.filter(F.col("n_members") > 1).collect()}
    assert set(clustered) == {first["image_id"], first["image_id"] + "~v"}
    assert clustered[first["image_id"]]["is_survivor"]
    assert not clustered[first["image_id"] + "~v"]["is_survivor"]


# ------------------------------------------------------------- pagerank

def _py_pagerank(edges, iters=10, scale=10**9, damping_pct=85):
    """Independent Python port of the integer PageRank contract."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    init = scale // n
    base = (init * (100 - damping_pct)) // 100
    rank = {u: init for u in nodes}
    for _ in range(iters):
        contrib = {u: 0 for u in nodes}
        for s, d in edges:
            contrib[d] += rank[s] // outdeg[s]
        share = sum(rank[u] for u in nodes if u not in outdeg) // n
        rank = {
            u: base + (damping_pct * (contrib[u] + share)) // 100 for u in nodes
        }
    return rank


def _pr(spark, edges, **kw):
    from jobscrawler_spark.operators.components import pagerank

    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_pagerank_matches_python_port_and_is_deterministic(spark):
    # a hub (0 -> everyone), a chain, a dangling sink, a duplicate edge
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (3, 4), (0, 1)]
    got = _pr(spark, edges)
    assert got == _py_pagerank(edges)
    assert got == _pr(spark, edges)  # re-run identical (integer contract)


def test_pagerank_sink_outranks_sources(spark):
    # everyone links 9; 9 links nothing (dangling) — 9 must rank highest
    edges = [(i, 9) for i in range(9)]
    got = _pr(spark, edges)
    assert got == _py_pagerank(edges)
    assert got[9] == max(got.values())
    assert all(got[i] == got[0] for i in range(9))  # symmetric sources tie


def test_pagerank_dangling_mass_redistributes(spark):
    # without redistribution a 2-node chain starves: 0 -> 1, both > 0 rank
    edges = [(0, 1)]
    got = _pr(spark, edges, iters=5)
    assert got == _py_pagerank(edges, iters=5)
    assert got[0] > 0 and got[1] > got[0]


def test_incremental_components_converge_to_one_shot(spark):
    """Batch-at-a-time ingest through labels-as-star-edges equals the
    one-shot clustering over the full edge set — including a batch that
    MERGES two previously separate components and a batch introducing
    brand-new nodes."""
    from jobscrawler_spark.operators.components import (
        connected_components,
        incremental_components,
    )

    b1 = [(1, 2), (2, 3), (10, 11)]          # two components
    b2 = [(3, 10)]                           # merges them
    b3 = [(20, 21), (21, 22), (22, 1)]       # new nodes, chains into comp 1
    all_edges = b1 + b2 + b3

    def df(pairs):
        return spark.createDataFrame(pairs, "src bigint, dst bigint")

    want = {
        (r["node"], r["component"])
        for r in connected_components(df(all_edges)).collect()
    }
    labels = connected_components(df(b1))
    for batch in (b2, b3):
        labels = incremental_components(df(batch), labels)
    got = {(r["node"], r["component"]) for r in labels.collect()}
    assert got == want
    # every node of every batch is labeled, min-id survivor semantics hold
    assert (1, 1) in got and (22, 1) in got and (10, 1) in got


def test_incremental_components_quiet_batch_is_stable(spark):
    """A batch whose edges are already within one component must leave
    the labeling unchanged (star edges alone re-derive it)."""
    from jobscrawler_spark.operators.components import (
        connected_components,
        incremental_components,
    )

    base = spark.createDataFrame([(5, 6), (6, 7)], "src bigint, dst bigint")
    labels = connected_components(base)
    again = incremental_components(
        spark.createDataFrame([(5, 7)], "src bigint, dst bigint"), labels
    )
    assert sorted(map(tuple, labels.collect())) == sorted(map(tuple, again.collect()))
