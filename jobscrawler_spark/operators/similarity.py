"""Similarity search over embedding columns (array<float>).

Two paths, as a 100TB pipeline needs both:

- **brute-force cosine top-k** — the exactness baseline. Dot products and
  norms are computed with ``F.aggregate``/``F.zip_with`` in DOUBLE (JVM,
  whole-stage codegen; no UDF). Cross-join is bounded by the (small) query
  side, broadcast.
- **sign-LSH bucketed top-k** — the scale path: bucket every vector by the
  sign pattern of its first B components (a deterministic random-hyperplane
  LSH with axis-aligned planes — SQL-expressible, so the DuckDB oracle can
  verify it), probe only the query's bucket. At scale the bucket column is
  a partition key: the probe becomes a co-partitioned join instead of a
  cross-join.

Similarities are rounded to 4 decimals BEFORE ranking so the ordering
contract survives float-summation-order differences across engines; ties
break by vec_id.

Reference analogue: the pgvector embedding store (reference:
src/embeddings/e5_base_v2_utils.py:117-123) — storage only; the reference
has no similarity search, this is the north-rule training-data extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("double")), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k: (query_id, vec_id, sim, rank).

    ``queries``: (query_id, query_vec). The query side is broadcast; the
    candidate scan is a single narrow pass.
    """
    cand = embeddings.select(
        F.col(id_col), F.col(vec_col).alias("_v"), _norm(F.col(vec_col)).alias("_nv")
    )
    q = queries.select(
        F.col("query_id"), F.col("query_vec").alias("_q"), _norm(F.col("query_vec")).alias("_nq")
    )
    sims = cand.crossJoin(F.broadcast(q)).select(
        "query_id",
        id_col,
        F.round(_dot(F.col("_v"), F.col("_q")) / (F.col("_nv") * F.col("_nq")), 4).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col(id_col))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "sim", "rank")
    )


def sign_bucket(vec_col, n_bits: int = 8):
    """Deterministic sign-LSH bucket id from the first n_bits components."""
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n_bits - 1)),
        lambda j: F.when(
            F.element_at(vec_col, j + 1) > 0, F.round(F.pow(F.lit(2), j)).cast("int")
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(bits, F.lit(0), lambda acc, v: acc + v)


def ivf_centroids(embeddings: DataFrame, n_centroids: int = 8,
                  vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Deterministic IVF codebook: the first ``n_centroids`` vectors by id.
    A seeding choice any engine (and the SQL oracle) reproduces exactly;
    a k-means refine would drop in here without changing the probe plan."""
    return embeddings.orderBy(id_col).limit(n_centroids).select(
        F.col(id_col).alias("centroid_id"),
        F.col(vec_col).alias("_c"),
        _norm(F.col(vec_col)).alias("_nc"),
    )


# literal-codebook ceiling: n_centroids * dim float literals ride the plan
# (the quality_model weights-as-literal pattern, a few KB..MB). Above this
# the Catalyst expression tree gets unwieldy and the broadcast-join path
# is the right trade (one Exchange on the assignment window).
_LITERAL_CODEBOOK_MAX_CELLS = 262_144


def ivf_assign(vectors: DataFrame, cents: DataFrame, nprobe: int = 1,
               vec_col: str = "embedding", id_col: str = "vec_id",
               cent_rows: list | None = None) -> DataFrame:
    """Assign each vector to its ``nprobe`` argmax-cosine centroids (ties ->
    lowest centroid id). Returns (id, _v, _nv, centroid_id), one row per
    probed centroid; data vectors use nprobe=1, query-side multi-probe
    trades scan fraction for recall.

    MAP-SIDE by default: the codebook is collected driver-side (bounded
    by n_centroids — the same bounded read that trained it) and rides the
    plan as an array-of-structs literal; per row, a transform scores every
    centroid, array_sort on (-sim, centroid_id) orders them (desc sim,
    ties -> lowest id — exactly the old window's order), slice takes the
    nprobe head, explode emits the probe rows. No join, no window, no
    Exchange — ann_store's build/append ingest is genuinely shuffle-free
    (plan-pinned in tests/test_ann_store.py). Codebooks past
    _LITERAL_CODEBOOK_MAX_CELLS fall back to the broadcast-join + window
    path (identical results: same rounding, same tie rule)."""
    base = vectors.select(
        F.col(id_col), F.col(vec_col).alias("_v"), _norm(F.col(vec_col)).alias("_nv")
    )
    # callers that assign several frames against the SAME codebook pass
    # cent_rows (the collected centroid rows) so the bounded codebook
    # read runs once per codebook, not once per assignment (r7)
    rows = sorted(
        cent_rows
        if cent_rows is not None
        else cents.select("centroid_id", "_c", "_nc").collect(),
        key=lambda r: r["centroid_id"],
    )
    if rows and len(rows) * len(rows[0]["_c"]) <= _LITERAL_CODEBOOK_MAX_CELLS:
        # THREE nested-array literals instead of per-cell F.lit calls: the
        # old per-struct/per-component construction was ~(cells) py4j
        # round trips of driver time PER ivf_assign call (~2 s at 8x32);
        # a single nested literal is one call, and the per-row expression
        # (element_at + the same _dot/round arithmetic in the same
        # centroid order) is unchanged (r7)
        cvec = F.lit([[float(x) for x in r["_c"]] for r in rows])
        cnc = F.lit([float(r["_nc"]) for r in rows])
        ccid = F.lit([int(r["centroid_id"]) for r in rows]).cast("array<int>")
        scored = F.transform(
            F.sequence(F.lit(1), F.lit(len(rows))),
            lambda i: F.struct(
                (-F.round(
                    _dot(F.col("_v"), F.element_at(cvec, i))
                    / (F.col("_nv") * F.element_at(cnc, i)),
                    6,
                )).alias("negsim"),
                F.element_at(ccid, i).alias("cid"),
            ),
        )
        probes = F.slice(F.array_sort(scored), 1, nprobe)
        return (
            base.withColumn("_probe", F.explode(probes))
            .select(id_col, "_v", "_nv", F.col("_probe.cid").alias("centroid_id"))
        )
    scored = base.crossJoin(F.broadcast(cents)).select(
        id_col,
        "_v",
        "_nv",
        "centroid_id",
        F.round(_dot(F.col("_v"), F.col("_c")) / (F.col("_nv") * F.col("_nc")), 6).alias("_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.col("centroid_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= nprobe)
        .select(id_col, "_v", "_nv", "centroid_id")
    )


def kmeans_codebook(
    spark,
    embeddings: DataFrame,
    n_centroids: int = 8,
    iters: int = 10,
    sample_n: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic Lloyd-refined IVF codebook, trained driver-side on a
    DETERMINISTIC sample (the ``sample_n`` lowest ids) — the standard
    IVF practice at 100 TB: train the codebook on a sample, broadcast it.

    Determinism contract: init = first n_centroids sample vectors, cosine
    assignment on similarities rounded to 6 decimals (ties -> lowest
    centroid), means computed in fixed row order via numpy (einsum, no
    BLAS-order variance), centroids re-normalized and rounded to 6 decimals
    each iteration — bit-identical across processes.
    """
    import numpy as np

    pdf = (
        embeddings.select(id_col, vec_col).orderBy(id_col).limit(sample_n).toPandas()
    )
    V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    C = Vn[:n_centroids].copy()
    for _ in range(iters):
        sims = np.round(np.einsum("nd,kd->nk", Vn, C), 6)
        assign = sims.argmax(axis=1)  # argmax takes the FIRST max: lowest id
        C = np.stack(
            [
                Vn[assign == j].mean(axis=0) if (assign == j).any() else C[j]
                for j in range(n_centroids)
            ]
        )
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        C = np.round(C, 6)
    rows = [(j, [float(x) for x in C[j]]) for j in range(n_centroids)]
    df = spark.createDataFrame(rows, f"centroid_id int, _c array<double>")
    return df.select("centroid_id", "_c", _norm(F.col("_c")).alias("_nc"))


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 1,
    centroids: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-style approximate top-k: probe only the query's ``nprobe``
    nearest centroids' inverted lists (codebook = deterministic first-N,
    or pass ``centroids`` from kmeans_codebook for the refined one).
    At scale the embeddings table is written partitioned by centroid_id
    (partition pruning on probe)."""
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(embeddings, n_centroids, vec_col, id_col)
    )
    # one bounded codebook read feeds both assignments (r7)
    cent_rows = cents.select("centroid_id", "_c", "_nc").collect()
    assigned = ivf_assign(embeddings, cents, 1, vec_col, id_col, cent_rows=cent_rows)
    q = queries.select(
        F.col("query_id").alias(id_col), F.col("query_vec").alias(vec_col)
    )
    q_assigned = ivf_assign(
        q, cents, nprobe, vec_col, id_col, cent_rows=cent_rows
    ).select(
        F.col(id_col).alias("query_id"),
        F.col("_v").alias("_q"),
        F.col("_nv").alias("_nq"),
        "centroid_id",
    )
    sims = assigned.join(F.broadcast(q_assigned), "centroid_id").select(
        "query_id",
        id_col,
        F.round(_dot(F.col("_v"), F.col("_q")) / (F.col("_nv") * F.col("_nq")), 4).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col(id_col))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "sim", "rank")
    )


def phash_bands(
    images: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    n_bands: int = 8,
) -> DataFrame:
    """(id, phash, band_idx, band_val): the banded-phash table — the
    PERSISTABLE image-dedup state (incremental ingest appends each crawl
    batch's bands and joins the next batch against the store, mirroring
    dedupe.minhash_bands on the text side)."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_idx"),
                F.shiftright(F.col(phash_col), i * width).bitwiseAND(F.lit(mask)).alias(
                    "band_val"
                ),
            )
            for i in range(n_bands)
        ]
    )
    return images.select(
        F.col(id_col), F.col(phash_col), F.explode(bands).alias("b")
    ).select(id_col, phash_col, "b.band_idx", "b.band_val")


def phash_near_dup_pairs(
    images: DataFrame,
    max_hamming: int = 7,
    id_col: str = "image_id",
    phash_col: str = "phash",
    n_bands: int = 8,
) -> DataFrame:
    """IMAGE near-duplicate pairs by perceptual-hash Hamming distance —
    the payload-side dedup a crawl landing image rows needs (the text
    side has MinHash/SimHash; this is their pixel-space sibling over the
    engine's 64-bit phash column).

    Banded LSH on the hash itself: split the 64-bit phash into
    ``n_bands`` contiguous bands, bucket-join on (band_idx, band_val),
    then exact-filter candidates with ``bit_count(xor) <= max_hamming``.
    Pigeonhole guarantee: two hashes within Hamming distance
    ``n_bands - 1`` MUST agree on at least one band, so recall is 100%
    for ``max_hamming <= n_bands - 1`` (the default 7 with 8 bands) —
    never an all-pairs cross join. At 10^10 images the band bucket is a
    uniform 8-bit + band-idx key: one shuffle, bounded buckets.

    The LSH self-join runs over DISTINCT PHASH VALUES, not id rows (r7 —
    phash_dup_graph's exact-first collapse applied to the pair
    enumerator itself): candidate rows inside the join are three longs
    instead of two string ids, which is what the bucket fan-out
    actually pays for (at the 505k-random-hash bench scale the join
    enumerates ~4e9 in-codegen candidates — string ids made each one
    ~4x wider), and a value re-used by m images never enumerates inside
    the LSH at all. The id-level pair set — identical to the old output,
    including hamming-0 pairs within an exact-dup group — is
    reconstructed by joins that are linear in the OUTPUT size.
    """
    ids = images.select(F.col(id_col), F.col(phash_col))
    vals = ids.select(phash_col).distinct()
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_idx"),
                F.shiftright(F.col(phash_col), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("band_val"),
            )
            for i in range(n_bands)
        ]
    )
    banded = vals.select(F.col(phash_col), F.explode(bands).alias("b")).select(
        phash_col, "b.band_idx", "b.band_val"
    )
    # EXPLICIT partition count on the self-join key: the banded table is
    # a few narrow MB per million values, so AQE (which sizes partitions
    # by INPUT bytes, blind to the bucket join's output explosion) would
    # coalesce the probe side to a handful of partitions — measured 6/32
    # cores busy on the 505k-hash bench. An explicit N pins the join's
    # parallelism to the configured shuffle width (scale-adaptive via
    # conf, uniform keys by construction) and both join sides reuse the
    # one exchange.
    n_part = int(
        images.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    banded = banded.repartition(n_part, "band_idx", "band_val")
    a = banded.alias("a")
    b = banded.alias("b")
    hamming = F.bit_count(
        F.col(f"a.{phash_col}").bitwiseXOR(F.col(f"b.{phash_col}"))
    ).cast("int")
    # the exact filter runs inline in the join's codegen; only true
    # near-dup value pairs (each <= n_bands times) reach the distinct
    val_pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{phash_col}") < F.col(f"b.{phash_col}")),
        )
        .select(
            F.col(f"a.{phash_col}").alias("_pa"),
            F.col(f"b.{phash_col}").alias("_pb"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    cross = (
        val_pairs.join(ids.select(F.col(id_col).alias("__ia"), F.col(phash_col).alias("_pa")), "_pa")
        .join(ids.select(F.col(id_col).alias("__ib"), F.col(phash_col).alias("_pb")), "_pb")
        .select(
            F.least("__ia", "__ib").alias("id_a"),
            F.greatest("__ia", "__ib").alias("id_b"),
            "hamming",
        )
    )
    same = (
        ids.alias("a")
        .join(
            ids.alias("b"),
            (F.col(f"a.{phash_col}") == F.col(f"b.{phash_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    if max_hamming < 0:
        return cross.filter(F.lit(False))
    return cross.unionByName(same)


def phash_dup_graph(
    images: DataFrame,
    max_hamming: int = 7,
    id_col: str = "image_id",
    phash_col: str = "phash",
    n_bands: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """EXACT-FIRST pixel dedup graph (VERDICT r5 #2) — the scale-safe
    consumer face of phash_near_dup_pairs, lifting scene_dup_stats'
    distinct-phash-representative pattern into the cluster builders.

    A real crawl corpus's dominant duplicate mode is ONE bit-identical
    image (logo, tracking pixel, stock photo) re-hosted 10^6 times: a
    naive banded LSH puts all copies in the same bucket in ALL bands and
    enumerates ~10^12 pairs. Here identical phashes collapse FIRST
    (groupBy phash -> multiplicity + min-id representative; one uniform
    64-bit-key shuffle, zero pair enumeration), and the banded Hamming
    LSH runs only over DISTINCT phash values. Pigeonhole recall is
    unchanged (bands are a property of the hash value).

    Returns ``(edges, degrees)``:

    - ``edges`` — (id_a, id_b): a connectivity-EQUIVALENT subset of the
      full near-dup pair set — each exact-dup group as a rep->member
      star (m-1 edges instead of m(m-1)/2), each near value pair as one
      rep-rep edge. Feeding these to connected components yields
      IDENTICAL components to the full pair set (a group is a clique in
      the full graph; near groups are complete bipartite), pinned in
      tests/test_dedupe.py.
    - ``degrees`` — (id, n_px_edges): each image's TRUE near-dup partner
      count, from multiplicities: (m(own phash) - 1) + sum of m(q) over
      near values q. Identical to counting phash_near_dup_pairs
      endpoints, without enumerating them.
    """
    stats = (
        images.groupBy(phash_col)
        .agg(F.count("*").alias("_m"), F.min(id_col).alias("_rep"))
        # consumed by star edges, rep mapping, degrees; lazy — the first
        # consumer's job materializes it, no standalone checkpoint job (r7)
        .localCheckpoint(eager=False)
    )
    rep_pairs = (
        phash_near_dup_pairs(
            stats.select(F.col(phash_col).alias("pid"), F.col(phash_col).alias("ph")),
            max_hamming=max_hamming,
            id_col="pid",
            phash_col="ph",
            n_bands=n_bands,
        )
        .select(F.col("id_a").alias("_pa"), F.col("id_b").alias("_pb"))
        .localCheckpoint(eager=False)  # consumed by near edges AND near-mass degrees
    )
    star = (
        images.join(stats.select(phash_col, "_rep"), phash_col)
        .filter(F.col(id_col) != F.col("_rep"))
        .select(F.col("_rep").alias("id_a"), F.col(id_col).alias("id_b"))
    )
    rep_map_a = stats.select(F.col(phash_col).alias("_pa"), F.col("_rep").alias("_ra"))
    rep_map_b = stats.select(F.col(phash_col).alias("_pb"), F.col("_rep").alias("_rb"))
    near_edges = (
        rep_pairs.join(rep_map_a, "_pa")
        .join(rep_map_b, "_pb")
        .select(
            F.least("_ra", "_rb").alias("id_a"),
            F.greatest("_ra", "_rb").alias("id_b"),
        )
    )
    edges = star.unionByName(near_edges)

    sym = rep_pairs.select(
        F.col("_pa").alias("_p"), F.col("_pb").alias("_q")
    ).unionAll(rep_pairs.select(F.col("_pb").alias("_p"), F.col("_pa").alias("_q")))
    near_mass = (
        sym.join(
            stats.select(F.col(phash_col).alias("_q"), F.col("_m").alias("_mq")), "_q"
        )
        .groupBy("_p")
        .agg(F.sum("_mq").alias("_near"))
        .withColumnRenamed("_p", phash_col)
    )
    per_hash = stats.join(near_mass, phash_col, "left").select(
        phash_col,
        ((F.col("_m") - 1) + F.coalesce("_near", F.lit(0)))
        .cast("int")
        .alias("n_px_edges"),
    )
    degrees = images.join(per_hash, phash_col).select(id_col, "n_px_edges")
    return edges, degrees


def incremental_phash_pairs(
    new_bands: DataFrame,
    old_bands: DataFrame,
    max_hamming: int = 7,
    id_col: str = "image_id",
    phash_col: str = "phash",
    broadcast_new: bool = True,
) -> DataFrame:
    """INCREMENTAL image dedup — the pixel-space mirror of
    dedupe.incremental_minhash_pairs: a crawl batch's banded phashes join
    the persisted store's (``phash_bands`` outputs appended per batch),
    returning near-dup pairs touching at least one NEW image with no
    historical recompute. Batch-at-a-time ingest converges to exactly the
    one-shot phash_near_dup_pairs set (each pair surfaces when its later
    member arrives — pinned in tests/test_incremental_dedup.py), so
    day-N image dedup is O(batch + matching buckets), not O(corpus).
    Pigeonhole recall is unchanged (bands are a property of the hash, not
    the population). Returns (id_a, id_b, hamming), id_a < id_b.

    ``broadcast_new`` (default) is the zero-store-shuffle plan: the
    batch's bands BROADCAST against the store scan (new x old is a
    map-side hash join over one pass of the store files — bucket the
    store on the band key and even that pass partition-prunes), and the
    new x new pairs come from a separate self-join of the tiny batch
    side. A batch is small relative to the corpus by definition; for the
    rare giant backfill batch, pass False to fall back to the
    shuffle-both-sides equi-join (measured gap:
    BENCH/BASELINE.md "Incremental vs full image dedup").
    """

    def canonical(joined) -> DataFrame:
        return joined.select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
            F.least(F.col(f"a.{phash_col}"), F.col(f"b.{phash_col}")).alias("_p1"),
            F.greatest(F.col(f"a.{phash_col}"), F.col(f"b.{phash_col}")).alias("_p2"),
        )

    cond = (
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
    )
    hamming01 = F.bit_count(F.col("_p1").bitwiseXOR(F.col("_p2"))).cast("int")
    if broadcast_new:
        # ONE store scan, inline exact filter (r7): the batch's bands
        # broadcast against a single pass of the store files, the
        # hamming filter runs inside the join's codegen, and only true
        # near-dup rows reach the dedup shuffle. (A value-level
        # id-reattach variant — the phash_near_dup_pairs collapse — was
        # measured here and reverted: its second store scan for the id
        # side cost more than the narrower candidate rows saved on the
        # 505k-store / 5k-batch bench, 1.7s -> 4.8s. The SELF-join keeps
        # the value-level form, where it wins 10x; the store probe's
        # candidate fan-out is already bounded by the broadcast batch.)
        new_old = canonical(
            F.broadcast(new_bands.alias("a")).join(old_bands.alias("b"), cond)
        )
        new_new = canonical(
            new_bands.alias("a").join(F.broadcast(new_bands.alias("b")), cond)
        )
        return (
            new_old.unionByName(new_new)
            .withColumn("hamming", hamming01)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming")
            .distinct()
        )
    all_bands = old_bands.unionByName(new_bands)
    cand = canonical(new_bands.alias("a").join(all_bands.alias("b"), cond))
    # exact-filter BEFORE the dedup shuffle (see phash_near_dup_pairs):
    # only true near-dup rows reach the distinct
    return (
        cand.withColumn("hamming", hamming01)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def phash_lookup(
    queries: DataFrame,
    store_bands: DataFrame,
    max_hamming: int = 7,
    k: int | None = None,
    id_col: str = "image_id",
    phash_col: str = "phash",
    n_bands: int = 8,
) -> DataFrame:
    """QUERY-side near-dup lookup against the persisted phash band store —
    the image seen-probe: "which stored images does this new image
    collide with?", answered WITHOUT re-banding the corpus (the serving
    mirror of ann_store.search, pixel edition). A crawl uses it before
    committing a landed payload (dup under a new URL → link, don't
    store), a takedown pipeline uses it to find re-hosted copies of a
    flagged image.

    ``queries``: (id_col, phash_col) rows; ``store_bands``: a
    ``phash_bands`` output (e.g. the SnapshotTable the engine's
    incremental dedup already appends per batch). The query bands
    BROADCAST against one map-side pass of the store scan — a lookup
    batch is dimension-sized by definition, so there is NO shuffle of the
    store; hive-partition the store on band_idx (8 dirs) or
    (band_idx, band_val) and a small probe set prunes files too. Exact
    ``bit_count(xor)`` verification after the bucket join; pigeonhole
    recall is 100% for ``max_hamming <= n_bands - 1``, so at the default
    (7, 8 bands) the result set EQUALS the exact all-pairs scan. A query
    id present in the store returns its own hamming-0 row — that IS the
    seen signal. Returns (query_id, id_col, hamming) plus ``rank`` when
    ``k`` is set (per-query top-k, hamming then id tiebreak)."""
    qb = phash_bands(
        queries.select(F.col(id_col).alias("query_id"), F.col(phash_col)),
        id_col="query_id",
        phash_col=phash_col,
        n_bands=n_bands,
    )
    # exact-filter BEFORE the dedup shuffle (see phash_near_dup_pairs):
    # only true near-dup rows reach the distinct
    out = (
        F.broadcast(qb.alias("q"))
        .join(
            store_bands.alias("s"),
            (F.col("q.band_idx") == F.col("s.band_idx"))
            & (F.col("q.band_val") == F.col("s.band_val")),
        )
        .select(
            "q.query_id",
            f"s.{id_col}",
            F.bit_count(
                F.col(f"q.{phash_col}").bitwiseXOR(F.col(f"s.{phash_col}"))
            ).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    if k is not None:
        w = Window.partitionBy("query_id").orderBy("hamming", id_col)
        out = (
            out.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
        )
    return out


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Bucketed approximate top-k: probe only the query's sign bucket.

    Recall < 1 by design (bucket boundaries); deterministic, so the oracle
    can verify it exactly. At 100TB the embeddings table is written
    partitioned by ``bucket`` and the probe prunes partitions.
    """
    cand = embeddings.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        _norm(F.col(vec_col)).alias("_nv"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    q = queries.select(
        "query_id",
        F.col("query_vec").alias("_q"),
        _norm(F.col("query_vec")).alias("_nq"),
        sign_bucket(F.col("query_vec"), n_bits).alias("bucket"),
    )
    sims = cand.join(F.broadcast(q), "bucket").select(
        "query_id",
        id_col,
        F.round(_dot(F.col("_v"), F.col("_q")) / (F.col("_nv") * F.col("_nq")), 4).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col(id_col))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "sim", "rank")
    )


VERIFY_GRID = 8
VERIFY_SAD_THRESHOLD = 512  # mean per-cell luma-sum deviation <= 8


def image_grids(
    images: DataFrame,
    grid: int = VERIFY_GRID,
    id_col: str = "image_id",
) -> DataFrame:
    """(id, grid) — the INTEGER ``grid x grid`` mean-pooled luma grid of
    each decoded image: cell (gy, gx) covers pixel rows
    ``[gy*h//g, (gy+1)*h//g)`` x cols ``[gx*w//g, (gx+1)*w//g)`` and
    holds ``sum(luma) // n_pixels`` with luma = r+g+b (the channel-sum
    integer luma of detect_scene_cuts — no float crosses engines;
    degenerate empty cells on sub-``grid``-pixel images yield 0). One
    Arrow pass over the bytes column (mapInPandas), map-side at any
    corpus size — the same shape as extract/curation."""
    import pandas as pd

    from ..functions import codecs

    g = int(grid)

    def fn(batches):
        import numpy as np

        for pdf in batches:
            ids, grids = [], []
            for r in pdf.itertuples():
                px = codecs.decode(bytes(r.bytes), r.fmt).astype(np.int64)
                luma = px.sum(axis=2)
                h, w = luma.shape
                cells = []
                for gy in range(g):
                    y0, y1 = gy * h // g, (gy + 1) * h // g
                    for gx in range(g):
                        x0, x1 = gx * w // g, (gx + 1) * w // g
                        blk = luma[y0:y1, x0:x1]
                        cells.append(
                            0 if blk.size == 0 else int(blk.sum()) // blk.size
                        )
                ids.append(getattr(r, id_col))
                grids.append(cells)
            yield pd.DataFrame({id_col: ids, "grid": grids})

    return images.select(id_col, "bytes", "fmt").mapInPandas(
        fn, f"{id_col} string, grid array<bigint>"
    )


def verify_near_dup_pairs(
    pairs: DataFrame,
    images: DataFrame,
    grid: int = VERIFY_GRID,
    sad_threshold: int = VERIFY_SAD_THRESHOLD,
    id_col: str = "image_id",
) -> DataFrame:
    """PIXEL VERIFICATION of LSH candidate pairs — the stage between
    "candidate" and "delete" every production dedup runs: perceptual-hash
    LSH has false positives (a global brightness/contrast shift preserves
    every AC-DCT sign, so phash collides while the pixels are far), and
    at 10^10 images "verify by decoding both sides" is affordable ONLY
    on the candidate set (|pairs| << |corpus|), never all-pairs.

    verdict: ``sad = sum |grid_a - grid_b|`` over the integer mean-pooled
    luma grids; ``verified = sad <= sad_threshold``. Integer throughout.

    Scale shape: one Arrow decode pass for the grids, two uniform-key
    equi-joins (pairs ⋈ grids on each side — candidate-bounded), SAD via
    zip_with/aggregate in whole-stage codegen. The grids can also be
    computed once at landing time (extract/curation already decode) and
    persisted beside the phash, making verification decode-free."""
    grids = image_grids(images, grid, id_col)
    ga = grids.select(
        F.col(id_col).alias("id_a"), F.col("grid").alias("__ga")
    )
    gb = grids.select(
        F.col(id_col).alias("id_b"), F.col("grid").alias("__gb")
    )
    sad = F.aggregate(
        F.zip_with("__ga", "__gb", lambda a, b: F.abs(a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        pairs.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("sad", sad)
        .withColumn("verified", F.col("sad") <= F.lit(int(sad_threshold)))
        .drop("__ga", "__gb")
    )
