"""Product-quantization (PQ) compressed ANN — the 10^10-vector storage path.

PQ (Jegou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — public) splits each d-dim vector into ``m``
contiguous subvectors and quantizes each against its own ``k``-entry
codebook, so a vector stores as ``m`` small ints instead of ``d`` floats:
at 10^10 x 768-dim float32 (~30 TB of raw vectors) an m=96/k=256 code
table is ~0.96 TB — the candidate scan reads ~30x less, and composing
with the IVF coarse quantizer (ivf_assign lists as partition keys) prunes
that scan to the probed lists. Search is ADC (asymmetric distance): the
query stays exact, candidates are scored against their RECONSTRUCTION
(concatenated per-subspace centroids), which is the inner-product form of
Jegou's lookup-table distance.

Spark-first shape: training is a bounded deterministic driver-side sample
(the kmeans_codebook pattern); encode/reconstruct are pure Catalyst
expressions over a plan-literal codebook (no UDF, no join, no Exchange —
plan-pinned in tests/test_pq.py); ranking reuses the engine's round-4
cosine + lowest-id tie contract so the DuckDB oracle re-derives the whole
chain (codebooks via an independent numpy recompute, codes/reconstruction
in pure SQL).

Determinism contract (both engines reproduce bit-identically):

- train: per subspace s over the ``sample_n`` lowest-id vectors as RAW
  float64 (no normalization — PQ lives in L2 space): init = first ``k``
  subvectors; per iteration squared distances
  ``round(einsum('nkd,nkd->nk', X[:,None]-C[None], ...), 6)``, argmin
  takes the FIRST min (lowest code id), means in fixed row order, round-6
  centroids. einsum, never BLAS matmul (CLAUDE.md hard rule).
- encode: code_s = argmin over round-6 ``d2 = x.x - 2*x.c + c.c`` (c.c
  precomputed driver-side by an explicitly SEQUENTIAL Python sum and
  inlined as a literal in both engines), ties -> lowest code id. All dot
  products accumulate sequentially in DOUBLE.
- search: sim = round(cos(query, reconstruction), 4), ties -> lowest id.

Reference analogue: none — the reference stores raw pgvector embeddings
(src/embeddings/e5_base_v2_utils.py:117-123); PQ is the north-rule
training-data extension that makes the 10^10-vector store scannable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import ivf_assign


def _dotd(a, b):
    """Sequential double-precision dot product: elements are cast to
    DOUBLE BEFORE the multiply (unlike similarity._dot's float multiply),
    so the value is the IEEE-754 left-to-right sum DuckDB's
    list_dot_product(CAST(.. AS DOUBLE[]), ..) computes."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 10,
    sample_n: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Train the ``m`` per-subspace codebooks driver-side on the
    ``sample_n`` lowest-id vectors (deterministic contract in the module
    docstring). Returns ``books[s][j] = centroid j of subspace s`` as
    plain Python floats, ready to ride the plan as literals."""
    import numpy as np

    pdf = embeddings.select(id_col, vec_col).orderBy(id_col).limit(sample_n).toPandas()
    V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    d = V.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    w = d // m
    books: list[list[list[float]]] = []
    for s in range(m):
        X = V[:, s * w : (s + 1) * w]
        C = X[:k].copy()
        for _ in range(iters):
            diff = X[:, None, :] - C[None, :, :]
            D = np.round(np.einsum("nkd,nkd->nk", diff, diff), 6)
            assign = D.argmin(axis=1)  # first min: lowest code id
            C = np.stack(
                [
                    X[assign == j].mean(axis=0) if (assign == j).any() else C[j]
                    for j in range(k)
                ]
            )
            C = np.round(C, 6)
        books.append([[float(x) for x in C[j]] for j in range(k)])
    return books


def _self_dots(books: list[list[list[float]]]) -> list[list[float]]:
    """c.c per code, by an explicitly sequential Python sum (never np.dot:
    BLAS accumulation order is not reproducible across processes)."""
    out = []
    for book in books:
        row = []
        for c in book:
            acc = 0.0
            for x in c:
                acc += x * x
            row.append(acc)
        out.append(row)
    return out


def pq_codes_expr(vec_col, books: list[list[list[float]]]):
    """Catalyst expression: the array<int> of PQ codes for ``vec_col`` —
    per subspace, argmin round-6 ``x.x - 2*x.c + c.c`` against the
    literal codebooks, ties -> lowest code id. Pure map-side."""
    w = len(books[0][0])
    ccs = _self_dots(books)
    code_exprs = []
    for s, book in enumerate(books):
        sv = F.slice(vec_col, s * w + 1, w)
        xx = _dotd(sv, sv)
        scored = F.array(
            *[
                F.struct(
                    F.round(
                        xx - 2 * _dotd(sv, F.array(*[F.lit(float(x)) for x in c]))
                        + F.lit(ccs[s][j]),
                        6,
                    ).alias("d2"),
                    F.lit(j).alias("cid"),
                )
                for j, c in enumerate(book)
            ]
        )
        code_exprs.append(F.element_at(F.array_sort(scored), 1)["cid"])
    return F.array(*code_exprs)


def pq_encode(
    vectors: DataFrame,
    books: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<int>): map-side encode against the literal
    codebooks. No join, no window, no Exchange — this is the persistable
    code table (at 10^10 vectors, write it once hive-partitioned by the
    coarse list and scan IT, never the raw vectors)."""
    return vectors.select(
        F.col(id_col), pq_codes_expr(F.col(vec_col), books).alias("codes")
    )


def pq_reconstruct_expr(codes_col, books: list[list[list[float]]]):
    """Catalyst expression: the reconstruction x-hat — per-subspace
    centroid rows selected by code and concatenated. Pure map-side."""
    parts = []
    for s, book in enumerate(books):
        cb = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in book])
        parts.append(F.element_at(cb, F.element_at(codes_col, s + 1) + 1))
    return F.concat(*parts)


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 10,
    sample_n: int = 2048,
    books: list[list[list[float]]] | None = None,
    coarse: DataFrame | None = None,
    nprobe: int = 1,
    rerank: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over PQ codes: (query_id, vec_id, sim, rank) where sim =
    round-4 cosine(query, reconstruction), rank ties -> lowest id.

    With ``coarse`` (a kmeans_codebook/ivf_centroids DataFrame) this is
    IVF-PQ: candidates restrict to the query's ``nprobe`` coarse lists
    (map-side literal assignment both sides), which at scale is partition
    pruning over a code table 30x smaller than the raw vectors. Without
    it, a full — but compressed — ADC scan.

    ``rerank=R`` is Jegou's IVFADC+R refinement: the ADC pass keeps the
    top R >= k candidates per query, their RAW vectors are fetched (at
    scale: R x n_queries point lookups against the raw store, bounded,
    never a scan) and the final top-k ranks by EXACT round-4 cosine —
    reconstruction error then only costs recall when a true neighbor
    falls below ADC rank R, so a small R (4-10x k) recovers most of the
    brute-force recall while the scan stays compressed."""
    books = books if books is not None else pq_train(
        embeddings, m=m, k=n_codes, iters=iters, sample_n=sample_n,
        vec_col=vec_col, id_col=id_col,
    )
    q = queries.select(
        F.col("query_id"),
        F.col("query_vec").alias("_q"),
        F.sqrt(_dotd(F.col("query_vec"), F.col("query_vec"))).alias("_nq"),
    )
    vhat = pq_reconstruct_expr(pq_codes_expr(F.col("_v"), books), books)
    if coarse is not None:
        # coarse assignment AND encode/reconstruct are both map-side
        # expressions over the same row: ONE pass, no data-side join
        cand = ivf_assign(embeddings, coarse, 1, vec_col, id_col).select(
            F.col(id_col), F.col("centroid_id"), vhat.alias("_vhat")
        )
        q_assigned = ivf_assign(
            queries.select(
                F.col("query_id").alias(id_col), F.col("query_vec").alias(vec_col)
            ),
            coarse,
            nprobe,
            vec_col,
            id_col,
        ).select(F.col(id_col).alias("query_id"), "centroid_id")
        qj = q.join(q_assigned, "query_id")
        sims = cand.join(F.broadcast(qj), "centroid_id")
    else:
        recon = embeddings.select(
            F.col(id_col),
            pq_reconstruct_expr(
                pq_codes_expr(F.col(vec_col), books), books
            ).alias("_vhat"),
        )
        sims = recon.crossJoin(F.broadcast(q))
    sims = sims.select(
        "query_id",
        id_col,
        F.round(
            _dotd(F.col("_q"), F.col("_vhat"))
            / (F.col("_nq") * F.sqrt(_dotd(F.col("_vhat"), F.col("_vhat")))),
            4,
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col(id_col))
    adc = (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= max(k, rerank))
        .select("query_id", id_col, "sim", "rank")
    )
    if rerank <= 0:
        return adc
    raw = embeddings.select(
        F.col(id_col), F.col(vec_col).alias("_rv"),
        F.sqrt(_dotd(F.col(vec_col), F.col(vec_col))).alias("_nrv"),
    )
    exact = (
        adc.drop("sim", "rank")
        .join(raw, id_col)
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            id_col,
            F.round(
                _dotd(F.col("_q"), F.col("_rv")) / (F.col("_nq") * F.col("_nrv")), 4
            ).alias("sim"),
        )
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "sim", "rank")
    )
