"""Product-quantization ANN: code determinism, exact reconstruction when
the codebook holds the corpus, a pure-Python re-derivation of the full
IVF-PQ chain, recall floors vs brute force, and the map-side plan pin."""

import pytest
from pyspark.sql import functions as F

from jobscrawler_spark.operators import pq as PQ
from jobscrawler_spark.operators import similarity as SIM

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(spark, embs):
    return embs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).cache()


@pytest.fixture(scope="module")
def books(embs):
    return PQ.pq_train(embs, m=8, k=16, iters=10, sample_n=2048)


# ------------------------------------------------------------- helpers

def _seq_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _py_encode(vec, books):
    """Python port of the encode contract (argmin round-6
    x.x - 2*x.c + c.c, ties -> lowest code id)."""
    w = len(books[0][0])
    codes = []
    for s, book in enumerate(books):
        sv = [float(x) for x in vec[s * w : (s + 1) * w]]
        xx = _seq_dot(sv, sv)
        best = min(
            (round(xx - 2 * _seq_dot(sv, c) + _seq_dot(c, c), 6), j)
            for j, c in enumerate(book)
        )
        codes.append(best[1])
    return codes


def _py_reconstruct(codes, books):
    out = []
    for s, j in enumerate(codes):
        out.extend(books[s][j])
    return out


# --------------------------------------------------------------- tests

def test_pq_codes_deterministic_and_bounded(embs, books):
    c1 = {r["vec_id"]: list(r["codes"]) for r in PQ.pq_encode(embs, books).collect()}
    c2 = {r["vec_id"]: list(r["codes"]) for r in PQ.pq_encode(embs, books).collect()}
    assert c1 == c2 and len(c1) == embs.count()
    assert all(len(v) == 8 and all(0 <= j < 16 for j in v) for v in c1.values())


def test_pq_encode_matches_python_port(embs, books):
    rows = embs.orderBy("vec_id").limit(20).collect()
    got = {
        r["vec_id"]: list(r["codes"])
        for r in PQ.pq_encode(embs.filter(F.col("vec_id") < 20), books).collect()
    }
    for r in rows:
        assert got[r["vec_id"]] == _py_encode(r["embedding"], books), r["vec_id"]


def test_pq_exact_when_codebook_holds_corpus(spark, embs):
    """iters=0 and k = corpus size makes every subvector its own centroid:
    reconstruction must be value-exact, so ADC == true cosine (computed by
    the same sequential-double contract in pure Python)."""
    corpus = embs.filter(F.col("vec_id") < 16)
    books = PQ.pq_train(corpus, m=8, k=16, iters=0, sample_n=16)
    rows = {r["vec_id"]: list(r["embedding"]) for r in corpus.collect()}
    recon = {
        vid: _py_reconstruct(_py_encode(v, books), books)
        for vid, v in rows.items()
    }
    for vid, v in rows.items():
        assert recon[vid] == [float(x) for x in v], vid

    q = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["sim"])
        for r in PQ.pq_topk(corpus, q, k=5, books=books).collect()
    )
    want = []
    for qid in range(3):
        qv = rows[qid]
        nq = _seq_dot(qv, qv) ** 0.5
        sims = sorted(
            (-round(_seq_dot(qv, rows[vid]) / (nq * _seq_dot(rows[vid], rows[vid]) ** 0.5), 4), vid)
            for vid in rows
        )
        for rank, (negsim, vid) in enumerate(sims[:5], start=1):
            want.append((qid, rank, vid, -negsim))
    assert got == sorted(want)


def test_ivf_pq_matches_python_rederivation(spark, embs, queries, books):
    """The COMPOSED chain (coarse kmeans lists -> PQ codes ->
    reconstruction cosine -> top-k) re-derived in pure Python from the
    documented contracts must equal the Spark output row-for-row."""
    cents = SIM.kmeans_codebook(spark, embs, n_centroids=4, sample_n=2048)
    got = sorted(
        map(tuple, PQ.pq_topk(embs, queries, k=5, books=books, coarse=cents).collect())
    )

    crows = sorted(
        ((r["centroid_id"], [float(x) for x in r["_c"]]) for r in cents.collect())
    )
    vrows = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in embs.collect()}

    def coarse_of(v):
        nv = _seq_dot(v, v) ** 0.5
        best = max(
            (round(_seq_dot(v, c) / (nv * _seq_dot(c, c) ** 0.5), 6), -cid)
            for cid, c in crows
        )
        return -best[1]

    assign = {vid: coarse_of(v) for vid, v in vrows.items()}
    recon = {
        vid: _py_reconstruct(_py_encode(v, books), books) for vid, v in vrows.items()
    }
    want = []
    for qid in (0, 1, 2):
        qv = vrows[qid]
        nq = _seq_dot(qv, qv) ** 0.5
        cand = [vid for vid in vrows if assign[vid] == assign[qid]]
        sims = sorted(
            (
                -round(
                    _seq_dot(qv, recon[vid])
                    / (nq * _seq_dot(recon[vid], recon[vid]) ** 0.5),
                    4,
                ),
                vid,
            )
            for vid in cand
        )
        for rank, (negsim, vid) in enumerate(sims[:5], start=1):
            want.append((qid, vid, -negsim, rank))
    assert got == sorted(want)


def test_pq_recall_floor_vs_brute(embs, queries, books):
    """Full ADC scan (no coarse pruning) on the near-orthogonal sf0.001
    synthetic vectors: ADC-only recall@5 is weak by construction (the
    8x16 codebook can't order near-ties), and IVFADC+R rerank=50 must
    recover it past 0.6 — the documented reason the rerank path exists."""
    brute = {
        (r["query_id"], r["vec_id"])
        for r in SIM.cosine_topk(embs, queries, k=5).collect()
    }
    adc = {
        (r["query_id"], r["vec_id"])
        for r in PQ.pq_topk(embs, queries, k=5, books=books).collect()
    }
    rer = {
        (r["query_id"], r["vec_id"])
        for r in PQ.pq_topk(embs, queries, k=5, books=books, rerank=50).collect()
    }
    adc_recall = len(brute & adc) / len(brute)
    rer_recall = len(brute & rer) / len(brute)
    assert adc_recall >= 0.2, adc_recall
    assert rer_recall >= 0.6, rer_recall
    assert rer_recall >= adc_recall, (adc_recall, rer_recall)


def test_pq_rerank_full_equals_brute(embs, queries, books):
    """rerank >= corpus size keeps EVERY candidate through the exact
    re-rank, so the result must equal brute-force cosine_topk row-for-row
    (same round-4 sim, same lowest-id tie contract)."""
    brute = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["sim"])
        for r in SIM.cosine_topk(embs, queries, k=5).collect()
    )
    full = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["sim"])
        for r in PQ.pq_topk(embs, queries, k=5, books=books, rerank=500).collect()
    )
    assert full == brute


def test_pq_encode_plan_is_mapside(embs, books):
    """Encode + reconstruct is pure Catalyst over plan literals: no
    Exchange, no Join, no Window in the physical plan."""
    coded = PQ.pq_encode(embs, books)
    recon = coded.select("vec_id", PQ.pq_reconstruct_expr(F.col("codes"), books).alias("_vhat"))
    plan = recon._jdf.queryExecution().executedPlan().toString()
    for node in ("Exchange", "Window", "Join"):
        assert node not in plan, f"{node} in encode/reconstruct plan:\n{plan}"


def test_ivf_pq_candidate_side_is_mapside(spark, embs, books):
    """The composed candidate side pq_topk builds (coarse assignment +
    encode + reconstruct, exactly its coarse-path expression) is ONE
    map-side pass: no Exchange, no Join, no Window."""
    cents = SIM.kmeans_codebook(spark, embs, n_centroids=4, sample_n=2048)
    cand = SIM.ivf_assign(embs, cents, 1).select(
        "vec_id",
        "centroid_id",
        PQ.pq_reconstruct_expr(
            PQ.pq_codes_expr(F.col("_v"), books), books
        ).alias("_vhat"),
    )
    plan = cand._jdf.queryExecution().executedPlan().toString()
    for node in ("Exchange", "Window", "Join"):
        assert node not in plan, f"{node} in IVF-PQ candidate plan:\n{plan}"
