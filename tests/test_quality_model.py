"""Learned quality classifier (r5): contract equality between the two
independently-written trainers, model sanity on the weak labels, and the
map-side scoring plan. End-to-end Spark==DuckDB equality is the
corpus_filter gate (test_entry_oracle)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from jobscrawler_spark.functions import quality_model as QM
from jobscrawler_spark.oracle.expected import train_quality_logit_independent

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def sample():
    return [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM read_parquet('{SF}/documents.parquet') "
            f"ORDER BY doc_id LIMIT {QM.SAMPLE_DOCS}"
        ).fetchall()
    ]


def test_independent_trainers_agree_to_the_bit(sample):
    labels = [QM.label_py(t) for t in sample]
    w1, b1 = QM.train_quality_logit(sample, labels)
    w2, b2 = train_quality_logit_independent(sample)
    assert b1 == b2
    assert w1 == w2  # exact float equality — the contract, not tolerance


def test_training_is_deterministic(sample):
    labels = [QM.label_py(t) for t in sample]
    a = QM.train_quality_logit(sample, labels)
    b = QM.train_quality_logit(list(sample), list(labels))
    assert a == b


def test_model_fits_the_weak_rule(spark, sample):
    """The logistic model must actually learn: >=90% agreement with the
    weak label on its training docs (the rule is linearly separable-ish
    in token-count mass, so a fitted model clears this easily; an
    untrained or broken one sits near 50%)."""
    labels = [QM.label_py(t) for t in sample]
    w, b = QM.train_quality_logit(sample, labels)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(sample)], "i long, text string")
    scored = QM.score_quality_model(df, w, b).collect()
    agree = sum(int(r["ml_keep"]) == labels[r["i"]] for r in scored)
    assert agree / len(sample) >= 0.9
    assert {r["ml_keep"] for r in scored} == {True, False}


def test_empty_doc_scores_bias(spark, sample):
    labels = [QM.label_py(t) for t in sample]
    w, b = QM.train_quality_logit(sample, labels)
    df = spark.createDataFrame([(0, ""), (1, "   ")], "i long, text string")
    for r in QM.score_quality_model(df, w, b).collect():
        assert r["ml_logit"] == round(b, 6)


def test_scoring_is_map_side(spark, sample):
    labels = [QM.label_py(t) for t in sample]
    w, b = QM.train_quality_logit(sample, labels)
    df = spark.createDataFrame([(1, "a b c")], "i long, text string")
    plan = QM.score_quality_model(df, w, b)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
