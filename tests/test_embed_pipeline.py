"""Embedding pipeline (reference embed_latest_crawled_data.py): watermark
increments, truncation + passage prefix, synthetic-embedding parity with
the Python XXH64 port, and the reference's no-watermark ValueError."""

import datetime

import pytest
from pyspark.sql import functions as F

from jobscrawler_spark.embeddings_pipeline import (
    bootstrap_watermark,
    run_embed_pipeline,
    synth_embedding_py,
)
from jobscrawler_spark.functions.text import token_count
from jobscrawler_spark.generators import (
    gen_payload_bodies,
    gen_site_configs,
    gen_world_locations,
)
from jobscrawler_spark.jobs_pipeline import run_jobs_pipeline
from jobscrawler_spark.plans.tables import SnapshotTable
from jobscrawler_spark.schemas import (
    EMBED_WATERMARK,
    EMBEDDINGS_SINK,
    JOBS,
    PAYLOADS,
    SITE_CONFIGS,
    WORLD_LOCATIONS,
)

CLOCK = datetime.datetime(2024, 3, 4, 5, 6, 7)
EPOCH = datetime.datetime(2000, 1, 1)


def _jobs(spark, tmp, clock=CLOCK):
    cfg = spark.createDataFrame(gen_site_configs(), SITE_CONFIGS)
    pl = spark.createDataFrame(gen_payload_bodies(gen_site_configs()), PAYLOADS)
    dim = spark.createDataFrame(gen_world_locations(), WORLD_LOCATIONS)
    table = SnapshotTable(f"{tmp}/jobs", JOBS)
    run_jobs_pipeline(spark, cfg, pl, dim, table, clock=clock)
    return table


def test_embed_pipeline_end_to_end_and_incremental(spark, tmp_path):
    jobs_table = _jobs(spark, tmp_path)
    jobs = jobs_table.read(spark).withColumn("id", F.xxhash64("link"))
    n_jobs = jobs.count()
    emb = SnapshotTable(str(tmp_path / "emb"), EMBEDDINGS_SINK)
    wm = SnapshotTable(str(tmp_path / "wm"), EMBED_WATERMARK)
    bootstrap_watermark(spark, wm, EPOCH, test=True)

    out = run_embed_pipeline(spark, jobs, emb, wm, test=True, max_tokens=12)
    assert out["report"]["inserted"] == n_jobs
    bi = out["batch_info"]
    assert bi["TOTAL NUMBER OF BATCHES"] == n_jobs
    assert bi["NUMBER OF TRUNCATIONS"] > 0  # 12-token cap bites on the fixtures
    assert bi["TOTAL NUMBER OF TOKENS"] > 12 * bi["NUMBER OF TRUNCATIONS"]

    rows = emb.read(spark).withColumn("n_tok", token_count(F.col("job_info"))).collect()
    assert len(rows) == n_jobs
    for r in rows:
        assert r["job_info"].startswith("passage: <title>")
        assert r["n_tok"] <= 13  # 12 + the passage: prefix token
        # synthetic-embedding parity with the Python XXH64 port
    r0 = rows[0]
    assert list(r0["embedding"]) == synth_embedding_py(r0["job_info"])

    # second run: nothing newer than the watermark -> no inserts
    out2 = run_embed_pipeline(spark, jobs, emb, wm, test=True, max_tokens=12)
    assert out2["report"]["inserted"] == 0
    assert out2["batch_info"]["TOTAL NUMBER OF BATCHES"] == 0

    # newer jobs arrive -> only they are embedded
    later = CLOCK + datetime.timedelta(days=1)
    fresh = (
        jobs_table.read(spark)
        .limit(5)
        .withColumn("link", F.concat(F.col("link"), F.lit("?v=2")))
        .withColumn("timestamp", F.lit(later))
        .withColumn("id", F.xxhash64("link"))
    )
    out3 = run_embed_pipeline(spark, jobs.unionByName(fresh), emb, wm, test=True, max_tokens=12)
    assert out3["report"]["inserted"] == 5
    # the watermark row advanced to the newest embedded timestamp
    top_wm = (
        SnapshotTable(str(tmp_path / "wm"), EMBED_WATERMARK)
        .read(spark)
        .agg(F.max("timestamp"))
        .collect()[0][0]
    )
    assert top_wm == later


def test_embed_pipeline_requires_watermark_row(spark, tmp_path):
    jobs_table = _jobs(spark, tmp_path)
    jobs = jobs_table.read(spark).withColumn("id", F.xxhash64("link"))
    emb = SnapshotTable(str(tmp_path / "e2"), EMBEDDINGS_SINK)
    wm = SnapshotTable(str(tmp_path / "w2"), EMBED_WATERMARK)
    with pytest.raises(ValueError, match="no watermark row"):
        run_embed_pipeline(spark, jobs, emb, wm, test=True)
