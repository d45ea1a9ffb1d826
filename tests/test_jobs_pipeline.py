"""End-to-end jobs pipeline: the reference's main() DAG composed."""

import datetime

from pyspark.sql import functions as F

from jobscrawler_spark.generators import (
    gen_payload_bodies,
    gen_site_configs,
    gen_world_locations,
)
from jobscrawler_spark.jobs_pipeline import (
    parse_log_timestamp,
    run_jobs_pipeline,
    strip_apply_suffix,
)
from jobscrawler_spark.plans.tables import SnapshotTable
from jobscrawler_spark.schemas import JOBS, PAYLOADS, SITE_CONFIGS, WORLD_LOCATIONS

CLOCK = datetime.datetime(2024, 3, 4, 5, 6, 7)


def test_pipeline_end_to_end(spark, tmp_path):
    cfg = spark.createDataFrame(gen_site_configs(), SITE_CONFIGS)
    pl = spark.createDataFrame(gen_payload_bodies(gen_site_configs()), PAYLOADS)
    dim = spark.createDataFrame(gen_world_locations(), WORLD_LOCATIONS)
    table = SnapshotTable(str(tmp_path / "jobs"), JOBS)

    report = run_jobs_pipeline(spark, cfg, pl, dim, table, clock=CLOCK)
    assert report["inserted"] > 40
    assert report["count_after"] == report["inserted"]

    rows = table.read(spark)
    assert rows.filter(F.col("pubdate") != F.lit(CLOCK.date())).count() == 0
    assert rows.filter(F.col("link").isNull()).count() == 0
    # cleaning ran: no html tags survive
    assert rows.filter(F.col("description").contains("<b>")).count() == 0
    # enrichment attached tags (array col, possibly ['NaN'])
    assert rows.filter(F.size("location_tags") < 1).count() == 0

    # idempotent re-run: ON CONFLICT DO NOTHING semantics
    report2 = run_jobs_pipeline(spark, cfg, pl, dim, table, clock=CLOCK)
    assert report2["inserted"] == 0
    assert report2["count_after"] == report["count_after"]


def test_strip_apply_suffix(spark):
    df = spark.createDataFrame(
        [("https://x.example.com/j/1/apply",), ("https://x.example.com/apply/j",)], ["u"]
    )
    got = [r[0] for r in df.select(strip_apply_suffix(F.col("u"))).collect()]
    assert got == ["https://x.example.com/j/1", "https://x.example.com/apply/j"]


def test_parse_log_timestamp(spark):
    df = spark.createDataFrame(
        [("2024-01-02 03:04:05 ERROR boom",), ("no timestamp here",)], ["line"]
    )
    got = df.select(parse_log_timestamp(F.col("line")).alias("ts")).collect()
    assert got[0]["ts"] == datetime.datetime(2024, 1, 2, 3, 4, 5)
    assert got[1]["ts"] is None
