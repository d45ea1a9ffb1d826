"""The reference's full crawl-to-jobs DAG as one composed dataflow.

Mirrors entry point 3.1 (reference: src/main.py:44-51 -> src/crawler.py:
320-361): parse all strategies over canned payloads -> optional follow-link
-> clean -> location enrichment -> stamp extract times -> upsert into the
jobs table with the postgre_report. Everything deterministic: the clock is
injected (the reference stamps date.today()/datetime.now() at extract,
src/crawlers/async_bs4.py:169-173).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.cleaning import clean_jobs_df, nan_fill
from .operators.location_tags import add_location_tags
from .operators.sink import upsert_unique
from .plans.tables import SnapshotTable
from .schemas import JOBS
from .sources.strategies import parse_all


def stamp_extract_time(
    df: DataFrame, clock: datetime.datetime | None = None
) -> DataFrame:
    """F19: pubdate/timestamp stamped at extract; fixed injected clock in
    tests, current_date()/current_timestamp() in production."""
    if clock is None:
        return df.withColumn("pubdate", F.current_date()).withColumn(
            "timestamp", F.current_timestamp()
        )
    return df.withColumn("pubdate", F.lit(clock.date())).withColumn(
        "timestamp", F.lit(clock)
    )


def strip_apply_suffix(col):
    """F18: the echojobs two-hop variant strips a trailing /apply
    (reference: src/resources/bs4_resources/AsyncFollowTwoLinks.py:34)."""
    return F.regexp_replace(col, r"/apply$", "")


def parse_log_timestamp(col):
    """F20: log-line timestamp extraction (reference:
    src/logs_in_discord.py:44-53)."""
    extracted = F.regexp_extract(col, r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2})", 1)
    # no-match yields '' and ANSI mode makes to_timestamp('') throw
    return F.to_timestamp(F.when(extracted != "", extracted))


def run_jobs_pipeline(
    spark: SparkSession,
    configs: DataFrame,
    payloads: DataFrame,
    world_locations: DataFrame,
    jobs_table: SnapshotTable,
    clock: datetime.datetime | None = None,
) -> dict:
    """parse -> clean -> enrich -> stamp -> upsert; returns the
    postgre_report dict (reference: src/crawler.py:237-244)."""
    parsed = parse_all(configs, payloads)

    # per-strategy clean semantics: API variant has no dedupe (A5 absent,
    # reference src/crawlers/async_api.py:30-67)
    api = clean_jobs_df(parsed.filter(F.col("source_kind") == "api"), dedupe=False)
    rest = clean_jobs_df(parsed.filter(F.col("source_kind") != "api"), dedupe=True)
    cleaned = rest.unionByName(api)

    # stable unique id for the enrichment regroup (the reference uses the
    # pandas index; here the ordering key is explicit data)
    with_id = cleaned.withColumn(
        "original_index",
        F.col("config_idx").cast("long") * 1_000_000
        + F.col("page").cast("long") * 10_000
        + F.col("pos"),
    )
    enriched = add_location_tags(with_id, world_locations, "original_index")
    stamped = stamp_extract_time(enriched, clock)
    jobs = stamped.select(
        nan_fill(F.col("title")).alias("title"),
        F.col("link"),
        nan_fill(F.col("description")).alias("description"),
        F.col("pubdate"),
        nan_fill(F.col("location")).alias("location"),
        F.col("timestamp"),
        F.col("location_tags"),
    ).select([f.name for f in JOBS.fields])

    return upsert_unique(spark, jobs_table, jobs, key="link")
