"""Structured Streaming: stateful dedupe + watermark window over the
events table, drained with Trigger.AvailableNow (one 'cron run')."""

import pytest
from pyspark.sql import functions as F

from jobscrawler_spark.streaming import pipeline as P

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture()
def events_dir(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "events_stream")
    src.write.mode("overwrite").parquet(out)
    return out


def test_windowed_metrics_stream_matches_batch(spark, events_dir, tmp_path):
    from pyspark.sql.types import _parse_datatype_string

    schema = _parse_datatype_string(EVENTS_SCHEMA)
    stream = P.read_stream(spark, events_dir, schema)
    agg = P.windowed_metrics(stream, minutes=45)
    P.run_available_now(agg, str(tmp_path / "ckpt"), "win_metrics")
    got = {
        (r["ws"], r["event_type"]): r["n"]
        for r in spark.sql("select * from win_metrics").collect()
    }

    batch = spark.read.parquet(events_dir)
    want = {
        (r["ws"], r["event_type"]): r["n"]
        for r in batch.groupBy(
            F.window("ts", "45 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
        .collect()
    }
    # append-mode emits only windows the watermark has closed; every emitted
    # window must match the batch result, and most windows must have closed
    assert got
    for k, v in got.items():
        assert want[k] == v
    assert len(got) >= len(want) - 2  # at most the trailing windows open


def test_dedupe_stream(spark, events_dir, tmp_path):
    from pyspark.sql.types import _parse_datatype_string

    schema = _parse_datatype_string(EVENTS_SCHEMA)
    stream = P.read_stream(spark, events_dir, schema)
    dd = P.dedupe_stream(stream, key="user_id")
    P.run_available_now(dd, str(tmp_path / "ckpt2"), "dedup_users")
    got = spark.sql("select count(*) c, count(distinct user_id) d from dedup_users").collect()[0]
    want = spark.read.parquet(events_dir).select("user_id").distinct().count()
    assert got["c"] == got["d"] == want
