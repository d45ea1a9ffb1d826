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


def test_stateful_sessionize_matches_batch(spark, events_dir, tmp_path):
    """applyInPandasWithState sessionizer: every emitted (gap-closed)
    session must equal the batch lag+cumsum sessionizer's; only the last
    open session per user may be withheld (flushes on timeout in a later
    micro-batch, which a drained AvailableNow run never reaches)."""
    from pyspark.sql.types import _parse_datatype_string

    schema = _parse_datatype_string(EVENTS_SCHEMA)
    stream = P.read_stream(spark, events_dir, schema)
    sess = P.stateful_sessionize(stream, gap_minutes=30)
    P.run_available_now(sess, str(tmp_path / "ckpt3"), "sessions_stream")
    got = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"],
                                             round(r["total_value"], 4))
        for r in spark.sql("select * from sessions_stream").collect()
    }

    # batch analogue (same logic as q_w_sessionize)
    from pyspark.sql import Window

    e = spark.read.parquet(events_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_utc = F.col("ts").cast("timestamp")
    gap_us = F.unix_micros(ts_utc) - F.unix_micros(F.lag(ts_utc).over(w))
    new_sess = F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0)
    batch = (
        e.withColumn("ns", new_sess)
        .withColumn("sid", F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    want = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"],
                                             r["total_value"])
        for r in batch.collect()
    }
    n_users = e.select("user_id").distinct().count()
    assert got, "no sessions emitted"
    for k, v in got.items():
        assert want[k] == v, (k, v, want[k])
    assert len(got) >= len(want) - n_users  # at most one open session/user


def test_streaming_image_curation_matches_batch(spark, tmp_path):
    """R5 multimodal streaming: curate_images is a stateless Arrow map, so
    it runs unchanged on a file-source STREAM of image rows (the landing
    table as it fills) — streamed verdicts must equal the batch pass
    row-for-row. The §2.8 story for the image payload: curation keeps up
    with the crawl incrementally instead of as a post-hoc batch."""
    from jobscrawler_spark.generators import gen_curation_images
    from jobscrawler_spark.operators.image_curation import curate_images
    from jobscrawler_spark.schemas import IMAGES

    pdf = gen_curation_images(80, seed=11)
    src = str(tmp_path / "images_stream")
    # two files = two micro-batch inputs
    spark.createDataFrame(pdf.iloc[:40], IMAGES).write.mode("overwrite").parquet(src)
    spark.createDataFrame(pdf.iloc[40:], IMAGES).write.mode("append").parquet(src)

    stream = spark.readStream.schema(IMAGES).parquet(src)
    out = curate_images(stream, min_side=24)
    q = (
        out.writeStream.format("memory")
        .queryName("curated_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_cur"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.asDict() for r in spark.sql("select * from curated_stream").collect()),
        key=lambda r: r["image_id"],
    )
    want = sorted(
        (
            r.asDict()
            for r in curate_images(
                spark.createDataFrame(pdf, IMAGES), min_side=24
            ).collect()
        ),
        key=lambda r: r["image_id"],
    )
    assert got == want and len(got) == 80


def test_streaming_scene_cuts_match_batch(spark, tmp_path):
    """R5 video streaming: detect_scene_cuts is a stateless per-clip
    Arrow map (all state is WITHIN one row's frames), so it runs
    unchanged on a file-source stream of landed clips — streamed
    scene/keyframe rows must equal the batch pass exactly. Keyframe
    extraction keeps up with the crawl instead of re-demuxing the
    backlog."""
    from jobscrawler_spark.generators import gen_scene_videos
    from jobscrawler_spark.operators.multimodal import detect_scene_cuts

    pdf = gen_scene_videos(8)
    schema = "video_id string, bytes binary, fmt string"
    src = str(tmp_path / "videos_stream")
    spark.createDataFrame(pdf.iloc[:4], schema).write.mode("overwrite").parquet(src)
    spark.createDataFrame(pdf.iloc[4:], schema).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        detect_scene_cuts(stream)
        .writeStream.format("memory")
        .queryName("scenes_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("select * from scenes_stream").collect()))
    want = sorted(
        map(
            tuple,
            detect_scene_cuts(spark.createDataFrame(pdf, schema)).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_streaming_audio_segmentation_matches_batch(spark, tmp_path):
    """R6 audio streaming: segment_audio is a stateless Arrow map (all
    state lives within one clip's row), so it runs unchanged on a
    file-source STREAM of landed audio rows — streamed segments must
    equal the batch pass row-for-row. The §2.8 story for the audio
    payload: silence trimming keeps up with the crawl."""
    from jobscrawler_spark.generators import gen_vad_audio
    from jobscrawler_spark.operators.multimodal import segment_audio

    pdf = gen_vad_audio(10)
    schema = "audio_id string, bytes binary, fmt string"
    src = str(tmp_path / "audio_stream")
    spark.createDataFrame(pdf.iloc[:5], schema).write.mode("overwrite").parquet(src)
    spark.createDataFrame(pdf.iloc[5:], schema).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        segment_audio(stream)
        .writeStream.format("memory")
        .queryName("vad_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_vad"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("select * from vad_stream").collect()))
    want = sorted(
        map(tuple, segment_audio(spark.createDataFrame(pdf, schema)).collect())
    )
    assert got == want and len(got) > 0
