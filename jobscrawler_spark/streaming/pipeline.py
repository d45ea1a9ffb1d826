"""Structured Streaming realizations of the reference's incremental pieces.

The reference is cron-batch (reference: main.sh:22); its incremental
behaviors map onto streaming primitives (SURVEY.md §2.8):

- URL-seen dedupe      -> ``dropDuplicates`` stateful operator
- embedding watermark  -> ``withWatermark`` + append-mode aggregation
- 45-min log window    -> tumbling ``window()`` aggregation

These run the engine's ingestion as a stream over a parquet directory
(files appear per crawl round -> micro-batches via Trigger.AvailableNow);
the batch engine remains the primary path, this module proves the same
dataflow streams without restructuring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_stream(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.readStream.schema(schema).parquet(path)


def dedupe_stream(stream: DataFrame, key: str = "url") -> DataFrame:
    """Stateful URL-seen dedupe: first occurrence wins across micro-batches
    (the streaming equivalent of the seen-set anti-join)."""
    return stream.dropDuplicates([key])


def windowed_metrics(stream: DataFrame, ts_col: str = "ts", minutes: int = 45) -> DataFrame:
    """Tumbling-window counts with late-data watermark — the reference's
    45-minute log window (src/logs_in_discord.py:55-105) done properly."""
    return (
        stream.withWatermark(ts_col, f"{minutes} minutes")
        .groupBy(F.window(F.col(ts_col), f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )


def run_available_now(df: DataFrame, checkpoint: str, table_name: str):
    """Drain everything currently available (Trigger.AvailableNow — the
    streaming analogue of one cron run) into an in-memory sink."""
    q = (
        df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append" if df.isStreaming else "append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
