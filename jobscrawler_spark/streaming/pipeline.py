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


SESSION_OUT = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
SESSION_STATE = "start timestamp, last timestamp, n long, total double"


def stateful_sessionize(stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: gap-based
    sessions per user, closed either by an in-data gap (> gap_minutes) or
    by event-time timeout once the watermark passes session_end + gap.

    This is the operator Spark's built-ins can't express (session windows
    with per-session aggregates and explicit state): state = the one open
    session per user; each micro-batch folds its (ts-sorted) events in,
    emitting sessions closed by observed gaps; the timeout path flushes
    sessions that simply stopped receiving events. The batch analogue is
    q_w_sessionize (lag + cumsum) — the test compares closed sessions.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = pd.Timedelta(minutes=gap_minutes)

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start": start,
                        "session_end": last,
                        "n_events": n,
                        "total_value": total,
                    }
                ]
            )
            return
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        rows = pd.concat(parts, ignore_index=True).sort_values(["ts", "event_id"])
        if state.exists:
            start, last, n, total = state.get
        else:
            start = None
        closed = []
        for r in rows.itertuples():
            if start is None:
                start, last, n, total = r.ts, r.ts, 0, 0.0
            elif r.ts - last > gap:
                closed.append(
                    {
                        "user_id": user_id,
                        "session_start": start,
                        "session_end": last,
                        "n_events": n,
                        "total_value": total,
                    }
                )
                start, last, n, total = r.ts, r.ts, 0, 0.0
            n += 1
            total += float(r.value)
            last = max(last, r.ts)
        state.update((start, last, int(n), float(total)))
        state.setTimeoutTimestamp(int(last.value // 1_000_000) + gap_minutes * 60_000)
        if closed:
            yield pd.DataFrame(closed)

    return (
        stream.withWatermark("ts", f"{gap_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, SESSION_OUT, SESSION_STATE, "append", GroupStateTimeout.EventTimeTimeout
        )
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
