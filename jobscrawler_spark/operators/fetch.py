"""The fetch stage: mapInPandas over salted host buckets.

This is the engine's single non-SQL stage (SURVEY.md §3.1): every other
stage is Catalyst expressions. Batches arrive via Arrow, the synthetic
fetch model (jobscrawler_spark.fetch_model) produces image+caption payloads
and outlinks, and rows leave with per-partition lineage (partition_id) for
the metrics table.

Reference analogues: __fetch with UA rotation (reference:
src/crawler.py:306-319), follow-link discovery (src/utils/FollowLink.py:8-39),
non-200 logged-and-skipped (src/crawler.py:313-317).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame

from .. import fetch_model as FM
from ..functions.urls import canonicalize_py
from ..schemas import FETCH_RESULT


def run_fetch(selected: DataFrame, round_no: int, max_depth: int) -> DataFrame:
    """selected: (url, url_hash, host, shard, priority, depth, ...) ->
    FETCH_RESULT rows. Non-200 URLs produce a row with null payload (they
    still enter the seen set — a crawler must not refetch 403s)."""

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        for pdf in batches:
            out = []
            for url, url_hash, host, depth, priority in zip(
                pdf["url"], pdf["url_hash"], pdf["host"], pdf["depth"], pdf["priority"]
            ):
                status = FM.fetch_status(url)
                depth = int(depth)
                row = {
                    "image_id": None,
                    "bytes": None,
                    "w": None,
                    "h": None,
                    "fmt": None,
                    "caption": None,
                    "phash": None,
                    "url": url,
                    "url_hash": int(url_hash),
                    "host": host,
                    "status": status,
                    "round": round_no,
                    "depth": depth,
                    "priority": float(priority),
                    "partition_id": pid,
                    "outlinks": [],
                }
                if status == 200:
                    data, w, h, fmt, caption, ph = FM.fetch_payload(url)
                    row.update(
                        image_id=canonicalize_py(url),
                        bytes=data,
                        w=w,
                        h=h,
                        fmt=fmt,
                        caption=caption,
                        phash=ph,
                        outlinks=FM.outlinks_for(url, depth, max_depth),
                    )
                out.append(row)
            pdf_out = pd.DataFrame(out, columns=[f.name for f in FETCH_RESULT.fields])
            # mixed None+int columns coerce to float64 and destroy the low
            # bits of 64-bit hashes — force nullable integer dtypes
            for c in ("phash", "w", "h"):
                pdf_out[c] = pd.array([r[c] for r in out], dtype="Int64")
            yield pdf_out

    return selected.mapInPandas(fetch_batches, schema=FETCH_RESULT)
