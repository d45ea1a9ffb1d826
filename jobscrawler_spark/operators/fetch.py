"""The fetch stage: mapInPandas over salted host buckets.

This is the engine's single non-SQL stage (SURVEY.md §3.1): every other
stage is Catalyst expressions. Batches arrive via Arrow; the synthetic
fetch model (jobscrawler_spark.fetch_model) produces image+caption payloads
and outlinks, and rows leave with per-partition lineage (partition_id) for
the metrics table.

No Python hashing happens here: the model is keyed on the unsigned view of
the frontier's ``url_hash`` column (Spark's JVM-side xxhash64), so statuses
and UA indices are pure numpy over the whole Arrow batch and per-item
Python remains only for the codec encode of 200-status payloads — the part
that is network/IO in a real crawler.

Reference analogues: __fetch with UA rotation (reference:
src/crawler.py:306-319), follow-link discovery (src/utils/FollowLink.py:8-39),
non-200 logged-and-skipped (src/crawler.py:313-317).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame

from .. import fetch_model as FM
from ..schemas import FETCH_RESULT

_COLS = [f.name for f in FETCH_RESULT.fields]


def make_fetch_batches(round_no: int, max_depth: int):
    """The per-partition fetch computation as a reusable mapInPandas
    generator builder — run_fetch wraps it directly; bench.py's
    adversarial-skew phase wraps it with a per-partition timer to measure
    straggler spread without duplicating the fetch logic."""

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        for pdf in batches:
            n = len(pdf)
            dig = pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
            status = FM.status_from_digests(dig)
            ua = FM.ua_from_digests(dig, round_no)
            urls = pdf["url"].to_numpy()
            depths = pdf["depth"].to_numpy()

            data_c: list = [None] * n
            w_c: list = [None] * n
            h_c: list = [None] * n
            fmt_c: list = [None] * n
            cap_c: list = [None] * n
            ph_c: list = [None] * n
            img_id: list = [None] * n
            outlinks: list = [[]] * n
            for i in np.flatnonzero(status == 200):
                d = int(dig[i])
                url = urls[i]
                data, w, h, fmt, caption, ph = FM.payload_from_digest(d, url)
                data_c[i], w_c[i], h_c[i] = data, w, h
                fmt_c[i], cap_c[i], ph_c[i] = fmt, caption, ph
                # frontier URLs are canonical by construction (with_canonical
                # at bootstrap and outlink ingestion) — image_id IS the url
                img_id[i] = url
                outlinks[i] = FM.outlinks_from_digest(d, url, int(depths[i]), max_depth)

            # mixed None+int columns coerce to float64 and destroy the low
            # bits of 64-bit hashes — force nullable integer dtypes
            yield pd.DataFrame(
                {
                    "image_id": img_id,
                    "bytes": data_c,
                    "w": pd.array(w_c, dtype="Int32"),
                    "h": pd.array(h_c, dtype="Int32"),
                    "fmt": fmt_c,
                    "caption": cap_c,
                    "phash": pd.array(ph_c, dtype="Int64"),
                    "url": urls,
                    "url_hash": pdf["url_hash"].to_numpy(),
                    "host": pdf["host"].to_numpy(),
                    "status": status,
                    "round": np.full(n, round_no, dtype=np.int32),
                    "depth": depths,
                    "priority": pdf["priority"].to_numpy(),
                    "partition_id": np.full(n, pid, dtype=np.int32),
                    "user_agent_idx": ua,
                    "outlinks": outlinks,
                },
                columns=_COLS,
            )

    return fetch_batches


def run_fetch(selected: DataFrame, round_no: int, max_depth: int) -> DataFrame:
    """selected: (url, url_hash, host, shard, priority, depth, ...) ->
    FETCH_RESULT rows. Non-200 URLs produce a row with null payload (they
    still enter the seen set — a crawler must not refetch 403s)."""
    return selected.mapInPandas(
        make_fetch_batches(round_no, max_depth), schema=FETCH_RESULT
    )
