"""Upsert sinks: MERGE-on-key semantics over snapshot tables.

The reference upserts row-by-row with ``INSERT ... ON CONFLICT (link) DO
NOTHING RETURNING *`` and logs a before/after/unique-added report
(reference: src/crawler.py:172-244 ``crawled_df_to_db``; embeddings variant
src/embeddings/e5_base_v2_utils.py:99-179 with tenacity retries). Here the
same contract is one anti-join + one atomic append (idempotent, so Spark
task retries replace the tenacity loop), with the report computed from the
same pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.tables import SnapshotTable


def upsert_unique(
    spark: SparkSession,
    table: SnapshotTable,
    df: DataFrame,
    key: str,
    meta: dict | None = None,
) -> dict:
    """Insert rows whose ``key`` is not already present. Within-batch
    conflicts resolve by min over the remaining columns (value order, NOT
    occurrence order — a DataFrame has no stable row order to mirror the
    reference's ON CONFLICT DO NOTHING insertion-order rule; callers that
    need occurrence order must carry an explicit index column in ``df``).

    Returns the reference's postgre_report shape:
    {count_before, count_after, inserted, batch_rows}.
    """
    existing = table.read(spark)
    count_before = existing.count()

    # within-batch dedupe, first-wins deterministically via struct min
    other_cols = [c for c in df.columns if c != key]
    batch = df.groupBy(key).agg(
        F.min(F.struct(*other_cols)).alias("_rest")
    ).select(key, *[F.col(f"_rest.{c}").alias(c) for c in other_cols])

    fresh = batch.join(existing.select(key), key, "left_anti").select(df.columns).persist()
    inserted = fresh.count()
    if inserted:
        table.append(fresh, meta=meta)
    fresh.unpersist()
    return {
        "count_before": count_before,
        "count_after": count_before + inserted,
        "inserted": inserted,
        "batch_rows": df.count(),
    }
