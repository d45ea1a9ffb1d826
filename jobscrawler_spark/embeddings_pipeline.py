"""The reference's embedding pipeline (entry point 3.2) as one dataflow.

Mirrors ``embed_latest_crawled_data.py``: read the last-embedding
watermark (raises if absent, reference :138-148) -> fetch jobs newer than
it (:43-60) -> wrap fields in title/location/description order + strip
()', (F14/F15, :60-81) -> count tokens and truncate at 1000 (F16,
:84-132) -> ``passage:`` e5 prefix (e5_base_v2_utils.py:87-92) -> embed ->
upsert ON CONFLICT (id) (:99-179) -> append the new watermark row
(:153-177). The batch_info report (:112-121) is returned with the same
keys.

Model inference: the e5 model is not in this container (and the driver
graft re-realizes inference as the extract/verify stage), so ``embed``
here is a SYNTHETIC deterministic embedding — each component is a centered
hash fraction of (job_info, j), pure Catalyst (JVM xxhash64), with a
bit-identical Python port (synth_embedding_py) used by the parity tests.
Swapping in a real model is one mapInPandas stage with the same signature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.cleaning import embed_prepare, embed_wrap_fields
from .functions.text import token_count
from .operators.sink import upsert_unique
from .plans.tables import SnapshotTable
from .schemas import EMBED_WATERMARK

EMBED_DIM = 64


def synth_embedding(text: Column, dim: int = EMBED_DIM) -> Column:
    """Deterministic stand-in embedding: component j = centered hash
    fraction of (text, j). JVM-side, no UDF; range [-1, 1)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.pmod(
            F.xxhash64(F.concat(text, F.lit("|"), j.cast("string"))), F.lit(100000)
        )
        / 50000.0
        - 1.0,
    )


def synth_embedding_py(text: str, dim: int = EMBED_DIM) -> list[float]:
    """Bit-identical Python port (Python % matches Spark pmod on longs)."""
    from .functions.xxhash import spark_xxhash64_str

    return [
        (spark_xxhash64_str(f"{text}|{j}") % 100000) / 50000.0 - 1.0 for j in range(dim)
    ]


def bootstrap_watermark(
    spark: SparkSession,
    wm_table: SnapshotTable,
    timestamp,
    model: str = "e5-base-v2-synth",
    test: bool = False,
) -> None:
    """Seed the last-embedding table (the reference assumes a pre-existing
    row and raises otherwise — same contract here)."""
    wm_table.append(
        spark.createDataFrame([(0, timestamp, model, test)], EMBED_WATERMARK)
    )


def run_embed_pipeline(
    spark: SparkSession,
    jobs: DataFrame,
    emb_table: SnapshotTable,
    wm_table: SnapshotTable,
    model: str = "e5-base-v2-synth",
    test: bool = False,
    max_tokens: int = 1000,
    dim: int = EMBED_DIM,
) -> dict:
    """jobs: must carry (id, title, description, location, timestamp).
    Returns {"report": postgre_report, "batch_info": reference batch_info}.
    """
    wm = (
        wm_table.read(spark)
        .filter(F.col("test") == test)
        .agg(F.max("timestamp"))
        .collect()[0][0]
    )
    if wm is None:
        # reference: ValueError("The timestamp could not be found...")
        raise ValueError(f"no watermark row in {wm_table.path} for test={test}")

    fresh = jobs.filter(F.col("timestamp") > F.lit(wm))
    wrapped = embed_prepare(
        F.col("title"), F.col("description"), F.col("location"), max_tokens=max_tokens
    )
    # token stats are computed on the PRE-truncation wrapped text
    pre_tokens = token_count(
        embed_wrap_fields(F.col("title"), F.col("description"), F.col("location"))
    )
    staged = fresh.select(
        F.col("id"),
        F.concat(F.lit("passage: "), wrapped).alias("job_info"),
        F.col("timestamp"),
        pre_tokens.alias("__pre_tokens"),
    ).persist()

    stats = staged.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum("__pre_tokens"), F.lit(0)).alias("total_tokens"),
        F.coalesce(
            F.sum((F.col("__pre_tokens") > max_tokens).cast("long")), F.lit(0)
        ).alias("n_truncated"),
    ).collect()[0]
    batch_info = {
        "TOTAL NUMBER OF BATCHES": int(stats["n"]),
        "TOTAL NUMBER OF TOKENS": int(stats["total_tokens"]),
        "MAX TOKENS PER BATCH": max_tokens,
        "NUMBER OF TRUNCATIONS": int(stats["n_truncated"]),
        "AVERAGE NUMBER OF TOKENS PER BATCH": (
            round(stats["total_tokens"] / stats["n"], 2) if stats["n"] else 0.0
        ),
    }

    embedded = staged.select(
        "id", "job_info", "timestamp", synth_embedding(F.col("job_info"), dim).alias("embedding")
    )
    report = upsert_unique(spark, emb_table, embedded, key="id")
    staged.unpersist()

    # reference _insert_max_timestamp: newest (id, timestamp) of the
    # embeddings table becomes the new watermark row
    top = (
        emb_table.read(spark)
        .orderBy(F.desc("timestamp"), F.desc("id"))
        .limit(1)
        .collect()
    )
    if top:
        wm_table.append(
            spark.createDataFrame(
                [(int(top[0]["id"]), top[0]["timestamp"], model, test)], EMBED_WATERMARK
            )
        )
    return {"report": report, "batch_info": batch_info}
