"""Shared physical-plan helpers for the operator family."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, factor: int = 1) -> DataFrame:
    """Input-skew guard (optimization guide §2.5 "input skew"): when a
    source arrives in fewer partitions than the session's parallelism —
    the single-row-group parquet file / unsplittable-input case — every
    downstream per-row computation (gram md5s, MinHash permutations,
    DSIR bucket hashing) serializes onto those few tasks. Round-robin
    repartition to ``defaultParallelism * factor`` spreads the compute
    (deterministic: sort-before-repartition is on by default, and every
    consumer here is row-order-insensitive).

    On a well-laid-out source — scan partitions >= cores, the production
    case at 100 TB — this is a NO-OP: no Exchange is added, the plan is
    unchanged, so it can never pessimize the scaled-out job. The guard
    reads only partition metadata (no job is run)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
