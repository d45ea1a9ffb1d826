"""As-of (backward) join and binned range join — the two temporal joins
Spark lacks as built-ins, expressed as shuffle-lean compositions.

The reference has no temporal joins (its only joins are the location
lookup, reference src/crawler.py:110-167); these are north-rule breadth
operators a training-data pipeline needs (align events to the latest
preceding state row; band rows into intervals).

**asof_join_backward** — for each left row, the latest right row with
``right.on <= left.on`` per ``by`` key. NOT an inequality join (which
Spark plans as a broadcast-nested-loop or a sort-merge with range scan):
both sides are unioned with a side tag and a single window pass fills the
right columns forward (``last(ignorenulls)``). One shuffle on ``by``,
whole-stage codegen, no row explosion — at 100 TB this is the plan you
want: cost is a sort within each key partition.

**range_join_binned** — join left rows to right intervals containing
them. Naive BETWEEN predicates become O(n·m) nested loops; binning maps
each left value to a bin and explodes each interval into the bins it
overlaps, turning the join into an equi-join on ``bin`` + an exact
post-filter. Bin width trades explosion factor vs bucket selectivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    on: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left rows + ``prefix``-renamed right value columns from the latest
    right row at-or-before the left row's ``on`` (per ``by``).

    ``right`` must be unique on (by, on) — pre-aggregate duplicates (the
    match at equal timestamps would otherwise be nondeterministic; DuckDB's
    ASOF JOIN has the same requirement). Ties at the same ``on`` between a
    right and a left row match INCLUSIVELY (right sorts first).
    """
    out_cols = [f"{prefix}{c}" for c in value_cols] + [f"{prefix}{on}"]
    # the matched right row travels as ONE struct filled with a single
    # last(ignorenulls) — per-column fills could blend columns from
    # DIFFERENT right rows when a right value column is NULL (DuckDB's
    # ASOF JOIN returns the matching row's NULL, so must we)
    from pyspark.sql.types import StructField, StructType

    match_type = StructType(
        [StructField(f"{prefix}{c}", right.schema[c].dataType) for c in value_cols]
        + [StructField(f"{prefix}{on}", right.schema[on].dataType)]
    )
    r = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(c).alias(f"{prefix}{c}") for c in value_cols],
            F.col(on).alias(f"{prefix}{on}"),
        ).alias("__match"),
    )
    l = left.select(
        "*",
        F.lit(1).alias("__side"),
        F.lit(None).cast(match_type).alias("__match"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(on, "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    left_keep = [c for c in l.columns if c not in ("__side", "__match")]
    filled = (
        u.select(
            *left_keep,
            "__side",
            F.last("__match", ignorenulls=True).over(w).alias("__match"),
        )
        .filter(F.col("__side") == 1)
        .select(
            *left_keep,
            "__side",
            *[F.col(f"__match.{c}").alias(c) for c in out_cols],
        )
    )
    if tolerance_seconds is not None:
        within = (
            F.unix_micros(F.col(on).cast("timestamp"))
            - F.unix_micros(F.col(f"{prefix}{on}").cast("timestamp"))
        ) <= tolerance_seconds * 1_000_000
        filled = filled.select(
            *[c for c in filled.columns if c not in out_cols and c != "__side"],
            "__side",
            *[F.when(within, F.col(c)).alias(c) for c in out_cols],
        )
    return filled.drop("__side")


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Inner-join left rows to right intervals with
    ``lo_col <= left_col < hi_col`` via bin equi-join + exact filter.

    Explosion factor per interval is ceil(span / bin_width) + 1; pick
    bin_width near the median interval span. Works for large-large joins
    (both sides shuffle on ``bin``); a small right side would simply be
    broadcast with the raw BETWEEN predicate instead.
    """
    lbin = F.floor(F.col(left_col) / F.lit(bin_width)).cast("long")
    lo_bin = F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long")
    hi_bin = F.floor(F.col(hi_col) / F.lit(bin_width)).cast("long")
    binned_left = left.withColumn("__bin", lbin)
    binned_right = right.withColumn(
        "__bin", F.explode(F.sequence(lo_bin, hi_bin))
    )
    return (
        binned_left.join(binned_right, "__bin")
        .filter((F.col(left_col) >= F.col(lo_col)) & (F.col(left_col) < F.col(hi_col)))
        .drop("__bin")
    )
