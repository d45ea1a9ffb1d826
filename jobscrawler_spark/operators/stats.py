"""Mergeable distribution sketches: fixed-edge histograms + quantile
estimates read off them.

Exact ``percentile()`` (the a_stats gate's 'percentile' rows) collects
every value per group — the right answer at report time, the wrong plan
as a continuously-maintained statistic at 10^10 rows. A fixed-edge
histogram is the mergeable alternative: per-partition partial counts
combine by ADDITION (map-side partial agg does it for free, and
yesterday's histogram merges with today's by summing bins — the same
property t-digest/KLL buy with less error, realized here in its simplest
deterministic form). The quantile estimate is then linear interpolation
inside the target bin: error bounded by bin width, zero data movement
beyond one tiny groupBy.

Determinism contract (DuckDB-oracled in the a_stats gate): bin =
clamp(floor((v - lo)/width)) — identical double arithmetic in both
engines; the estimate is arithmetic on integer counts and fixed edges,
rounded to 4dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    group_col: str,
    n_bins: int = 16,
    lo: float = 0.0,
    hi: float = 600_000.0,
) -> DataFrame:
    """(group, bin, bin_n): fixed-edge counts — the mergeable sketch.
    Values outside [lo, hi) clamp into the edge bins (a sketch must
    total-count, never drop)."""
    width = (hi - lo) / n_bins
    bin_ = F.greatest(
        F.lit(0),
        F.least(
            F.lit(n_bins - 1),
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int"),
        ),
    )
    return df.groupBy(F.col(group_col).alias("group"), bin_.alias("bin")).agg(
        F.count("*").alias("bin_n")
    )


def approx_quantile_from_hist(
    hist: DataFrame,
    q: float = 0.5,
    n_bins: int = 16,
    lo: float = 0.0,
    hi: float = 600_000.0,
) -> DataFrame:
    """(group, approx, total): q-quantile estimated by linear
    interpolation inside the first bin whose cumulative count reaches
    q * total. Runs on the SKETCH (n_bins rows/group), not the data."""
    width = (hi - lo) / n_bins
    wc = Window.partitionBy("group").orderBy("bin")
    wt = Window.partitionBy("group")
    h = (
        hist.withColumn("cum", F.sum("bin_n").over(wc))
        .withColumn("total", F.sum("bin_n").over(wt))
        .withColumn("target", F.col("total") * F.lit(q))
        .filter(F.col("cum") >= F.col("target"))
        .withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") == 1)
    )
    est = (
        F.lit(lo)
        + F.col("bin") * F.lit(width)
        + F.lit(width)
        * (F.col("target") - (F.col("cum") - F.col("bin_n")))
        / F.col("bin_n")
    )
    return h.select("group", F.round(est, 4).alias("approx"), "total")
