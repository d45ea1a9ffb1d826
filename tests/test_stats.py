"""Histogram sketch: mergeability by addition, bounded quantile error,
edge clamping."""

import pytest
from pyspark.sql import functions as F

from jobscrawler_spark.operators.stats import approx_quantile_from_hist, histogram_sketch

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet").cache()


def test_histogram_merges_by_addition(spark, orders):
    """The defining sketch property: partial histograms over any data
    split combine by summing bin counts."""
    full = histogram_sketch(orders, "o_totalprice", "o_orderpriority")
    lo = histogram_sketch(
        orders.filter(F.col("o_orderkey") % 2 == 0), "o_totalprice", "o_orderpriority"
    )
    hi = histogram_sketch(
        orders.filter(F.col("o_orderkey") % 2 == 1), "o_totalprice", "o_orderpriority"
    )
    merged = (
        lo.unionByName(hi)
        .groupBy("group", "bin")
        .agg(F.sum("bin_n").alias("bin_n"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_approx_median_within_one_bin_width(spark, orders):
    hist = histogram_sketch(orders, "o_totalprice", "o_orderpriority")
    approx = {r["group"]: r["approx"] for r in approx_quantile_from_hist(hist).collect()}
    exact = {
        r["o_orderpriority"]: r["p50"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.expr("percentile(o_totalprice, 0.5)").alias("p50"))
        .collect()
    }
    assert set(approx) == set(exact)
    for g in exact:
        assert abs(approx[g] - exact[g]) <= 37500.0, (g, approx[g], exact[g])


def test_out_of_range_values_clamp_into_edge_bins(spark):
    df = spark.createDataFrame(
        [("g", -50.0), ("g", 0.0), ("g", 5.0), ("g", 99.0), ("g", 250.0)],
        "group0 string, v double",
    )
    h = {r["bin"]: r["bin_n"] for r in
         histogram_sketch(df, "v", "group0", n_bins=10, lo=0.0, hi=100.0).collect()}
    assert h[0] == 3  # -50 clamps up, 0 and 5 land organically
    assert h[9] == 2  # 99 organic, 250 clamps down
    assert sum(h.values()) == 5
