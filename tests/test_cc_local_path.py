"""The r7 broadcast-threshold escape in connected_components: the
driver-side union-find path must label EXACTLY like the distributed
pointer-doubling loop (both = min reachable id), for int and string ids."""

import pytest
from pyspark.sql import functions as F

from jobscrawler_spark.operators.components import connected_components


@pytest.fixture()
def edges_df(spark):
    # two chains, one triangle-with-tail, a self-loop, and a string-free
    # int id space with gaps
    rows = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20), (22, 23), (30, 30)]
    return spark.createDataFrame(rows, "src long, dst long")


def _labels(df):
    return sorted((r["node"], r["component"]) for r in df.collect())


def test_local_path_equals_distributed(spark, edges_df):
    local = _labels(connected_components(edges_df))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        dist = _labels(connected_components(edges_df))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert local == dist
    assert local  # non-empty, sanity


def test_local_path_string_ids(spark):
    rows = [("img~a", "img~b"), ("img~b", "img~c"), ("zz", "aa")]
    df = spark.createDataFrame(rows, "src string, dst string")
    local = _labels(connected_components(df))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        dist = _labels(connected_components(df))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert local == dist
    comp = dict(local)
    assert comp["img~c"] == "img~a"
    assert comp["zz"] == "aa"
