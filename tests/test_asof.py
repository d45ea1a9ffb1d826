"""As-of join + binned range join unit semantics (gate queries j_asof_join /
j_range_join pin DuckDB parity; these pin the edge semantics)."""

import datetime as dt

from pyspark.sql import functions as F

from jobscrawler_spark.operators.asof import asof_join_backward, range_join_binned


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01T10:00")), (2, "u", _ts("2024-01-01T12:00")),
         (3, "u", _ts("2024-01-01T09:00")), (4, "v", _ts("2024-01-01T10:00"))],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts("2024-01-01T10:00"), 1.0), ("u", _ts("2024-01-01T11:00"), 2.0)],
        "k string, ts timestamp, v double",
    )
    out = {r["id"]: (r["asof_v"], r["asof_ts"]) for r in
           asof_join_backward(left, right, by="k", on="ts", value_cols=["v"]).collect()}
    assert out[1] == (1.0, _ts("2024-01-01T10:00"))  # inclusive tie
    assert out[2] == (2.0, _ts("2024-01-01T11:00"))  # latest preceding
    assert out[3] == (None, None)                    # nothing before
    assert out[4] == (None, None)                    # other key


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01T12:00"))], "id int, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", _ts("2024-01-01T10:00"), 5.0)], "k string, ts timestamp, v double"
    )
    ok = asof_join_backward(left, right, "k", "ts", ["v"],
                            tolerance_seconds=3 * 3600).collect()[0]
    assert ok["asof_v"] == 5.0
    stale = asof_join_backward(left, right, "k", "ts", ["v"],
                               tolerance_seconds=3600).collect()[0]
    assert stale["asof_v"] is None and stale["asof_ts"] is None


def test_range_join_bin_width_invariant(spark):
    """Results must not depend on bin width (bins are an execution detail)."""
    left = spark.createDataFrame([(i, float(i)) for i in range(100)], "id int, x double")
    right = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 9.5, 50.0), ("c", 95.0, 200.0)],
        "band string, lo double, hi double",
    )
    outs = []
    for w in (1.0, 7.0, 1000.0):
        rows = range_join_binned(left, right, "x", "lo", "hi", w).collect()
        outs.append(sorted((r["id"], r["band"]) for r in rows))
    assert outs[0] == outs[1] == outs[2]
    # boundary semantics: lo inclusive, hi exclusive
    got = dict()
    for i, band in outs[0]:
        got.setdefault(band, []).append(i)
    assert 10 not in got["a"] and 9 in got["a"]
    assert 95 in got["c"] and 99 in got["c"]
