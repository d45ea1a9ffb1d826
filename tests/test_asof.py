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


def test_asof_matches_pandas_merge_asof(spark):
    """Independent oracle: pandas.merge_asof(direction='backward') on
    randomized data (ties, multiple keys, empty right groups)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n_l, n_r = 400, 120
    left = pd.DataFrame(
        {
            "id": np.arange(n_l),
            "k": rng.integers(0, 6, n_l).astype(str),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n_l), unit="s"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n_r).astype(str),  # key 5 has no right rows
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n_r), unit="s"),
            "v": rng.uniform(0, 1, n_r).round(6),
        }
    ).drop_duplicates(subset=["k", "ts"])  # asof requires unique (k, ts)

    got = {
        r["id"]: (r["asof_v"], r["asof_ts"])
        for r in asof_join_backward(
            spark.createDataFrame(left), spark.createDataFrame(right),
            by="k", on="ts", value_cols=["v"],
        ).collect()
    }
    want_df = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts", by="k", direction="backward", suffixes=("", "_r"),
    )
    matched = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort").assign(rts=lambda d: d["ts"]),
        on="ts", by="k", direction="backward",
    )
    for lrow, mrow in zip(want_df.itertuples(), matched.itertuples()):
        gv, gt = got[lrow.id]
        if pd.isna(lrow.v):
            assert gv is None and gt is None, lrow
        else:
            assert gv == lrow.v and pd.Timestamp(gt) == mrow.rts, (lrow, gv, gt)
