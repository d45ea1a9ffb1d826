"""Snapshot table layer: atomic append/overwrite, time travel, rollback."""

from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from jobscrawler_spark.plans.tables import SnapshotTable

SCHEMA = StructType([StructField("k", IntegerType()), StructField("v", StringType())])


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_append_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), SCHEMA)
    assert t.read(spark).count() == 0
    s0 = t.append(_df(spark, [(1, "a")]))
    s1 = t.append(_df(spark, [(2, "b")]))
    assert t.read(spark).count() == 2
    assert t.read(spark, snapshot_id=s0).count() == 1
    assert t.current_snapshot == s1


def test_overwrite_resets(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), SCHEMA)
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    s1 = t.overwrite(_df(spark, [(9, "z")]))
    assert [r["k"] for r in t.read(spark).collect()] == [9]
    t.append(_df(spark, [(10, "y")]))
    assert t.read(spark).count() == 2
    assert t.read(spark, snapshot_id=s1).count() == 1


def test_rollback(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), SCHEMA)
    s0 = t.append(_df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))
    t.rollback_to(s0)
    assert t.read(spark).count() == 1
    assert t.current_snapshot == s0
    t.rollback_to(None)
    assert t.read(spark).count() == 0


def test_expire_before(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"), SCHEMA)
    t.overwrite(_df(spark, [(1, "a")]))
    t.overwrite(_df(spark, [(2, "b")]))
    s2 = t.overwrite(_df(spark, [(3, "c")]))
    t.expire_before(s2)
    assert [r["k"] for r in t.read(spark).collect()] == [3]
    assert len(t.snapshots()) == 1


def test_empty_partitioned_snapshot_does_not_brick_reads(spark, tmp_path):
    """R4 regression (review-found): an EMPTY DataFrame appended with
    partition_by writes only _SUCCESS; the per-snapshot union read of a
    partitioned table must skip such fileless dirs instead of raising
    UNABLE_TO_INFER_SCHEMA. A crawl legitimately commits one when a
    round's discovered links were all already pending."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from jobscrawler_spark.plans.tables import SnapshotTable

    schema = StructType(
        [StructField("k", StringType()), StructField("shard", IntegerType())]
    )
    t = SnapshotTable(str(tmp_path / "t"), schema)
    t.overwrite(
        spark.createDataFrame([("a", 1), ("b", 2)], schema), partition_by="shard"
    )
    t.append(spark.createDataFrame([], schema), partition_by="shard")  # fileless
    t.append(spark.createDataFrame([("c", 1)], schema), partition_by="shard")

    rows = {(r["k"], r["shard"]) for r in t.read(spark).collect()}
    assert rows == {("a", 1), ("b", 2), ("c", 1)}
    # partition pruning still works through the skip
    assert {r["k"] for r in t.read(spark).filter(F.col("shard") == 1).collect()} == {
        "a",
        "c",
    }
    # an all-empty table still reads as the schema'd empty frame
    t2 = SnapshotTable(str(tmp_path / "t2"), schema)
    t2.overwrite(spark.createDataFrame([], schema), partition_by="shard")
    assert t2.read(spark).count() == 0


def test_frontier_empty_insert_then_read(spark, tmp_path):
    """The exact engine call shape of the regression: DeltaFrontier.insert
    with ZERO fresh rows (a round whose discovered links were all already
    pending) followed by read() — must return the pre-insert frontier,
    not raise UNABLE_TO_INFER_SCHEMA on the fileless partitioned dir."""
    import pandas as pd
    from pyspark.sql import functions as F

    from jobscrawler_spark.functions.urls import with_canonical
    from jobscrawler_spark.plans.delta_frontier import DeltaFrontier
    from jobscrawler_spark.schemas import FRONTIER

    f = DeltaFrontier(str(tmp_path / "f"))
    seeds = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [f"http://h{i % 3}.example.com/p/{i}" for i in range(30)],
                "priority": 0.5,
                "depth": 0,
            }
        )
    )
    rows = (
        with_canonical(seeds, n_shards=4)
        .withColumn("not_before_round", F.lit(0))
        .withColumn("attempts", F.lit(0))
        .select([fld.name for fld in FRONTIER.fields])
    )
    f.bootstrap(spark, rows)
    assert f.read(spark).count() == 30
    f.insert(rows.filter(F.lit(False)), 0)  # empty insert, still committed
    assert f.read(spark).count() == 30
    f.insert(rows.limit(0), 1)
    f.compact(spark, 1)  # compaction across the fileless snapshots
    assert f.read(spark).count() == 30


# -------------------------------------------------------- snapshot diff


def test_snapshot_diff_insert_delete_update(spark, tmp_path):
    from jobscrawler_spark.plans.tables import SnapshotTable, snapshot_diff

    t = SnapshotTable(str(tmp_path / "cdc"))
    s0 = t.append(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"))
    s1 = t.append(spark.createDataFrame([(4, "d")], "k int, v string"))
    # compaction overwrite: 2 deleted, 3 updated, 1/4 unchanged
    s2 = t.overwrite(spark.createDataFrame(
        [(1, "a"), (3, "C"), (4, "d"), (5, "e")], "k int, v string"))

    def diff(a, b, cmp=("v",)):
        return {
            (r["k"], r["change"])
            for r in snapshot_diff(t, spark, a, b, ["k"], list(cmp)).collect()
        }

    assert diff(s0, s1) == {(4, "insert")}
    assert diff(s1, s2) == {(2, "delete"), (3, "update"), (5, "insert")}
    assert diff(s0, s2) == {(2, "delete"), (3, "update"), (4, "insert"), (5, "insert")}
    # reversed direction mirrors
    assert diff(s2, s0) == {(2, "insert"), (3, "update"), (4, "delete"), (5, "delete")}
    # identical snapshots -> empty diff
    assert diff(s2, s2) == set()
    # key-presence-only mode never reports updates
    assert {
        (r["k"], r["change"])
        for r in snapshot_diff(t, spark, s1, s2, ["k"]).collect()
    } == {(2, "delete"), (5, "insert")}


def test_snapshot_diff_plan_is_single_keyed_join(spark, tmp_path):
    from jobscrawler_spark.plans.tables import SnapshotTable, snapshot_diff

    t = SnapshotTable(str(tmp_path / "cdcp"))
    a = t.append(spark.createDataFrame([(i, str(i)) for i in range(50)], "k int, v string"))
    b = t.append(spark.createDataFrame([(99, "x")], "k int, v string"))
    p = (
        snapshot_diff(t, spark, a, b, ["k"], ["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
