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
