"""Upsert sink: ON CONFLICT DO NOTHING semantics + postgre_report parity."""

from jobscrawler_spark.operators.sink import upsert_unique
from jobscrawler_spark.plans.tables import SnapshotTable
from jobscrawler_spark.schemas import JOBS
import datetime


def _jobs(spark, links):
    rows = [
        (
            f"title {l}",
            l,
            "desc",
            datetime.date(2024, 1, 2),
            "Berlin",
            datetime.datetime(2024, 1, 2, 3, 4, 5),
            ["GERMANY"],
        )
        for l in links
    ]
    return spark.createDataFrame(rows, JOBS)


def test_upsert_dedupes_and_reports(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "jobs"), JOBS)
    r1 = upsert_unique(spark, t, _jobs(spark, ["a", "b", "c"]), key="link")
    assert r1 == {"count_before": 0, "count_after": 3, "inserted": 3, "batch_rows": 3}

    # overlap + within-batch duplicate: only 'd' is new
    r2 = upsert_unique(spark, t, _jobs(spark, ["b", "d", "d"]), key="link")
    assert r2["count_before"] == 3
    assert r2["inserted"] == 1
    assert r2["count_after"] == 4
    assert r2["batch_rows"] == 3
    assert sorted(r["link"] for r in t.read(spark).collect()) == ["a", "b", "c", "d"]


def test_upsert_idempotent_retry(spark, tmp_path):
    """Replaying the same batch (task-retry model) changes nothing."""
    t = SnapshotTable(str(tmp_path / "jobs"), JOBS)
    batch = _jobs(spark, ["x", "y"])
    upsert_unique(spark, t, batch, key="link")
    r = upsert_unique(spark, t, batch, key="link")
    assert r["inserted"] == 0 and r["count_after"] == 2
