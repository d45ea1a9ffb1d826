"""Training-shard export sink: round-trip fidelity, manifest determinism,
budget bounds, and single-shard read pruning."""

import hashlib

import pytest
from pyspark.sql import functions as F

from jobscrawler_spark.operators import export as EX
from jobscrawler_spark.plans.tables import SnapshotTable

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def exported(spark, docs, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("shards"))
    sid, mid = EX.export_training_shards(docs, base, budget=512)
    return base, sid, mid


def test_roundtrip_exact(spark, docs, exported):
    base, _, _ = exported
    back = SnapshotTable(f"{base}/shards").read(spark)
    orig = {tuple(r) for r in docs.select("doc_id", "text", "source").collect()}
    got = {tuple(r) for r in back.select("doc_id", "text", "source").collect()}
    assert got == orig


def test_manifest_matches_written_data(spark, exported):
    """Every manifest row's (n_docs, shard_tokens, content_md5) must be
    reproducible from the WRITTEN shard files — the loader's integrity
    check."""
    base, _, _ = exported
    man = {r["shard"]: r for r in SnapshotTable(f"{base}/manifest").read(spark).collect()}
    back = SnapshotTable(f"{base}/shards").read(spark)
    per_shard = {}
    for r in back.select("shard", "doc_id", "n_tokens").collect():
        per_shard.setdefault(r["shard"], []).append((r["doc_id"], r["n_tokens"]))
    assert set(per_shard) == set(man)
    for shard, rows in per_shard.items():
        ids = sorted(i for i, _ in rows)
        md5 = hashlib.md5(",".join(str(i) for i in ids).encode()).hexdigest()
        m = man[shard]
        assert m["n_docs"] == len(rows)
        assert m["shard_tokens"] == sum(t for _, t in rows)
        assert m["content_md5"] == md5


def test_shard_token_mass_bounded(spark, docs, exported):
    """Concat-then-chunk bound: a shard's token mass never exceeds
    budget + (max single doc) — packing starts a doc in the bin where its
    cumulative start falls."""
    base, _, _ = exported
    man = SnapshotTable(f"{base}/manifest").read(spark)
    max_doc = EX.assign_shards(docs, budget=512).agg(F.max("n_tokens")).collect()[0][0]
    over = man.filter(F.col("shard_tokens") >= 512 + max_doc).count()
    assert over == 0
    # conservation: shard masses per source sum to the source's tokens
    per_src = {
        r["source"]: r["t"]
        for r in man.groupBy("source").agg(F.sum("shard_tokens").alias("t")).collect()
    }
    truth = {
        r["source"]: r["t"]
        for r in EX.assign_shards(docs, budget=512)
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    assert per_src == truth


def test_read_shard_prunes_to_one_prefix_dir(spark, exported):
    base, _, _ = exported
    man = SnapshotTable(f"{base}/manifest").read(spark)
    shard = man.orderBy("shard").first()["shard"]
    df = EX.read_shard(spark, base, shard)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pfx = EX._pfx(shard)
    # the prefix equality must land in the scan's PARTITION filters (hive
    # dir pruning) and the shard equality in the data filters (row-group
    # stats skip); inputFiles() lists the unpruned relation so the plan
    # string is the observable
    assert "PartitionFilters" in plan and "shard_pfx" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert f"{pfx}" in plan
    got = df.select("doc_id").count()
    expect = man.filter(F.col("shard") == shard).first()["n_docs"]
    assert got == expect


def test_manifest_deterministic_across_partitionings(spark, docs, tmp_path_factory):
    a = EX.shard_manifest(EX.assign_shards(docs.coalesce(1), budget=512))
    b = EX.shard_manifest(EX.assign_shards(docs.repartition(16), budget=512))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_reexport_overwrites_snapshot(spark, docs, exported):
    base, sid, mid = exported
    sid2, mid2 = EX.export_training_shards(docs, base, budget=512)
    assert sid2 == sid + 1 and mid2 == mid + 1
    back = SnapshotTable(f"{base}/shards").read(spark)
    assert back.count() == docs.count()
