"""Seen-set invariants: bloom has no false negatives (a seen URL is never
reported unseen), the exact backstop removes bloom false positives, and
growth past capacity triggers shard rebuild."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jobscrawler_spark.functions.urls import with_canonical
from jobscrawler_spark.operators import seen_set as SS
from jobscrawler_spark.operators.seen_set import SeenSet


def _urls(spark, lo, hi, n_shards=8):
    df = spark.createDataFrame(
        [(f"http://h{(i % 5):02d}.example.com/p/{i}",) for i in range(lo, hi)], ["url"]
    )
    return with_canonical(df, n_shards=n_shards)


def test_bloom_primitives_no_false_negatives():
    rng = np.random.default_rng(7)
    hashes = rng.integers(-(2**63), 2**63 - 1, size=2000, dtype=np.int64).view(np.uint64)
    bits = SS.bloom_build(hashes, 1 << 16)
    assert SS.bloom_test(bits, hashes, 1 << 16).all()
    other = rng.integers(-(2**63), 2**63 - 1, size=2000, dtype=np.int64).view(np.uint64)
    fresh = ~np.isin(other, hashes)
    fp_rate = SS.bloom_test(bits, other[fresh], 1 << 16).mean()
    assert fp_rate < 0.05


def test_add_then_filter_exact(spark, tmp_path):
    s = SeenSet(str(tmp_path / "seen"), n_shards=8)
    seen_urls = _urls(spark, 0, 300)
    s.add(spark, seen_urls, round_no=0)
    # candidates: 150 overlapping + 200 fresh
    cand = _urls(spark, 150, 500)
    unseen = s.filter_unseen(spark, cand)
    got = sorted(r["url"] for r in unseen.collect())
    want = sorted(
        f"http://h{(i % 5):02d}.example.com/p/{i}" for i in range(300, 500)
    )
    assert got == want


def test_incremental_adds_and_rebuild(spark, tmp_path):
    s = SeenSet(str(tmp_path / "seen"), n_shards=4)
    for rnd, (lo, hi) in enumerate([(0, 200), (200, 500), (500, 2000)]):
        s.add(spark, _urls(spark, lo, hi, n_shards=4), round_no=rnd)
    # every added URL must be filtered out (no false negatives end-to-end)
    unseen = s.filter_unseen(spark, _urls(spark, 0, 2100, n_shards=4))
    got = {r["url"] for r in unseen.collect()}
    assert got == {f"http://h{(i % 5):02d}.example.com/p/{i}" for i in range(2000, 2100)}
    # blooms stayed consistent with the exact set
    blooms = s.bloom.read(spark).collect()
    assert sum(b["n_items"] for b in blooms) == 2000
    assert all(b["n_bits"] > 0 for b in blooms)


def test_idle_shards_keep_single_bloom_row(spark, tmp_path):
    """A shard untouched by later rounds must keep exactly ONE bloom row:
    the cogroup update visits bloom-only shards too, and emitting a row
    there would duplicate the `untouched` anti-join union every round."""
    s = SeenSet(str(tmp_path / "seen"), n_shards=2)

    def forged(url, h, shard):
        return spark.createDataFrame(
            [(url, h, "x.example.com", shard)],
            "url string, url_hash long, host string, shard int",
        )

    s.add(spark, forged("http://x.example.com/0", 11, 0), round_no=0)
    for rnd in range(1, 4):  # three rounds that only ever touch shard 1
        s.add(spark, forged(f"http://x.example.com/{rnd}", 100 + rnd, 1), round_no=rnd)
    rows = s.bloom.read(spark).groupBy("shard").count().collect()
    assert {r["shard"]: r["count"] for r in rows} == {0: 1, 1: 1}
    # and probing still sees everything
    assert s.filter_unseen(spark, forged("http://x.example.com/0", 11, 0)).count() == 0


def test_hash_collision_cannot_evict(spark, tmp_path):
    """Two different URLs forced onto the same url_hash: adding one must not
    hide the other (exactness via the (url_hash, url) join)."""
    s = SeenSet(str(tmp_path / "seen"), n_shards=2)
    a = spark.createDataFrame([("http://a.example.com/x",)], ["url"])
    a = with_canonical(a, n_shards=2)
    s.add(spark, a, round_no=0)
    h = a.collect()[0]["url_hash"]
    shard = a.collect()[0]["shard"]
    forged = spark.createDataFrame(
        [("http://b.example.com/y", h, "b.example.com", shard)],
        "url string, url_hash long, host string, shard int",
    )
    out = s.filter_unseen(spark, forged).collect()
    assert len(out) == 1 and out[0]["url"] == "http://b.example.com/y"


def _range_urls(spark, lo, hi, n_shards=1):
    """Generated (not collected) URL batch — growth tests add thousands."""
    df = spark.range(lo, hi).select(
        F.format_string("http://g%d.example.com/p/%d", F.col("id") % 5, F.col("id")).alias(
            "url"
        )
    )
    return with_canonical(df, n_shards=n_shards)


@pytest.mark.parametrize("prefilter", ["bloom", "cuckoo"])
def test_growth_rebuilds_stay_exact(spark, tmp_path, prefilter):
    """Adversarial growth: ONE shard driven through >=3 capacity rebuilds
    (tiny min size + headroom 2 instead of 8, so the test stays small).
    After EVERY add the probe must stay exact — including the adds that
    crossed a rebuild — the rebuild path must actually have fired >=3
    times, and the bloom table keeps exactly one row for the shard."""
    from jobscrawler_spark.operators import cuckoo

    def small_size(n_items, min_bits=256):
        target = max(n_items * SS.BITS_PER_ITEM, min_bits)
        n = min_bits
        while n < target:
            n <<= 1
        return n

    if prefilter == "bloom":

        class SmallBackend(SS._BloomBackend):
            size_for = staticmethod(lambda n: small_size(n * 2))
            needs_rebuild = staticmethod(lambda n, size: small_size(n) > size)

    else:

        class SmallBackend(SS._CuckooBackend):
            size_for = staticmethod(lambda n: cuckoo.size_for(max(n, 1) * 2))
            needs_rebuild = staticmethod(
                lambda n, size: n > int(0.9 * size * cuckoo.SLOTS)
            )

    s = SeenSet(str(tmp_path / f"seen_{prefilter}"), n_shards=1, prefilter=prefilter)
    s.backend = SmallBackend  # locally-defined class ships by value
    batches = [(0, 10), (10, 40), (40, 140), (140, 540), (540, 1500), (1500, 5000)]
    for rnd, (lo, hi) in enumerate(batches):
        s.add(spark, _range_urls(spark, lo, hi), round_no=rnd)
        probe = _range_urls(spark, max(0, hi - 50), hi + 25)
        got = {r["url"] for r in s.filter_unseen(spark, probe).collect()}
        want = {f"http://g{i % 5}.example.com/p/{i}" for i in range(hi, hi + 25)}
        assert got == want, f"inexact after batch {rnd} ({prefilter})"
    rebuilds = [sn for sn in s.bloom.snapshots() if "rebuilt" in sn["meta"]]
    assert len(rebuilds) >= 3, [sn["meta"] for sn in s.bloom.snapshots()]
    rows = s.bloom.read(spark).collect()
    assert len(rows) == 1
    assert rows[0]["n_items"] == 5000 and rows[0]["n_bits"] > 0


def test_probe_treats_capacity_flag_row_as_all_maybe(spark, tmp_path):
    """A concurrent add() commits a bloom snapshot whose over-capacity
    shards carry the (n_bits=0, bits=b'') flag BEFORE _rebuild_shards
    overwrites it; a probe binding that intermediate snapshot must treat
    the shard as all-maybe (exact anti-join decides) — not crash on a
    mod-0 probe (ADVICE r2 high)."""
    import pandas as pd

    s = SeenSet(str(tmp_path / "seen"), n_shards=2)
    s.add(spark, _urls(spark, 0, 100, n_shards=2), round_no=0)
    # forge the intermediate state: overwrite shard 0's row with the flag
    bloom = s.bloom.read(spark).toPandas()
    flagged = bloom.copy()
    flagged.loc[flagged["shard"] == 0, "bits"] = b""
    flagged.loc[flagged["shard"] == 0, "n_bits"] = 0
    s.bloom.overwrite(
        spark.createDataFrame(flagged, s.bloom.read(spark).schema), meta={"forged": True}
    )
    out = s.filter_unseen(spark, _urls(spark, 0, 150, n_shards=2))
    got = sorted(r["url"] for r in out.collect())
    want = sorted(f"http://h{(i % 5):02d}.example.com/p/{i}" for i in range(100, 150))
    assert got == want


def test_seen_table_partitioned_and_probe_prunes(spark, tmp_path):
    """The exact-probe backstop must scan only bloom-HIT shards: the seen
    table is hive-partitioned by shard and the backstop's scan carries a
    shard partition filter (file-level pruning at 10^10 rows)."""
    import contextlib
    import io
    import os

    s = SeenSet(str(tmp_path / "seen"), n_shards=8)
    s.add(spark, _urls(spark, 0, 300), round_no=0)
    snap0 = os.path.join(s.seen.path, "snap-00000")
    assert any(d.startswith("shard=") for d in os.listdir(snap0))

    out = s.filter_unseen(spark, _urls(spark, 150, 500))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l and "shard" in l]
    assert pf, plan  # the backstop scan is shard-pruned
    # and the result is still exact
    assert out.count() == 200
