"""Sharded URL-seen set: exact parquet set + per-shard bloom prefilter.

The reference probes Postgres once per candidate link
(``SELECT EXISTS(... WHERE link=%s)``, reference: src/utils/handy.py:11-22)
— an N+1 round-trip placed deliberately *before* the expensive follow-link
fetch (src/crawlers/async_bs4.py:154-166). This module re-realizes that as
the engine's core operator at frontier scale:

- the exact set lives in a snapshot table hash-partitioned by
  ``shard = pmod(xxhash64(canonical_url), N_SHARDS)``
- each shard carries a bloom filter (numpy bit array, double-hashing with
  k probes) used as a PREFILTER only: a bloom miss proves "never seen"
  (no false negatives), a bloom hit falls through to an exact anti-join
  on ``(url_hash, url)`` — url included so a 64-bit hash collision can
  never evict a URL. Exactness is what the north rule demands.
- bloom build/update/probe run as grouped-map / cogrouped-map pandas ops,
  so bloom bits cross the Arrow boundary once per SHARD, never per row.

At 10^10 URLs: N_SHARDS becomes 2^14, each shard ~6e5 items -> ~1.2 MB of
bloom bits at 16 bits/item; probe stays a co-partitioned join on `shard`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.tables import SnapshotTable
from ..schemas import SEEN_BLOOM, SEEN_SET

BITS_PER_ITEM = 16
N_HASHES = 7
MIN_BITS = 1 << 13  # 8192 bits minimum per shard


# ---------------------------------------------------------------------------
# numpy bloom primitives (vectorized over whole hash arrays)
# ---------------------------------------------------------------------------


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — derives the second probe stream."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def _positions(hashes: np.ndarray, n_bits: int, k: int = N_HASHES) -> np.ndarray:
    """(k, n) probe positions via double hashing."""
    h1 = hashes.astype(np.uint64)
    h2 = _mix64(h1) | np.uint64(1)
    nb = np.uint64(n_bits)
    return np.stack([(h1 + np.uint64(i) * h2) % nb for i in range(k)])


def bloom_build(hashes: np.ndarray, n_bits: int) -> bytes:
    bits = np.zeros(n_bits // 8, dtype=np.uint8)
    if len(hashes):
        pos = _positions(hashes, n_bits).ravel()
        np.bitwise_or.at(bits, pos >> np.uint64(3), (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))
    return bits.tobytes()


def bloom_or(a: bytes, b: bytes) -> bytes:
    return (np.frombuffer(a, dtype=np.uint8) | np.frombuffer(b, dtype=np.uint8)).tobytes()


def bloom_test(bits_buf: bytes, hashes: np.ndarray, n_bits: int) -> np.ndarray:
    """Boolean array: True = maybe seen, False = definitely unseen."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    bits = np.frombuffer(bits_buf, dtype=np.uint8)
    pos = _positions(hashes, n_bits)
    probe = (bits[(pos >> np.uint64(3)).astype(np.int64)] >> (pos & np.uint64(7)).astype(np.uint8)) & 1
    return probe.all(axis=0)


GROWTH = 8  # headroom factor on (re)build so rebuilds amortize O(log n)


def _size_for(n_items: int) -> int:
    target = max(n_items * BITS_PER_ITEM, MIN_BITS)
    n = MIN_BITS
    while n < target:
        n <<= 1
    return n


# ---------------------------------------------------------------------------
# prefilter backends: bloom (default) and cuckoo (north_star's alternative —
# deletable, lower FP rate). Same contract: a miss PROVES "never seen";
# build/fold may fail (None) when over capacity -> caller rebuilds bigger.
# The `size` value is bloom bits or cuckoo bucket count respectively (stored
# in the table's n_bits column either way).
# ---------------------------------------------------------------------------


class _BloomBackend:
    name = "bloom"
    can_delete = False

    @staticmethod
    def size_for(n_items: int) -> int:
        return _size_for(n_items * GROWTH)

    @staticmethod
    def needs_rebuild(n_items: int, size: int) -> bool:
        return _size_for(n_items) > size

    @staticmethod
    def build(hashes: np.ndarray, size: int) -> bytes | None:
        return bloom_build(hashes, size)

    @staticmethod
    def fold(old: bytes, size: int, hashes: np.ndarray) -> bytes | None:
        return bloom_or(old, bloom_build(hashes, size))

    @staticmethod
    def test(buf: bytes, hashes: np.ndarray, size: int) -> np.ndarray:
        return bloom_test(buf, hashes, size)

    @staticmethod
    def remove(buf: bytes, size: int, hashes: np.ndarray):
        """Blooms cannot delete: return None (= leave the filter stale).
        Stale bits are CONSERVATIVE — a false 'maybe' only costs the
        exact-backstop anti-join, never a wrong answer."""
        return None


class _CuckooBackend:
    name = "cuckoo"
    can_delete = True

    @staticmethod
    def size_for(n_items: int) -> int:
        from . import cuckoo

        return cuckoo.size_for(max(n_items, 1) * GROWTH)

    @staticmethod
    def needs_rebuild(n_items: int, size: int) -> bool:
        from . import cuckoo

        return n_items > int(0.9 * size * cuckoo.SLOTS)

    @staticmethod
    def build(hashes: np.ndarray, size: int) -> bytes | None:
        from . import cuckoo

        return cuckoo.build(hashes, size)

    @staticmethod
    def fold(old: bytes, size: int, hashes: np.ndarray) -> bytes | None:
        from . import cuckoo

        table = cuckoo.load(old, size)
        if cuckoo.insert(table, np.sort(hashes.astype(np.uint64))):
            return table.tobytes()
        return None

    @staticmethod
    def test(buf: bytes, hashes: np.ndarray, size: int) -> np.ndarray:
        from . import cuckoo

        return cuckoo.contains(cuckoo.load(buf, size), hashes)

    @staticmethod
    def remove(buf: bytes, size: int, hashes: np.ndarray):
        """The cuckoo filter's capability the bloom lacks (cuckoo.delete):
        returns (new bytes, n fingerprints removed). Only valid for items
        actually inserted — the seen-set expiry path guarantees that."""
        from . import cuckoo

        table = cuckoo.load(buf, size)
        found = cuckoo.delete(table, hashes)
        return table.tobytes(), int(found.sum())


PREFILTERS = {"bloom": _BloomBackend, "cuckoo": _CuckooBackend}


# ---------------------------------------------------------------------------
# SeenSet
# ---------------------------------------------------------------------------


class SeenSet:
    def __init__(
        self,
        base_path: str,
        n_shards: int = 16,
        prefilter: str = "bloom",
        partition_writes: bool = True,
    ):
        """``partition_writes=False`` drops the hive-partitioned exact-set
        layout (flat append, no shard repartition): the A/B lever for the
        write-path cost — correctness is identical (the probe simply loses
        file-level pruning and falls back to a filtered scan)."""
        self.n_shards = n_shards
        self.seen = SnapshotTable(f"{base_path}/seen_set", SEEN_SET)
        self.bloom = SnapshotTable(f"{base_path}/seen_bloom", SEEN_BLOOM)
        self.backend = PREFILTERS[prefilter]
        self.partition_writes = partition_writes

    # -- update -------------------------------------------------------------
    def add(
        self,
        spark: SparkSession,
        new_urls: DataFrame,
        round_no: int,
        n_new: int | None = None,
    ) -> None:
        """Append (url_hash, url, shard) rows and fold them into the shard
        blooms via a cogrouped-map (old bloom row + new hashes per shard).

        ``n_new`` skips the count action when the caller already knows it
        (the engine does — one aggregation over the fetched batch covers
        every per-round statistic).
        """
        rows = new_urls.select("url_hash", "url", "shard").withColumn(
            "round_added", F.lit(round_no)
        ).select([f.name for f in SEEN_SET.fields])
        if self.partition_writes:
            # cluster rows by shard BEFORE the hive-partitioned write: each
            # task then writes whole shards (≈ n_shards files per round)
            # instead of every task spraying a file into every shard dir
            rows = rows.repartition(F.col("shard"))
        rows = rows.persist()
        if n_new is None:
            n_new = rows.count()
        if n_new == 0:
            rows.unpersist()
            return

        old_bloom = self.bloom.read(spark)
        backend = self.backend

        def update(key, new_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
            if new_pdf.empty:
                # cogroup visits the union of keys: a shard present only in
                # old_bloom has nothing to fold in and is already carried by
                # the `untouched` anti-join union below — emitting a row here
                # would duplicate it (one extra full bit-array per idle round)
                return bloom_pdf.iloc[0:0]
            shard = int(key[0])
            hashes = new_pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
            if bloom_pdf.empty:
                size = backend.size_for(len(hashes))
                bits = backend.build(hashes, size)
                while bits is None:  # cuckoo over capacity: double and retry
                    size <<= 1
                    bits = backend.build(hashes, size)
                n_items = len(hashes)
            else:
                row = bloom_pdf.iloc[0]
                size = int(row["n_bits"])
                n_items = int(row["n_items"]) + len(hashes)
                bits = (
                    None
                    if backend.needs_rebuild(n_items, size)
                    else backend.fold(bytes(row["bits"]), size, hashes)
                )
                if bits is None:
                    # grown past capacity: caller must rebuild this shard
                    # from the exact set; flag with n_bits=0
                    return pd.DataFrame(
                        [{"shard": shard, "bits": b"", "n_items": n_items, "n_bits": 0, "n_hashes": N_HASHES}]
                    )
            return pd.DataFrame(
                [{"shard": shard, "bits": bits, "n_items": n_items, "n_bits": size, "n_hashes": N_HASHES}]
            )

        updated = (
            rows.groupBy("shard")
            .cogroup(old_bloom.groupBy("shard"))
            .applyInPandas(update, schema=SEEN_BLOOM)
        )
        # shards with no new rows keep their old bloom row
        untouched = old_bloom.join(rows.select("shard").distinct(), "shard", "left_anti")
        merged = updated.unionByName(untouched).persist()

        # the exact-set append and the bloom fold are independent jobs over
        # the cached rows — run them concurrently (scheduler latency, not
        # CPU, dominates them at small round sizes)
        def _bloom_job() -> list[int]:
            shards = [
                r["shard"]
                for r in merged.filter(F.col("n_bits") == 0).select("shard").collect()
            ]
            self.bloom.overwrite(merged, meta={"round": round_no})
            return shards

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(2) as ex:
            f_append = ex.submit(
                self.seen.append,
                rows,
                {"round": round_no, "rows": n_new},
                # hive-partitioned: the probe prunes to hit shards
                "shard" if self.partition_writes else None,
            )
            f_bloom = ex.submit(_bloom_job)
            f_append.result()
            needs_rebuild = f_bloom.result()
        merged.unpersist()
        rows.unpersist()
        if needs_rebuild:
            self._rebuild_shards(spark, needs_rebuild)

    def expire(self, spark: SparkSession, round_added: int):
        """Forget the URLs fetched in exactly ``round_added`` (the engine's
        re-crawl-after-N-rounds policy calls this once per round, so each
        round value is processed exactly once). Returns the expired rows
        (url_hash, url, shard — PERSISTED; caller unpersists) or None when
        there are none.

        Expiry is LOGICAL on the exact set: rows stay until compact()
        drops them, and probes pass ``min_round_added`` to ignore them —
        an O(seen) rewrite per round would be the scale-killer. The
        PREFILTER however is updated eagerly where the backend supports
        it: the cuckoo filter DELETES the expired fingerprints per shard
        (cogrouped map, O(expired + touched shards) — the deletable
        capability blooms lack, operators/cuckoo.py); the bloom backend
        stays stale-conservative (a stale bit costs one exact-backstop
        probe, never a wrong answer). The expired-row scan prunes by
        parquet round_added min/max stats: each per-round append snapshot
        holds a single round value."""
        if self.seen.current_snapshot is None:
            return None
        expired = (
            self.seen.read(spark)
            .filter(F.col("round_added") == round_added)
            .select("url_hash", "url", "shard")
            .persist()
        )
        if expired.count() == 0:
            expired.unpersist()
            return None
        backend = self.backend
        if not backend.can_delete or self.bloom.current_snapshot is None:
            return expired  # bloom: leave the filter stale-conservative
        old_bloom = self.bloom.read(spark)

        def drop(key, exp_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
            if exp_pdf.empty or bloom_pdf.empty:
                return bloom_pdf.iloc[0:0]
            row = bloom_pdf.iloc[0]
            size = int(row["n_bits"])
            if size == 0:
                return bloom_pdf  # capacity-flag row: rebuild will rebuild from the exact set
            hashes = exp_pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
            bits, n_removed = backend.remove(bytes(row["bits"]), size, hashes)
            return pd.DataFrame(
                [
                    {
                        "shard": int(key[0]),
                        "bits": bits,
                        "n_items": int(row["n_items"]) - n_removed,
                        "n_bits": size,
                        "n_hashes": int(row["n_hashes"]),
                    }
                ]
            )

        updated = (
            expired.groupBy("shard")
            .cogroup(old_bloom.groupBy("shard"))
            .applyInPandas(drop, schema=SEEN_BLOOM)
        )
        untouched = old_bloom.join(expired.select("shard").distinct(), "shard", "left_anti")
        self.bloom.overwrite(
            updated.unionByName(untouched), meta={"expired_round": round_added}
        )
        return expired

    def compact(self, spark: SparkSession, min_round_added: int | None = None) -> None:
        """Fold the per-round appended snapshots into one overwrite.

        The snapshot layer reads a partitioned table as a UNION of
        per-snapshot scans (hive layouts cannot share one multi-root
        read), so probe-plan size grows linearly with appended rounds —
        measured +0.15 s/round at sandbox scale. The engine compacts on
        the frontier's compact_every cadence, bounding the union at
        compact_every snapshots. (Real Iceberg makes this unnecessary:
        its manifests give appends a single-scan read; this is the
        emulation layer's equivalent maintenance action.)

        ``min_round_added`` (re-crawl mode): physically drop the
        logically-expired rows while we are rewriting anyway — expiry
        itself never pays an O(seen) write. The fold is sorted by
        round_added within partitions so the expiry scan's
        ``round_added == cutoff`` filter keeps parquet row-group min/max
        pruning over the compacted base too (pre-compaction appends
        prune for free: one round value per snapshot)."""
        if self.seen.current_snapshot is None:
            return
        rows = self.seen.read(spark)
        if min_round_added is not None:
            rows = rows.filter(F.col("round_added") >= min_round_added)
        if self.partition_writes:
            rows = rows.repartition(F.col("shard"))
        rows = rows.sortWithinPartitions("round_added")
        self.seen.overwrite(
            rows,
            meta={"compact": True},
            partition_by="shard" if self.partition_writes else None,
        )

    def _rebuild_shards(self, spark: SparkSession, shards: list[int]) -> None:
        full = self.seen.read(spark).filter(F.col("shard").isin(shards))
        backend = self.backend

        def rebuild(key, pdf: pd.DataFrame) -> pd.DataFrame:
            hashes = pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
            size = backend.size_for(len(hashes))
            bits = backend.build(hashes, size)
            while bits is None:
                size <<= 1
                bits = backend.build(hashes, size)
            return pd.DataFrame(
                [
                    {
                        "shard": int(key[0]),
                        "bits": bits,
                        "n_items": len(hashes),
                        "n_bits": size,
                        "n_hashes": N_HASHES,
                    }
                ]
            )

        rebuilt = full.groupBy("shard").applyInPandas(rebuild, schema=SEEN_BLOOM)
        others = self.bloom.read(spark).filter(~F.col("shard").isin(shards))
        self.bloom.overwrite(rebuilt.unionByName(others), meta={"rebuilt": shards})

    # -- probe ---------------------------------------------------------------
    def filter_unseen(
        self,
        spark: SparkSession,
        candidates: DataFrame,
        dedupe_min_depth: bool = False,
        min_round_added: int | None = None,
    ) -> DataFrame:
        """Rows of ``candidates`` whose (url_hash, url) is not in the set.

        Plan: cogrouped bloom probe per shard (bloom misses exit early) ->
        exact left-anti join for bloom hits only.

        ``dedupe_min_depth``: url determines shard, so within-batch URL
        dedupe (keeping min depth) is shard-local — folding it into the
        probe saves the caller a full shuffle.

        ``min_round_added`` (re-crawl mode): seen rows with
        round_added < min_round_added are logically expired and do NOT
        block — the filter rides the exact backstop's pruned scan; a
        stale bloom hit on an expired URL just falls through to it.
        """
        if self.seen.current_snapshot is None and self.bloom.current_snapshot is None:
            # empty set (bootstrap / first round): nothing can be seen, so
            # skip the bloom cogroup + hit-shard collect entirely; only the
            # within-batch min-depth dedupe remains (one shuffle on url).
            # Under the engine's concurrent round this is the same answer
            # as binding the pre-update snapshots — exact by the round
            # invariant (just-fetched URLs are anti-joined separately).
            if not dedupe_min_depth:
                return candidates
            from pyspark.sql import Window

            w = Window.partitionBy("url").orderBy("depth")
            return (
                candidates.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        seen_df = self.seen.read(spark)
        if min_round_added is not None:
            seen_df = seen_df.filter(F.col("round_added") >= min_round_added)
        bloom_df = self.bloom.read(spark)

        cand_cols = candidates.columns
        backend = self.backend  # local bind: the probe closure ships to executors
        out_schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in candidates.schema.fields
        ) + ", __maybe boolean"

        def probe(key, cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
            if cand_pdf.empty:
                return cand_pdf.assign(__maybe=pd.Series([], dtype=bool))
            if dedupe_min_depth:
                cand_pdf = cand_pdf.sort_values(
                    ["url", "depth"], kind="mergesort"
                ).drop_duplicates(subset=["url"], keep="first")
            if bloom_pdf.empty:
                return cand_pdf.assign(__maybe=False)
            row = bloom_pdf.iloc[0]
            n_bits = int(row["n_bits"])
            if n_bits == 0:
                # capacity-flag row (add() commits it before _rebuild_shards
                # issues the corrected overwrite — a concurrent probe may
                # bind that intermediate snapshot): no filter bits exist, so
                # everything is "maybe" and the exact anti-join decides.
                # Exactness holds; only this shard's prefilter saving is lost
                # for the one probe that raced the rebuild.
                return cand_pdf.assign(__maybe=True)
            hashes = cand_pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
            maybe = backend.test(bytes(row["bits"]), hashes, n_bits)
            return cand_pdf.assign(__maybe=maybe)

        # cache the probe output (hit_shards collect + the returned branches
        # both consume it); the PREVIOUS round's cache is dropped here so a
        # long crawl holds exactly one probed cache, not one per round
        prev = getattr(self, "_last_probed", None)
        if prev is not None:
            prev.unpersist()
        probed = (
            candidates.groupBy("shard")
            .cogroup(bloom_df.groupBy("shard"))
            .applyInPandas(probe, schema=out_schema)
        ).persist()
        self._last_probed = probed

        sure_unseen = probed.filter(~F.col("__maybe")).drop("__maybe")
        maybe = probed.filter(F.col("__maybe")).drop("__maybe")
        # exact backstop: join on url too — hash collisions must not evict.
        # The seen table is hive-partitioned by shard, so pruning the scan
        # to the bloom-HIT shards is a file-level prune: at 10^10 rows the
        # backstop reads only the handful of shards with hits instead of
        # shuffling the whole table; zero hits skip the join entirely.
        hit_shards = [r["shard"] for r in maybe.select("shard").distinct().collect()]
        if not hit_shards:
            return sure_unseen.select(cand_cols)
        seen_subset = seen_df.filter(F.col("shard").isin(hit_shards))
        checked = maybe.join(
            seen_subset.select("url_hash", "url"), on=["url_hash", "url"], how="left_anti"
        )
        return sure_unseen.unionByName(checked).select(cand_cols)

    def all_urls(self, spark: SparkSession) -> DataFrame:
        return self.seen.read(spark)
