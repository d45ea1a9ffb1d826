"""The crawl engine: batched fetch rounds over snapshot tables.

Round structure (SURVEY.md §3.1 re-expressed as a Spark dataflow):

    frontier (delta: base ⟕anti tombstones + host-delay events)
             ── eligible(not_before_round <= r)
             ── politeness budget window (per-host top-k, W4)
             ── salted repartition (skew kill)
             ── mapInPandas fetch (the only non-SQL stage)
             ├─→ images table   (status==200 rows, input_hint shape + lineage)
             ├─→ seen-set add   (ALL fetched URLs — 403s are not refetched)
             ├─→ outlinks: canonicalize → robots gate → dedupe → anti-join
             │   seen ∪ frontier → frontier INSERT delta (depth+1, round r+1)
             ├─→ frontier REMOVE delta (fetched URLs) + host delay events;
             │   compaction folds deltas every K rounds (O(round) writes,
             │   never an O(frontier) rewrite — SCALING.md "Frontier")
             └─→ per-partition metrics row(s)

Dedupe placement: the seen-set anti-join runs at INSERT time (bootstrap and
outlink ingestion), not per round — the frontier is unique by URL, so a URL
is checked against the seen set exactly once, mirroring the reference's
probe-before-fetch placement (reference: src/crawlers/async_bs4.py:154-166)
at 1/rounds the cost.

Determinism contract: fetch order within a round is the data-defined key
``(priority, url)`` per host under budgets, ``(round, priority, url)``
globally — never task completion order. The single-threaded oracle
(jobscrawler_spark.oracle.simulator) implements the same contract; the
equivalence tests require exact match of both the ordered fetch list and
the final URL-seen set.

Checkpointing: every table is a SnapshotTable; a round commits all writes,
then atomically updates ``checkpoint.json`` with the snapshot ids. Resume
rolls every table back to the checkpointed ids and continues — a crash
mid-round is invisible.
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.urls import shard_col, with_canonical
from .operators.fetch import run_fetch
from .operators.frontier import (
    politeness_select,
    robots_gate,
    salted_repartition,
)
from .operators.seen_set import SeenSet
from .plans.delta_frontier import DeltaFrontier
from .plans.tables import SnapshotTable
from pyspark.sql.types import StructType

from .schemas import (
    FETCH_RESULT,
    FRONTIER,
    HOST_EDGES,
    IMAGES,
    POLITENESS,
    ROBOTS,
    ROUND_METRICS,
)

# priority_mode="pagerank" constants (the simulator mirrors them exactly):
# link priority = (PR_SPAN - host_rank) * 1000 + xxhash64(url) % 1000, an
# integer-valued double (< 2^53, exactly representable) — central hosts
# sort first, the hash part breaks ties inside a host band. PR_SPAN equals
# the pagerank scale, so the band index is always nonnegative.
PR_SPAN = 10**9
PR_ITERS = 10

IMAGES_LANDED_COLS = [f.name for f in IMAGES.fields] + [
    "url",
    "url_hash",
    "host",
    "status",
    "round",
    "depth",
    "priority",
    "partition_id",
    "user_agent_idx",
]
IMAGES_LANDED = StructType(
    [next(f for f in FETCH_RESULT.fields if f.name == c) for c in IMAGES_LANDED_COLS]
)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        n_shards: int = 16,
        default_budget: int = 8,
        max_depth: int = 2,
        fetch_partitions: int | None = None,
        expire_history: bool = False,
        compact_every: int = 8,
        max_tombstone_rows: int = 10_000_000,
        prefilter: str = "bloom",  # or "cuckoo" (north_star's alternative)
        seen_partition_writes: bool = True,
        frontier_partition_writes: bool = True,
        recrawl_after: int | None = None,
        priority_mode: str = "hash",
    ):
        self.spark = spark
        self.base = base_path
        self.n_shards = n_shards
        self.default_budget = default_budget
        self.max_depth = max_depth
        # bounded-history mode: after each checkpoint, drop snapshots made
        # unreachable by the latest overwrite of each overwrite-mode table
        # (a long crawl would otherwise keep dead copies on disk). Resume
        # only ever rolls back to the LATEST checkpoint, so expiring
        # pre-overwrite history is safe.
        self.expire_history = expire_history
        self.fetch_partitions = fetch_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
        self.frontier = DeltaFrontier(
            f"{base_path}/frontier",
            compact_every=compact_every,
            max_tombstone_rows=max_tombstone_rows,
            partition_writes=frontier_partition_writes,
        )
        self.images = SnapshotTable(f"{base_path}/images", IMAGES_LANDED)
        self.metrics = SnapshotTable(f"{base_path}/metrics", ROUND_METRICS)
        self.seen = SeenSet(
            base_path, n_shards, prefilter=prefilter, partition_writes=seen_partition_writes
        )
        # re-crawl policy (r5): URLs fetched in round f are forgotten and
        # re-enqueued at the start of round f + recrawl_after + 1. Derived
        # purely from the round number, so resume needs no extra state.
        if recrawl_after is not None and recrawl_after < 1:
            raise ValueError("recrawl_after must be >= 1 (or None)")
        self.recrawl_after = recrawl_after
        # priority_mode="pagerank" (r6): newly discovered links (and
        # re-crawl re-enqueues) are prioritized by the INTEGER PageRank
        # of their host over the accumulated post-robots host graph —
        # central hosts fetched first. The graph is a dimension-sized
        # snapshot table; the oracle simulator mirrors the exact integer
        # contract, so fetch-order equivalence still holds bit-for-bit.
        if priority_mode not in ("hash", "pagerank"):
            raise ValueError("priority_mode must be 'hash' or 'pagerank'")
        self.priority_mode = priority_mode
        self.host_edges = (
            SnapshotTable(f"{base_path}/host_edges", HOST_EDGES)
            if priority_mode == "pagerank"
            else None
        )
        self._ranks_cache: tuple[int | None, DataFrame] | None = None
        self.next_round = 0

    # ------------------------------------------------------------------ dims
    def _dim_path(self, name: str) -> str:
        return os.path.join(self.base, f"dim_{name}")

    def _write_dim(self, name: str, pdf: pd.DataFrame, schema) -> None:
        self.spark.createDataFrame(pdf, schema).coalesce(1).write.mode("overwrite").parquet(
            self._dim_path(name)
        )

    def _politeness(self) -> DataFrame:
        return self.spark.read.parquet(self._dim_path("politeness"))

    def _robots(self) -> DataFrame:
        """Grouped robots dim, cached once per engine (reused every round)."""
        if getattr(self, "_robots_grouped", None) is None:
            from .operators.frontier import group_robots

            self._robots_grouped = group_robots(
                self.spark.read.parquet(self._dim_path("robots"))
            ).cache()
        return self._robots_grouped

    # ------------------------------------------------------------- bootstrap
    def bootstrap(
        self,
        seeds: pd.DataFrame | DataFrame,
        politeness: pd.DataFrame,
        robots: pd.DataFrame,
    ) -> None:
        self._write_dim("politeness", politeness, POLITENESS)
        self._write_dim("robots", robots, ROBOTS)
        if isinstance(seeds, pd.DataFrame):
            seeds = self.spark.createDataFrame(seeds[["url", "priority", "depth"]])
        canon = with_canonical(seeds.select("url", "priority", "depth"), n_shards=self.n_shards)
        gated = robots_gate(canon, self._robots())
        # canonicalization collapses dirty variants: keep min(priority)/min(depth)
        deduped = gated.groupBy("url", "url_hash", "host", "shard").agg(
            F.min("priority").alias("priority"), F.min("depth").alias("depth")
        )
        rows = (
            deduped.withColumn("not_before_round", F.lit(0))
            .withColumn("attempts", F.lit(0))
            .select([f.name for f in FRONTIER.fields])
        )
        self.frontier.bootstrap(self.spark, rows)
        self.next_round = 0
        self._commit_checkpoint()

    def update_politeness(self, politeness: pd.DataFrame) -> None:
        """Mid-crawl politeness update — the robots-discovery path: a host's
        /robots.txt fetched during the crawl can declare a Crawl-delay
        (operators.frontier.parse_robots_crawl_delay), which feeds back into
        this dim. Takes effect from the NEXT round (the dim is re-read per
        round); the cached any-delays flag is dropped so the pushback stage
        re-arms."""
        self._write_dim("politeness", politeness, POLITENESS)
        self._any_delays = None
        self._n_salts = None  # budget-derived salts re-derive from the new dim

    def _has_delays(self) -> bool:
        """Cached once per engine: whether ANY host has a crawl delay — when
        none do (common in benchmarks) the per-round pushback stage is
        skipped entirely (the politeness dim is tiny, one limit-1 scan)."""
        if getattr(self, "_any_delays", None) is None:
            self._any_delays = (
                self._politeness().filter(F.col("crawl_delay_rounds") > 0).limit(1).count() > 0
            )
        return self._any_delays

    def _salts(self) -> int:
        """Cached once per engine (re-derived after update_politeness):
        POLITENESS salt count from the dim's MAX per-host budget via
        auto_salt_buckets — keeps a 10^5-budget host's phase-1 cap
        windows ~4k rows deep (r3 verdict item 7). Fetch-stage spreading
        is governed separately by fetch_salt_buckets inside
        salted_repartition. One tiny agg over the coalesce(1) dim, once
        per crawl."""
        if getattr(self, "_n_salts", None) is None:
            from .operators.frontier import auto_salt_buckets

            mx = (
                self._politeness().agg(F.max("max_fetches_per_round")).collect()[0][0]
                or 0
            )
            self._n_salts = auto_salt_buckets(max(int(mx), self.default_budget))
        return self._n_salts

    # ------------------------------------------------- pagerank priorities
    def _host_ranks(self) -> DataFrame | None:
        """(host, rank) from components.pagerank over the accumulated
        host graph — recomputed only when the edge table advanced
        (cached per snapshot id), localCheckpointed because the rank
        table is dimension-sized (hosts, not URLs) and re-joined by
        every priority assignment until the next edge append."""
        snap = self.host_edges.current_snapshot
        if snap is None:
            return None
        if self._ranks_cache is not None and self._ranks_cache[0] == snap:
            return self._ranks_cache[1]
        from .operators.components import pagerank

        edges = self.host_edges.read(self.spark).select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        )
        if edges.isEmpty():
            self._ranks_cache = (snap, None)
            return None
        ranks = pagerank(edges, iters=PR_ITERS, scale=PR_SPAN).select(
            F.col("node").alias("host"), "rank"
        ).localCheckpoint()
        self._ranks_cache = (snap, ranks)
        return ranks

    def _link_priority(self, links: DataFrame) -> DataFrame:
        """Assign the link-rule priority. hash mode: xxhash64 % 1e6 / 1e6
        (the r1 rule). pagerank mode: the PR_SPAN band formula over the
        CURRENT rank table (hosts never seen in the graph rank 0 — their
        links sort behind every ranked host, ahead of nothing)."""
        if self.priority_mode == "hash":
            return links.withColumn(
                "priority",
                F.pmod(F.col("url_hash"), F.lit(1_000_000)).cast("double")
                / 1_000_000.0,
            )
        ranks = self._host_ranks()
        if ranks is not None:
            links = links.join(F.broadcast(ranks), "host", "left")
        else:
            links = links.withColumn("rank", F.lit(None).cast("long"))
        return links.withColumn(
            "priority",
            (
                (F.lit(PR_SPAN) - F.coalesce(F.col("rank"), F.lit(0))) * 1000
                + F.pmod(F.col("url_hash"), F.lit(1000))
            ).cast("double"),
        ).drop("rank")

    # ----------------------------------------------------------- round loop
    def _seen_min_round(self) -> int | None:
        """Oldest round_added still blocking (re-crawl mode): rows from
        rounds <= the current cutoff are logically expired."""
        cutoff = getattr(self, "_recrawl_cutoff", None)
        return None if cutoff is None or cutoff < 0 else cutoff + 1

    def _expire_and_reenqueue(self, r: int) -> None:
        """Re-crawl policy step (runs before the round reads the frontier):
        forget the URLs fetched in round r - recrawl_after - 1 (cuckoo
        prefilter deletes their fingerprints; blooms stay conservative)
        and re-enqueue them as fresh frontier rows eligible this round."""
        from .functions.urls import host_col

        cutoff = r - self.recrawl_after - 1
        self._recrawl_cutoff = cutoff
        if cutoff < 0:
            return
        expired = self.seen.expire(self.spark, cutoff)
        if expired is None:
            return
        try:
            # pagerank mode: re-enqueues use the rank table as of the
            # PREVIOUS round's edges (this runs before the round fetches;
            # the simulator applies the same ordering)
            renew = (
                self._link_priority(
                    expired.withColumn("host", host_col(F.col("url")))
                )
                .withColumn("depth", F.lit(0))
                .withColumn("not_before_round", F.lit(r))
                .withColumn("attempts", F.lit(0))
                .select([f.name for f in FRONTIER.fields])
            )
            # added_in = r - 1: re-enqueued rows were conceptually present
            # BEFORE round r, so round-r delay events apply to them (links
            # minted in round r stay exempt) — and the round-aware
            # tombstone anti-join (removed_in >= added_in) no longer kills
            # them: their fetch round is <= r - 2 for recrawl_after >= 1.
            self.frontier.insert(renew, r - 1)
        finally:
            expired.unpersist()

    def run_round(self) -> dict:
        r = self.next_round
        t0 = time.monotonic()
        if self.recrawl_after is not None:
            self._expire_and_reenqueue(r)
        frontier_snap = self.frontier.version()
        frontier_df = self.frontier.read(self.spark)

        eligible = frontier_df.filter(F.col("not_before_round") <= r)
        n_salts = self._salts()
        selected = politeness_select(
            eligible, self._politeness(), self.default_budget, n_salts=n_salts
        )

        # fetch salt intentionally NOT the politeness salt: budgets are
        # already enforced, so the repartition salt is distribution-only
        # and auto-scales with fetch_partitions (salted_repartition)
        fetched = run_fetch(
            salted_repartition(selected, self.fetch_partitions), r, self.max_depth
        ).persist()

        # ONE aggregation covers every per-round statistic (keeping the
        # number of Spark jobs per round flat is what makes small rounds
        # cheap and scaling efficiency honest)
        totals = fetched.agg(
            F.count("*").alias("n_fetched"),
            F.sum((F.col("status") == 200).cast("long")).alias("n_ok"),
            F.sum(F.size("outlinks")).alias("n_outlinks"),
        ).collect()[0]
        n_selected = totals["n_fetched"] or 0
        t_fetch = time.monotonic()

        if n_selected == 0:
            # nothing eligible this round (all delayed); advance the clock
            fetched.unpersist()
            self.next_round = r + 1
            self._commit_checkpoint()
            return {"round": r, "selected": 0, "fetched": 0, "ok": 0, "new_urls": 0}

        # 1+2. everything that depends ONLY on the cached fetch batch runs
        # concurrently: images append ∥ seen-set add ∥ frontier tombstones ∥
        # metrics (the Spark scheduler accepts jobs from multiple threads;
        # latency, not CPU, dominates these at small round sizes — keeping
        # them off the critical path is what the scaling efficiency measures)
        from concurrent.futures import ThreadPoolExecutor

        landed = fetched.filter(F.col("status") == 200).select(IMAGES_LANDED_COLS)
        part_metrics = (
            fetched.groupBy("partition_id")
            .agg(
                F.count("*").alias("urls_fetched"),
                F.sum((F.col("status") == 200).cast("long")).alias("urls_ok"),
                F.sum(F.size("outlinks")).alias("new_urls"),
                F.sum((F.col("status") == 200).cast("long")).alias("rows_landed"),
            )
            .withColumn("round", F.lit(r))
            .withColumn("urls_selected", F.lit(n_selected))
            .withColumn("wall_ms", F.lit(int((time.monotonic() - t0) * 1000)))
            .withColumn("input_snapshot", F.lit(f"frontier@{frontier_snap}"))
            .select([f.name for f in ROUND_METRICS.fields])
            .coalesce(1)
        )
        def _links_job() -> int:
            # 3. discovered outlinks -> new frontier rows. Runs CONCURRENTLY
            # with the seen update: the probe may bind either the pre- or
            # post-update seen/bloom snapshots — every combination is exact
            # because links equal to a just-fetched URL are removed by the
            # explicit anti-join against the (broadcast-small) fetch batch,
            # and no other URL's membership changes within the round.
            links = (
                fetched.filter(F.col("status") == 200)
                .select(
                    F.col("host").alias("__src_host"),
                    F.explode("outlinks").alias("url"),
                    (F.col("depth") + 1).alias("depth"),
                )
            )
            links = with_canonical(links, n_shards=self.n_shards)
            links = robots_gate(links, self._robots())
            if self.priority_mode == "pagerank":
                # accumulate this round's post-robots host edges (BEFORE
                # any dedupe: a link to an already-seen URL still votes
                # for its host), then rank with the fresh graph
                new_edges = (
                    links.select(
                        F.col("__src_host").alias("src_host"),
                        F.col("host").alias("dst_host"),
                    )
                    .filter(F.col("src_host") != F.col("dst_host"))
                    .distinct()
                )
                self.host_edges.append(new_edges, {"round": r})
            links = self._link_priority(links.drop("__src_host"))
            links = links.join(
                fetched.select("url_hash", "url"), ["url_hash", "url"], "left_anti"
            )
            # within-round URL dedupe (min depth) folds into the probe's
            # shard cogroup — url determines shard, so it is shard-local
            links = self.seen.filter_unseen(
                self.spark, links, dedupe_min_depth=True,
                min_round_added=self._seen_min_round(),
            )
            # within-frontier dedupe: a link already pending must not
            # re-enter (frontier_df is bound to the round-start snapshot).
            # The anti-join's frontier side is PRUNED to the link batch's
            # hit shards (r4): the rows store is hive-partitioned by shard,
            # so the shard IN-list is a file-level partition prune — the
            # last O(frontier)-per-round read becomes O(hit shards). The
            # links cache + shard collect are one small job over O(round)
            # rows; at 2^14 shards a small round hits a handful of shards.
            links_cached = links.persist()
            try:
                hit_shards = [
                    row["shard"] for row in links_cached.select("shard").distinct().collect()
                ]
                if hit_shards:
                    pending = frontier_df.filter(F.col("shard").isin(hit_shards)).select(
                        "url_hash", "url"
                    )
                    fresh = links_cached.join(pending, ["url_hash", "url"], "left_anti")
                    new_rows = (
                        fresh.withColumn("not_before_round", F.lit(r + 1))
                        .withColumn("attempts", F.lit(0))
                        .select([f.name for f in FRONTIER.fields])
                    )
                    n_ins = self.frontier.insert(new_rows, r)
                else:
                    n_ins = 0
            finally:
                # unpersist on every path — an exception in the collect /
                # anti-join / insert must not leak the cache for the session
                links_cached.unpersist()
            return n_ins

        with ThreadPoolExecutor(6) as ex:
            f_images = ex.submit(self.images.append, landed, {"round": r})
            f_seen = ex.submit(
                self.seen.add,
                self.spark,
                fetched.select(
                    "url",
                    "url_hash",
                    shard_col(F.col("url_hash"), self.n_shards).alias("shard"),
                ),
                r,
                n_selected,
            )
            f_rm = ex.submit(self.frontier.remove, fetched, r, n_selected)
            f_metrics = ex.submit(self.metrics.append, part_metrics, {"round": r})
            f_insert = ex.submit(_links_job)
            f_delay = None
            if self._has_delays():
                delayed_hosts = (
                    fetched.select("host")
                    .distinct()
                    .join(self._politeness().filter(F.col("crawl_delay_rounds") > 0), "host")
                    .select("host", "crawl_delay_rounds")
                )
                f_delay = ex.submit(self.frontier.delay_hosts, delayed_hosts, r)
            images_snap = f_images.result()
            t_images = time.monotonic()
            f_seen.result()
            f_rm.result()
            f_metrics.result()
            t_seen = time.monotonic()
            f_insert.result()
            if f_delay is not None:
                f_delay.result()
        if self.frontier.maybe_compact(self.spark, r):
            # same cadence: fold the seen table's per-round appends so the
            # probe's union-of-snapshots read stays bounded (seen_set.compact);
            # re-crawl mode also physically drops logically-expired rows here
            self.seen.compact(self.spark, min_round_added=self._seen_min_round())
        t_frontier = time.monotonic()

        stats = {
            "round": r,
            "selected": n_selected,
            "fetched": n_selected,
            "ok": int(totals["n_ok"] or 0),
            "new_urls": int(totals["n_outlinks"] or 0),  # discovered (pre-dedupe)
            "images_snapshot": images_snap,
            "wall_s": time.monotonic() - t0,
            "phases": {
                "fetch+agg": round(t_fetch - t0, 2),
                "images_write": round(t_images - t_fetch, 2),
                "seen_update": round(t_seen - t_images, 2),
                "frontier_write": round(t_frontier - t_seen, 2),
                "metrics+ckpt": round(time.monotonic() - t_frontier, 2),
            },
        }
        fetched.unpersist()
        self.next_round = r + 1
        self._commit_checkpoint()
        if self.expire_history:
            # drop snapshots unreachable since each table's last overwrite
            # (frontier compaction / bloom fold); resume only ever rolls back
            # to the LATEST checkpoint, so expiry is safe
            self.frontier.expire_history()
            if self.seen.bloom.current_snapshot is not None:
                self.seen.bloom.expire_before(self.seen.bloom.current_snapshot)
            if self.seen.seen.current_snapshot is not None:
                # drops pre-compaction seen snapshots (unreachable since the
                # last overwrite); plain appends are all kept
                self.seen.seen.expire_before(self.seen.seen.current_snapshot)
        return stats

    def run(self, n_rounds: int) -> list[dict]:
        out = []
        for _ in range(n_rounds):
            s = self.run_round()
            out.append(s)
            # only pay a frontier count when a round came up empty — it may
            # mean "all delayed" (continue) or "frontier drained" (stop)
            if s["selected"] == 0 and self.frontier_size() == 0:
                break
        return out

    def frontier_size(self) -> int:
        if self.frontier.rows.current_snapshot is None:
            return 0
        return self.frontier.read(self.spark).count()

    # ---------------------------------------------------------- checkpoints
    def _ckpt_path(self) -> str:
        return os.path.join(self.base, "checkpoint.json")

    def _commit_checkpoint(self) -> None:
        state = {
            "next_round": self.next_round,
            "frontier": self.frontier.state(),
            "images": self.images.current_snapshot,
            "metrics": self.metrics.current_snapshot,
            "seen": self.seen.seen.current_snapshot,
            "bloom": self.seen.bloom.current_snapshot,
        }
        if self.host_edges is not None:
            state["host_edges"] = self.host_edges.current_snapshot
            state["priority_mode"] = self.priority_mode
        tmp = self._ckpt_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._ckpt_path())

    @classmethod
    def resume(cls, spark: SparkSession, base_path: str, **kwargs) -> "CrawlEngine":
        """Reload from checkpoint.json, rolling back any post-checkpoint
        table writes (a crash mid-round leaves orphan snapshots)."""
        with open(os.path.join(base_path, "checkpoint.json")) as f:
            state = json.load(f)
        # the checkpoint remembers the priority mode, so resume callers
        # don't have to repeat it (an explicit kwarg still wins)
        if "priority_mode" in state:
            kwargs.setdefault("priority_mode", state["priority_mode"])
        eng = cls(spark, base_path, **kwargs)
        if eng.host_edges is not None:
            eng.host_edges.rollback_to(state.get("host_edges"))  # None = drop all
        eng.frontier.rollback_to(state["frontier"])  # dict of 3 table ids
        eng.images.rollback_to(state["images"])
        eng.metrics.rollback_to(state["metrics"])
        eng.seen.seen.rollback_to(state["seen"])
        eng.seen.bloom.rollback_to(state["bloom"])
        eng.next_round = state["next_round"]
        return eng

    # ------------------------------------------------------------- readers
    def images_df(self) -> DataFrame:
        """Landed images, minus any taken-down ids (takedown_images):
        the mask is a BROADCAST anti-join (takedown sets are
        dimension-sized) applied at the single read chokepoint, so every
        consumer — fetch_log, dedup reports, exports — stops serving
        removed content the moment the tombstone commits, with zero cost
        when no takedown exists."""
        df = self.images.read(self.spark)
        dead = self._takedown_ids()
        if dead is not None:
            df = df.join(F.broadcast(dead), "image_id", "left_anti")
        return df

    def fetch_log(self) -> DataFrame:
        """Landed fetches in the deterministic order contract
        (round, priority, url). Reflects LIVE content: taken-down rows
        are masked with the payloads (the lineage a takedown must erase
        is the stored copy, and the bytes ride the same row)."""
        return self.images_df().orderBy("round", "priority", "url")

    # ---------------------------------------------------------- takedowns
    def _takedown_store(self) -> SnapshotTable:
        return SnapshotTable(f"{self.base}/takedowns")

    def _takedown_ids(self) -> DataFrame | None:
        """Live takedown set, or None. Only APPEND snapshots count —
        compact_takedowns clears the store with an empty overwrite
        marker, and empty non-partitioned writes still carry one
        schema-only parquet file (the ann_store._tombstone_ids rule)."""
        store = self._takedown_store()
        live = store._snaps_at(None)
        if not any(s["mode"] == "append" and s.get("has_data") for s in live):
            return None
        return store.read(self.spark).select("image_id").distinct()

    def takedown_images(
        self, image_ids, find_copies: bool = True, max_hamming: int = 0
    ) -> DataFrame:
        """TAKEDOWN (GDPR/DMCA): remove images from everything the
        engine serves — without rewriting a 10^10-row landed table on
        the request path. The flagged ids append to a tombstone
        SnapshotTable (O(flagged)); ``images_df`` masks them at once via
        a broadcast anti-join, so reports/exports/logs all comply
        immediately. With ``find_copies`` the request first expands to
        RE-HOSTED copies via ``similarity.phash_lookup`` against the
        landed phashes (default ``max_hamming=0``: bit-identical pixels
        under different URLs; raise toward 7 to sweep near-dups) — one
        broadcast probe, no corpus self-join. Physical deletion is
        deferred to ``compact_takedowns`` on the operator's schedule,
        not the regulator's; serving is identical before and after
        (test-pinned). The store lives under base_path, so takedowns
        survive ``resume``. Returns the expanded set
        (image_id, via='seed'|'phash_copy')."""
        from .operators.similarity import phash_bands, phash_lookup

        if not isinstance(image_ids, DataFrame):
            image_ids = self.spark.createDataFrame(
                [(str(i),) for i in image_ids], "image_id string"
            )
        seeds = image_ids.select("image_id").distinct().localCheckpoint()
        out = seeds.withColumn("via", F.lit("seed"))
        if find_copies:
            qimgs = self.images_df().join(
                F.broadcast(seeds), "image_id"
            ).select("image_id", "phash")
            copies = (
                phash_lookup(
                    qimgs,
                    phash_bands(self.images_df().select("image_id", "phash")),
                    max_hamming=max_hamming,
                )
                .select("image_id")
                .join(F.broadcast(seeds), "image_id", "left_anti")
                .distinct()
                .withColumn("via", F.lit("phash_copy"))
            )
            out = out.unionByName(copies)
        out = out.localCheckpoint()
        # a notice that resolves to nothing (URL never landed) must not
        # commit a snapshot: _takedown_ids counts append snapshots as
        # evidence, and an empty non-partitioned write still carries a
        # schema-only parquet file
        if out.limit(1).count() > 0:
            self._takedown_store().append(
                out.select("image_id"), meta={"stage": "takedown"}
            )
        return out

    def takedown_urls(
        self, urls, find_copies: bool = True, max_hamming: int = 0
    ) -> DataFrame:
        """Takedown addressed the way a notice actually arrives — by URL,
        not internal image id. The notice URLs run through the SAME
        canonicalizer the crawl stored them under (dirty variants — case,
        default ports, percent-encoding, tracker params — resolve to the
        stored row), map to landed image_ids with a broadcast join, and
        delegate to ``takedown_images``. URLs never landed resolve to
        nothing, harmlessly. Returns the expanded (image_id, via) set."""
        from .functions.urls import canonicalize_py

        canon = sorted({canonicalize_py(str(u)) for u in urls})
        hits = (
            self.images_df()
            .join(
                F.broadcast(
                    self.spark.createDataFrame([(u,) for u in canon], "url string")
                ),
                "url",
            )
            .select("image_id")
            .distinct()
        )
        return self.takedown_images(
            hits, find_copies=find_copies, max_hamming=max_hamming
        )

    def takedown_host(self, host: str, find_copies: bool = False) -> DataFrame:
        """Host-level purge — the robots-revocation / site-owner-request
        case: every landed image from ``host`` tombstones in one call
        (the host column is already on the landed rows; one filter, no
        join). ``find_copies`` defaults False: copies on OTHER hosts are
        someone else's content — sweeping them is a policy decision, not
        a default."""
        hits = (
            self.images_df()
            .filter(F.col("host") == host)
            .select("image_id")
            .distinct()
        )
        return self.takedown_images(hits, find_copies=find_copies)

    def compact_takedowns(self) -> None:
        """Physically drop tombstoned rows from the landed table, the
        phash band store, and the dedup label store (one overwrite
        snapshot each, superseded dirs expired), then clear the takedown
        set — disk returns to O(live content) and reads stop paying the
        anti-join. Serving output is unchanged (test-pinned)."""
        dead = self._takedown_ids()
        if dead is None:
            return
        dead = dead.localCheckpoint()
        for store, key in (
            (self.images, "image_id"),
            (SnapshotTable(f"{self.base}/phash_bands"), "image_id"),
            (SnapshotTable(f"{self.base}/dedup_labels"), "node"),
        ):
            if not any(s.get("has_data") for s in store._snaps_at(None)):
                continue
            live = store.read(self.spark).join(
                F.broadcast(dead.withColumnRenamed("image_id", key)),
                key,
                "left_anti",
            )
            if key == "node":
                # dedup_labels: a dead id that was a component's min-id
                # REPRESENTATIVE survives the node-side anti-join as a
                # component VALUE on live rows; once the tombstones are
                # cleared below, nothing masks it and the next incremental
                # clustering would resurrect it as a labeled node (ADVICE
                # r6). Remap dead component ids to the component's min
                # LIVE member — exactly the id a one-shot clustering over
                # the live images would pick.
                mins = live.groupBy("component").agg(
                    F.min("node").alias("__minn")
                )
                live = (
                    live.join(mins, "component")
                    .join(
                        F.broadcast(dead.withColumnRenamed("image_id", "__dc")),
                        F.col("component") == F.col("__dc"),
                        "left",
                    )
                    .select(
                        "node",
                        F.when(F.col("__dc").isNotNull(), F.col("__minn"))
                        .otherwise(F.col("component"))
                        .alias("component"),
                    )
                )
            live = live.localCheckpoint()
            # carry the watermark forward: clearing it would make the next
            # incremental call re-ingest every round
            metas = [s["meta"] for s in store._snaps_at(None)]
            upto = max((m.get("upto_round", -1) for m in metas), default=-1)
            meta = {"stage": "takedown_compact"}
            if upto >= 0:
                meta["upto_round"] = upto
            sid = store.overwrite(live, meta=meta)
            store.expire_before(sid)
        tstore = self._takedown_store()
        tsid = tstore.overwrite(dead.limit(0), meta={"stage": "cleared"})
        tstore.expire_before(tsid)
        # recommit: the compaction overwrote the images snapshot AND
        # expired its predecessors — a resume against the stale
        # checkpoint.json would roll images back to an expired snapshot id
        # and silently destroy the landed table (ADVICE r6, reproduced:
        # 93 images -> 0 after takedown + compact + resume)
        self._commit_checkpoint()

    def image_dedup_report(self, max_hamming: int = 7) -> DataFrame:
        """Post-crawl image dedup over the landed images table: phash
        near-dup pairs (banded Hamming LSH) -> connected components ->
        survivor labeling. (image_id, component, n_members, is_survivor);
        downstream corpus builds keep is_survivor rows (the reference's
        ON CONFLICT exact-key image dedupe, src/crawler.py:199-219,
        upgraded to near-duplicate clusters). Plan: EXACT-FIRST —
        identical phashes collapse to one representative before the
        banded self-join runs over distinct values (phash_dup_graph, so
        a million re-hosts of one logo are a million star edges, never
        ~10^12 enumerated pairs), then O(log d) pointer-doubling rounds
        + two uniform-key joins — never all-pairs (SCALING.md
        "Training-data operators")."""
        from .operators.components import label_clusters
        from .operators.similarity import phash_dup_graph

        imgs = self.images_df().select("image_id", "phash")
        edges, _deg = phash_dup_graph(imgs, max_hamming=max_hamming)
        return label_clusters(imgs, edges, "image_id")

    def incremental_image_dedup_report(
        self, max_hamming: int = 7, compact_every: int = 8
    ) -> DataFrame:
        """Near-dup pairs among images landed SINCE the last call, against
        everything landed before — the continuous-ingest alternative to
        image_dedup_report: a persisted band store (phash_bands appended
        per call, watermarked by round in the snapshot meta) makes day-N
        dedup cost O(new images + matching buckets) instead of
        re-banding the whole landed table every report. The union of
        successive calls' pair sets equals the one-shot
        phash_near_dup_pairs over all landed images (each pair surfaces
        when its later member lands — tests/test_incremental_dedup.py);
        feed the accumulated pairs to components.label_clusters for the
        cluster view. Survives resume: the store lives beside the other
        snapshot tables under base_path."""
        from .operators.similarity import incremental_phash_pairs, phash_bands

        store = SnapshotTable(f"{self.base}/phash_bands")
        done = max(
            (s["meta"].get("upto_round", -1) for s in store.snapshots()), default=-1
        )
        upto = self.next_round - 1
        new_imgs = (
            self.images_df()
            .filter(F.col("round") > done)
            .select("image_id", "phash")
        )
        nb = phash_bands(new_imgs).localCheckpoint()
        has_old = any(s.get("has_data") for s in store.snapshots())
        ob = store.read(self.spark) if has_old else nb.limit(0)
        # taken-down images must stop matching immediately — their bands
        # stay in the store until compact_takedowns, so mask the read
        # (images_df already masks the new side)
        dead = self._takedown_ids()
        if dead is not None:
            ob = ob.join(F.broadcast(dead), "image_id", "left_anti")
        pairs = incremental_phash_pairs(nb, ob, max_hamming=max_hamming).localCheckpoint()
        # append-heavy store hygiene (the delta_frontier compaction
        # argument): every call adds a snapshot whose files read() must
        # union, so after compact_every LIVE appends rewrite the store as
        # ONE overwrite snapshot. Count only snapshots reachable since the
        # last overwrite (_snaps_at), not the whole manifest — otherwise
        # once total commits ever reach compact_every every later call
        # would be an O(corpus) rewrite (ADVICE r5). After compacting,
        # expire the superseded dirs so disk stays O(store), not
        # O(store x compactions).
        if len(store._snaps_at(None)) + 1 >= compact_every:
            sid = store.overwrite(ob.unionByName(nb), meta={"upto_round": upto})
            store.expire_before(sid)
        else:
            store.append(nb, meta={"upto_round": upto})
        return pairs

    def incremental_image_clusters(
        self, max_hamming: int = 7, compact_every: int = 8
    ) -> DataFrame:
        """Continuously-maintained dedup CLUSTER LABELS over the landed
        table: incremental_image_dedup_report's pair stream folds into a
        persisted (node=image_id, component) label SnapshotTable via
        components.incremental_components (labels-as-star-edges), plus a
        self-edge per newly landed image so singletons are labeled too.
        The label table is O(images) and OVERWRITTEN per call (it IS the
        compacted cluster state); the cumulative pair history is never
        re-read, so day-N re-clustering costs O(labels + new pairs). At
        every point the labeling equals the one-shot clustering over all
        landed images (tests/test_incremental_dedup.py). This method OWNS
        the report cadence — interleaving direct
        incremental_image_dedup_report calls would consume pairs the
        label fold never sees. Survives resume like the band store."""
        from .operators.components import (
            connected_components,
            incremental_components,
        )

        lstore = SnapshotTable(f"{self.base}/dedup_labels")
        done = max(
            (s["meta"].get("upto_round", -1) for s in lstore.snapshots()), default=-1
        )
        upto = self.next_round - 1
        new_ids = (
            self.images_df().filter(F.col("round") > done).select("image_id").distinct()
        )
        pairs = self.incremental_image_dedup_report(
            max_hamming=max_hamming, compact_every=compact_every
        )
        edges = pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ).unionByName(
            new_ids.select(
                F.col("image_id").alias("src"), F.col("image_id").alias("dst")
            )
        )
        has_old = any(s.get("has_data") for s in lstore.snapshots())
        if has_old:
            old_labels = lstore.read(self.spark)
            # drop taken-down nodes from the folded-forward state (their
            # star edges would otherwise resurrect them in the new label
            # table; connectivity THROUGH an already-merged component is
            # retained by design — the content is gone, the historical
            # cluster identity is not recut)
            dead = self._takedown_ids()
            if dead is not None:
                old_labels = old_labels.join(
                    F.broadcast(dead.withColumnRenamed("image_id", "node")),
                    "node",
                    "left_anti",
                )
            labels = incremental_components(edges, old_labels)
            if dead is not None:
                # a dead id that was a multi-member component's REPRESENTATIVE
                # re-enters the vertex set through the surviving
                # (live_node, dead_id) star edges and would be re-emitted as
                # a labeled node — mask the RESULT's node column too
                # (ADVICE r6; nodes == live images is the invariant)
                labels = labels.join(
                    F.broadcast(dead.withColumnRenamed("image_id", "node")),
                    "node",
                    "left_anti",
                )
        else:
            labels = connected_components(edges)
        labels = labels.localCheckpoint()
        sid = lstore.overwrite(labels, meta={"upto_round": upto})
        lstore.expire_before(sid)
        return labels
