"""Delta frontier: persistent base + per-round deltas + periodic compaction.

The naive frontier writes the whole table every round — at 10^10 rows
(~1 TB parquet) that is a full rewrite per round, the engine's one named
scale-killer (SCALING.md "Frontier"). This module replaces it with
merge-on-read state in three snapshot tables, so the per-round WRITE is
O(round size) instead of O(frontier size):

- ``rows``   (FRONTIER_STORED): append-only inserts, each row stamped with
  the round it was inserted in (``added_in``; bootstrap rows get -1).
  LIVE rows are unique by (url_hash, url): a URL enters the frontier at
  most once while pending (outlinks are anti-joined against seen ∪
  frontier first) and a fetched URL sits in the seen set. Under the
  re-crawl policy (r5) an EXPIRED URL re-enters with a fresh added_in —
  the tombstone anti-join is round-aware (removed_in >= added_in), so the
  old tombstone kills only the old row.
- ``tombstones`` (FRONTIER_RM): per-round append of the fetched URLs.
  Removal = left-anti join at read time.
- ``delays`` (FRONTIER_DELAY): per-round append of host-level crawl-delay
  pushback events ``(host, event_round, until)``. The engine's contract
  (pinned by the oracle simulator) is that a pushback in round q applies
  to the rows present in the frontier DURING round q — i.e. rows with
  ``added_in < q`` — while links discovered in round q are not delayed.
  Storing the event once per HOST instead of rewriting every affected row
  is what makes the delta representation exact AND O(hosts) per round.

Read path: ``rows`` ⟕anti ``tombstones`` (tombstone side broadcast — its
size is bounded by compact_every × round size), then a broadcast join of
the per-host event arrays and
``not_before_round = greatest(stored, max(until where event_round > added_in))``
— all Catalyst, no shuffle beyond the pruned-by-broadcast anti-join.

Compaction every ``compact_every`` rounds folds tombstones and events into
a fresh base overwrite and clears both delta tables. Crash-safety: a crash
between the three compaction writes is harmless — re-applying tombstones
of already-removed rows is a no-op, and re-applying events to compacted
rows (added_in = compaction round ≥ every event_round) selects nothing;
resume rolls all three tables back to the checkpoint anyway.

Reference analogue: the reference keeps its whole "frontier" as the config
list re-read every cron run (reference: src/crawler.py:322-349); a
persistent delta frontier is the north_rule's 10^10-URL re-realization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import FRONTIER, FRONTIER_DELAY, FRONTIER_RM, FRONTIER_STORED
from .tables import SnapshotTable

FRONTIER_COLS = [f.name for f in FRONTIER.fields]


class DeltaFrontier:
    def __init__(
        self,
        base_path: str,
        compact_every: int = 8,
        max_tombstone_rows: int = 10_000_000,
        partition_writes: bool = True,
    ):
        """``max_tombstone_rows`` is the broadcast-safety bound: at ~30 B/row
        10^7 tombstones are ~300 MB — near the practical broadcast ceiling.
        Below it the read-path anti-join broadcasts the tombstones; above it
        the read falls back to a shuffle anti-join AND compaction fires at
        the NEXT round end regardless of ``compact_every`` (cadence derives
        from tombstone mass, not a fixed round count — a huge round budget
        can no longer push the broadcast past the driver limit).

        ``partition_writes`` (r4): hive-partition the ``rows`` store by
        ``shard`` (as the seen set does), so shard-filtered reads — the
        engine's per-round pending-dedupe anti-join prunes to the link
        batch's hit shards — are FILE-LEVEL prunes instead of full-frontier
        scans (the last O(frontier)-per-round read path at 10^10 rows).
        A/B lever for the write cost; correctness is layout-independent."""
        self.rows = SnapshotTable(f"{base_path}/rows", FRONTIER_STORED)
        self.rm = SnapshotTable(f"{base_path}/tombstones", FRONTIER_RM)
        self.delay = SnapshotTable(f"{base_path}/delays", FRONTIER_DELAY)
        self.compact_every = compact_every
        self.max_tombstone_rows = max_tombstone_rows
        self.partition_writes = partition_writes

    def _clustered(self, df: DataFrame) -> DataFrame:
        """Cluster rows by shard before a hive-partitioned write so each
        task writes whole shards instead of spraying a file per shard dir
        (the seen set's measured ~0.4 s/round layout, SCALING.md)."""
        return df.repartition(F.col("shard")) if self.partition_writes else df

    def _pby(self) -> str | None:
        return "shard" if self.partition_writes else None

    def tombstone_rows(self) -> int:
        """Tombstone rows since the last compaction, from snapshot metadata
        (each remove() records its row count) — no table scan, and correct
        across resume because the manifest is the source of truth."""
        total = 0
        for s in self.rm.snapshots():
            if s["mode"] == "overwrite":
                total = 0
            total += int(s["meta"].get("rows", 0))
        return total

    # -- lifecycle -----------------------------------------------------------
    def bootstrap(self, spark: SparkSession, frontier_rows: DataFrame) -> None:
        """frontier_rows: FRONTIER-shaped seeds; deltas start empty."""
        self.rows.overwrite(
            self._clustered(frontier_rows.withColumn("added_in", F.lit(-1))),
            meta={"stage": "bootstrap"},
            partition_by=self._pby(),
        )
        self.rm.overwrite(spark.createDataFrame([], FRONTIER_RM), meta={"stage": "bootstrap"})
        self.delay.overwrite(
            spark.createDataFrame([], FRONTIER_DELAY), meta={"stage": "bootstrap"}
        )

    # -- merge-on-read -------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        """The effective frontier (FRONTIER columns, pushbacks folded in)."""
        rm = self.rm.read(spark).select(
            F.col("url_hash").alias("__rm_hash"),
            F.col("url").alias("__rm_url"),
            "removed_in",
        )
        if self.tombstone_rows() <= self.max_tombstone_rows:
            rm = F.broadcast(rm)
        # else: shuffle anti-join — same result, no driver-side collect of
        # an over-bound tombstone set (compaction fires at this round's end)
        rows = self.rows.read(spark)
        # ROUND-AWARE removal (r5 re-crawl support): a tombstone only kills
        # rows inserted at or before it (removed_in >= added_in), so a URL
        # re-enqueued by seen-set expiry AFTER its fetch survives its own
        # old tombstone. Without re-crawl the condition is always true
        # (a row is always inserted before it is fetched) — plan unchanged:
        # still a hash anti-join on the equi keys with a residual filter.
        live = rows.join(
            rm,
            (rows["url_hash"] == F.col("__rm_hash"))
            & (rows["url"] == F.col("__rm_url"))
            & (F.col("removed_in") >= rows["added_in"]),
            "left_anti",
        )
        ev = (
            self.delay.read(spark)
            .groupBy("host")
            .agg(F.collect_list(F.struct("event_round", "until")).alias("__ev"))
        )
        applicable = F.filter(
            F.coalesce(F.col("__ev"), F.array()),
            lambda e: e["event_round"] > F.col("added_in"),
        )
        until = F.array_max(F.transform(applicable, lambda e: e["until"]))
        return (
            live.join(F.broadcast(ev), "host", "left")
            .withColumn(
                "not_before_round",
                F.greatest(F.col("not_before_round"), F.coalesce(until, F.lit(-1))),
            )
            .select(FRONTIER_COLS)
        )

    # -- per-round deltas (each O(round size), not O(frontier size)) ---------
    def remove(self, fetched: DataFrame, round_no: int, n_rows: int | None = None) -> int:
        """Tombstone the round's fetched URLs. ``n_rows`` (the engine already
        knows it) is recorded in the snapshot meta — it drives the
        mass-based compaction trigger without a count action."""
        if n_rows is None:
            n_rows = fetched.count()
        return self.rm.append(
            fetched.select("url_hash", "url").withColumn("removed_in", F.lit(round_no)),
            meta={"round": round_no, "rows": int(n_rows)},
        )

    def delay_hosts(self, delayed: DataFrame, round_no: int) -> int:
        """delayed: (host, crawl_delay_rounds>0) fetched this round; a delay
        of d makes the host's rows ineligible before round_no + 1 + d."""
        events = delayed.select(
            "host",
            F.lit(round_no).alias("event_round"),
            (F.lit(round_no + 1) + F.col("crawl_delay_rounds")).alias("until"),
        )
        return self.delay.append(events, meta={"round": round_no})

    def insert(self, new_rows: DataFrame, round_no: int) -> int:
        """Append FRONTIER-shaped rows discovered during ``round_no``
        (they are exempt from round_no's own pushback events)."""
        return self.rows.append(
            self._clustered(
                new_rows.select(FRONTIER_COLS).withColumn("added_in", F.lit(round_no))
            ),
            meta={"round": round_no},
            partition_by=self._pby(),
        )

    # -- compaction ----------------------------------------------------------
    def maybe_compact(self, spark: SparkSession, round_no: int) -> bool:
        """Compact on the round cadence OR as soon as accumulated tombstone
        mass exceeds the broadcast-safe bound — whichever comes first."""
        by_cadence = self.compact_every > 0 and (round_no + 1) % self.compact_every == 0
        by_mass = self.tombstone_rows() > self.max_tombstone_rows
        if not (by_cadence or by_mass):
            return False
        self.compact(spark, round_no)
        return True

    def compact(self, spark: SparkSession, round_no: int) -> None:
        """Fold deltas into a fresh base; clear the delta tables."""
        eff = self.read(spark).withColumn("added_in", F.lit(round_no))
        self.rows.overwrite(
            self._clustered(eff), meta={"compact": round_no}, partition_by=self._pby()
        )
        self.rm.overwrite(spark.createDataFrame([], FRONTIER_RM), meta={"compact": round_no})
        self.delay.overwrite(
            spark.createDataFrame([], FRONTIER_DELAY), meta={"compact": round_no}
        )

    # -- checkpoint surface ---------------------------------------------------
    def state(self) -> dict:
        return {
            "rows": self.rows.current_snapshot,
            "rm": self.rm.current_snapshot,
            "delay": self.delay.current_snapshot,
        }

    def rollback_to(self, state: dict) -> None:
        self.rows.rollback_to(state["rows"])
        self.rm.rollback_to(state["rm"])
        self.delay.rollback_to(state["delay"])

    def expire_history(self) -> None:
        """Drop snapshots made unreachable by the last overwrite of each
        table (bootstrap/compaction); appends since then stay — disk usage
        between compactions is O(compact_every × round size)."""
        for t in (self.rows, self.rm, self.delay):
            if t.current_snapshot is not None:
                t.expire_before(t.current_snapshot)

    def version(self) -> str:
        s = self.state()
        return f"rows@{s['rows']}+rm@{s['rm']}+delay@{s['delay']}"
