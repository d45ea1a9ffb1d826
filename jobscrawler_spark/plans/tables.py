"""Snapshot-logged parquet tables (Iceberg semantics without the jar).

No Iceberg runtime is available in this container, so the engine carries a
minimal table layer with the same contract the north rule needs:

- **atomic append / overwrite**: data files are written to a fresh
  ``snap-NNNNN`` directory first; the manifest (``_snapshots.json``) is then
  swapped atomically (tmp + rename). Readers only ever see committed
  snapshots.
- **time travel**: ``read(spark, snapshot_id=k)`` reconstructs the table as
  of snapshot k — the checkpoint/resume path replays from recorded ids.
- **lineage**: each snapshot records its mode, row estimate and caller
  metadata (round number, shard, etc.).

Swappable for real Iceberg (``MERGE INTO`` / snapshot ids) where the jar
exists; the engine only touches this narrow surface.

Reference analogue: the Postgres tables + ON CONFLICT upserts
(reference: src/crawler.py:172-244, src/utils/handy.py:11-22) — here the
"upsert" is an anti-join + append, which this layer makes atomic.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_MANIFEST = "_snapshots.json"


class SnapshotTable:
    def __init__(self, path: str, schema: StructType | None = None):
        self.path = path
        self.schema = schema
        os.makedirs(path, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.path, _MANIFEST)

    def _load(self) -> list[dict]:
        p = self._manifest_path()
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)["snapshots"]

    def _commit(self, snapshots: list[dict]) -> None:
        tmp = self._manifest_path() + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"snapshots": snapshots}, f, indent=1)
        os.replace(tmp, self._manifest_path())

    # -- public api --------------------------------------------------------
    @property
    def current_snapshot(self) -> int | None:
        snaps = self._load()
        return snaps[-1]["id"] if snaps else None

    def snapshots(self) -> list[dict]:
        return self._load()

    def _write(
        self, df: DataFrame, mode: str, meta: dict | None, partition_by: str | None = None
    ) -> int:
        snaps = self._load()
        sid = (snaps[-1]["id"] + 1) if snaps else 0
        rel = f"snap-{sid:05d}"
        out = os.path.join(self.path, rel)
        w = df.write.mode("overwrite")
        if partition_by is not None:
            # hive layout: a filter on the partition column prunes files —
            # the seen table uses this so the exact-probe backstop scans
            # only the bloom-hit shards (SCALING.md "Seen-set")
            w = w.partitionBy(partition_by)
        w.parquet(out)
        snap = {"id": sid, "dir": rel, "mode": mode, "meta": meta or {}}
        if partition_by is not None:
            snap["partition_by"] = partition_by
        # record emptiness ONCE at commit time (one walk of the fresh dir):
        # read() then skips fileless snapshots from the manifest instead of
        # os.walking every snapshot dir on every read — for append-heavy
        # partitioned tables (seen/frontier) that walk was O(snapshots x
        # files) driver-side stat calls per round (ADVICE r4)
        snap["has_data"] = self._has_data_files(out)
        snaps.append(snap)
        self._commit(snaps)
        return sid

    def append(
        self, df: DataFrame, meta: dict | None = None, partition_by: str | None = None
    ) -> int:
        return self._write(df, "append", meta, partition_by)

    def overwrite(
        self, df: DataFrame, meta: dict | None = None, partition_by: str | None = None
    ) -> int:
        return self._write(df, "overwrite", meta, partition_by)

    def _snaps_at(self, snapshot_id: int | None) -> list[dict]:
        snaps = self._load()
        if snapshot_id is not None:
            snaps = [s for s in snaps if s["id"] <= snapshot_id]
        live: list[dict] = []
        for s in snaps:
            if s["mode"] == "overwrite":
                live = []
            live.append(s)
        return live

    def _dirs_at(self, snapshot_id: int | None) -> list[str]:
        return [os.path.join(self.path, s["dir"]) for s in self._snaps_at(snapshot_id)]

    def _is_partitioned(self) -> bool:
        return any("partition_by" in s for s in self._load())

    @staticmethod
    def _has_data_files(d: str) -> bool:
        """True if the snapshot dir contains at least one parquet data
        file. An EMPTY DataFrame written with partitionBy() produces only
        _SUCCESS (no files, no schema) — reading such a dir alone raises
        UNABLE_TO_INFER_SCHEMA, and a crawl can legitimately commit one
        (a round whose discovered links were all already pending). Empty
        snapshots are valid commits; reads just skip their dirs."""
        for root, _dirs, files in os.walk(d):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        # emptiness comes from the manifest (recorded at write time); the
        # os.walk is only the fallback for manifests written before the
        # has_data field existed
        dirs = [
            os.path.join(self.path, s["dir"])
            for s in self._snaps_at(snapshot_id)
            if s.get("has_data", None) is True
            or (
                s.get("has_data", None) is None
                and self._has_data_files(os.path.join(self.path, s["dir"]))
            )
        ]
        if not dirs:
            if self.schema is None:
                raise ValueError(f"empty table {self.path} with no schema")
            return spark.createDataFrame([], self.schema)
        if len(dirs) > 1 and self._is_partitioned():
            # hive-partitioned snapshots cannot share one multi-root read
            # (partition discovery needs a common base); union per-snapshot
            # reads — partition pruning still applies within each
            df = None
            for d in dirs:
                part = spark.read.parquet(d)
                df = part if df is None else df.unionByName(part)
        else:
            df = spark.read.parquet(*dirs)
        if self.schema is not None:
            # stable column order regardless of file layout
            df = df.select(*[f.name for f in self.schema.fields])
        return df

    def rollback_to(self, snapshot_id: int | None) -> None:
        """Drop snapshots newer than ``snapshot_id`` (None = drop all).

        Resume-from-checkpoint calls this to discard writes from a round
        that crashed after some table writes but before the checkpoint
        commit — the atomicity story for the round loop.
        """
        snaps = self._load()
        keep = [s for s in snaps if snapshot_id is not None and s["id"] <= snapshot_id]
        for s in snaps:
            if snapshot_id is None or s["id"] > snapshot_id:
                shutil.rmtree(os.path.join(self.path, s["dir"]), ignore_errors=True)
        self._commit(keep)

    def expire_before(self, snapshot_id: int) -> None:
        """Drop snapshots (and data dirs) no longer reachable — keeps the
        frontier's overwrite-per-round history from growing unboundedly."""
        snaps = self._load()
        keep: list[dict] = []
        # find last overwrite at-or-before snapshot_id: everything before it
        # is unreachable for reads >= snapshot_id
        cut = 0
        for i, s in enumerate(snaps):
            if s["mode"] == "overwrite" and s["id"] <= snapshot_id:
                cut = i
        for i, s in enumerate(snaps):
            if i < cut:
                shutil.rmtree(os.path.join(self.path, s["dir"]), ignore_errors=True)
            else:
                keep.append(s)
        self._commit(keep)


def snapshot_diff(
    table: SnapshotTable,
    spark: SparkSession,
    old_snapshot: int | None,
    new_snapshot: int | None,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """CDC between two snapshots of a SnapshotTable: one row per changed
    key, tagged ``change`` in {'insert', 'delete', 'update'} — the
    incremental-consumer primitive ("what changed since my last read?")
    every incremental operator in this repo implies, made explicit.
    ``update`` detection requires ``compare_cols`` (md5 over their
    string-cast concatenation decides value change; omit for a
    key-presence diff only).

    Scale shape: both sides are ordinary snapshot reads (partition/file
    pruning intact), the diff is ONE full-outer equi-join on the key
    columns (uniform hash keys) with map-side change classification —
    never a collect, never a cross join; the same cost class as the
    seen-set anti-join the engine already runs per round. For
    append-only histories the new side could be restricted to the
    appended snapshot dirs; this general form also handles
    overwrite/compaction commits, where file paths say nothing about
    row identity."""
    from pyspark.sql import functions as F

    def _side(sid: int | None, tag: str) -> DataFrame:
        df = table.read(spark, sid)
        sig = (
            F.md5(
                F.concat_ws(
                    "\x1f", *[F.col(c).cast("string") for c in compare_cols]
                )
            )
            if compare_cols
            else F.lit("")
        )
        return df.select(
            *[F.col(c) for c in key_cols],
            sig.alias(f"__sig_{tag}"),
            F.lit(True).alias(f"__in_{tag}"),
        )

    joined = _side(old_snapshot, "old").join(
        _side(new_snapshot, "new"), key_cols, "full_outer"
    )
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(F.col("__sig_old") != F.col("__sig_new"), F.lit("update"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )
