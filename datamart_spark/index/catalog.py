"""Snapshot-manifest table catalog — Iceberg-shaped storage on parquet.

The production design targets Iceberg tables (`documents` partitioned
by days(warc_ts); `tokens`/`postings`/`doc_stats` partitioned by the
doc-range `shard`) with snapshot-based resumability.  The sandbox has
no Iceberg runtime jars and no network, so this module provides the
same contract over parquet directories + JSON snapshot manifests:

- snapshot JSON commits are atomic (write to ``.tmp`` then rename);
- table writes are per-shard-partition: full overwrite, dynamic
  partition overwrite (only the partitions present in the output are
  replaced — Iceberg ``overwritePartitions`` analog), and a
  filter-rewrite swap for row-level deletes (Iceberg ``DELETE WHERE``
  analog);
- per-shard lineage + build metrics in each snapshot (north rule:
  "resumable from checkpoint with per-partition lineage + metrics");
- resume = (wanted shards) − (shards in current snapshot), with the
  manifest validated against the partition directories actually on
  disk (``partition_exists``) — a manifest is trusted only as far as
  the storage agrees with it.

Crash model (per mutation path):

- FRESH build: table writes land before the snapshot commit; a crash
  leaves extra partition data that the next resume overwrites
  idempotently — the previous snapshot stays consistent.
- GROWN build: delta partitions are replaced by Spark's dynamic
  partition overwrite (staged, job-commit atomic).  A crash between a
  job commit and the snapshot commit can briefly expose newer rows
  under the old snapshot (e.g. boundary-shard postings containing
  not-yet-committed docs); re-running the build converges.  Real
  Iceberg closes this window with its atomic snapshot swap — this is
  the one place the parquet stand-in is weaker, by design.
- delete_docs (``rewrite_partitions``): partitions are swapped via
  rename with a ``_pending_rewrite`` marker on disk; each partition
  swap is atomic (same-fs rename).  A crash mid-swap leaves the marker;
  ``recover()`` — called automatically on snapshot reads — rolls every
  half-swapped partition back to its pre-delete state, and the
  delete is re-run (delete_docs is idempotent).  A crash after all
  swaps but before the snapshot commit leaves the delete visible
  early — acceptable for delete-by-query semantics.

On a real cluster, swap `_write`/`_read` for ``df.writeTo(...)`` on an
Iceberg catalog; build/query code stays.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class IndexCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        # DataFrame handles memoized per (spark app, table, snapshot):
        # re-creating spark.read.parquet(...) per query re-lists the
        # table's files and re-reads footers for schema inference —
        # pure per-query overhead for an immutable committed snapshot.
        # Invalidated on every write/commit.
        self._df_cache: dict[tuple[str, str, int], DataFrame] = {}

    # --- snapshot manifests --------------------------------------------

    def _snap_dir(self) -> str:
        d = os.path.join(self.root, "_snapshots")
        os.makedirs(d, exist_ok=True)
        return d

    def current_snapshot(self) -> dict[str, Any] | None:
        d = self._snap_dir()
        snaps = sorted(f for f in os.listdir(d) if f.startswith("snap-"))
        if not snaps:
            return None
        with open(os.path.join(d, snaps[-1])) as f:
            return json.load(f)

    def commit_snapshot(self, manifest: dict[str, Any]) -> str:
        self._df_cache.clear()
        prev = self.current_snapshot()
        seq = (prev["sequence"] + 1) if prev else 1
        manifest = dict(manifest)
        manifest["sequence"] = seq
        manifest["committed_at"] = time.time()
        path = os.path.join(self._snap_dir(), f"snap-{seq:06d}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, default=str)
        os.rename(tmp, path)
        return path

    def committed_shards(self) -> set[int]:
        snap = self.current_snapshot()
        if not snap:
            return set()
        return {int(s) for s in snap.get("shards", {})}

    # --- tables ----------------------------------------------------------

    def table_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def partition_path(self, name: str, shard: int) -> str:
        return os.path.join(self.table_path(name), f"shard={shard}")

    def partition_exists(self, name: str, shard: int) -> bool:
        return os.path.isdir(self.partition_path(name, shard))

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None,
              mode: str = "overwrite",
              options: dict[str, str] | None = None) -> None:
        """``mode='overwrite'`` replaces the whole table;
        ``mode='overwrite_partitions'`` replaces only the partitions
        present in ``df`` (Iceberg overwritePartitions analog);
        ``mode='append'`` appends.  ``options`` are parquet writer
        options (e.g. ``parquet.block.size`` for skip-friendly row
        groups on the postings table)."""
        self._df_cache.clear()
        if mode == "overwrite_partitions":
            w = df.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        else:
            w = df.write.mode(mode)
        for k, v in (options or {}).items():
            w = w.option(k, v)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.table_path(name))

    def _pending_path(self, name: str) -> str:
        return os.path.join(self.root, f"_pending_rewrite_{name}.json")

    def rewrite_partitions(
        self,
        df: DataFrame,
        name: str,
        shards: list[int],
        partition_by: str | list[str] = "shard",
        options: dict[str, str] | None = None,
    ) -> None:
        """Row-level rewrite of the given shard partitions (Iceberg
        ``DELETE WHERE`` analog): ``df`` holds the SURVIVING rows of
        exactly those partitions.  Written to a side directory first,
        then swapped in per partition — required because ``df`` usually
        reads from the same table (Spark cannot overwrite a path it is
        reading), and partitions that end up EMPTY must have their
        directories removed (dynamic overwrite would leave them stale).

        Crash-safe via a pending marker: each partition swap renames the
        committed directory to ``<dst>.old`` before moving the new one
        in, and the marker is removed only after every ``.old`` is
        cleaned up.  ``recover()`` rolls half-swapped partitions back."""
        self._df_cache.clear()
        parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        tmp = self.table_path(f"_{name}__rewrite")
        shutil.rmtree(tmp, ignore_errors=True)
        w = df.write.mode("overwrite")
        for k, v in (options or {}).items():
            w = w.option(k, v)
        w.partitionBy(*parts).parquet(tmp)
        marker = self._pending_path(name)
        with open(marker + ".tmp", "w") as f:
            json.dump({"shards": shards}, f)
        os.rename(marker + ".tmp", marker)
        for s in shards:  # the outer partition level must be the shard
            dst = self.partition_path(name, s)
            old = dst + ".old"
            shutil.rmtree(old, ignore_errors=True)
            if os.path.isdir(dst):
                os.rename(dst, old)
            src = os.path.join(tmp, f"{parts[0]}={s}")
            if os.path.isdir(src):
                shutil.move(src, dst)
            shutil.rmtree(old, ignore_errors=True)
        os.remove(marker)
        shutil.rmtree(tmp, ignore_errors=True)

    def recover(self) -> list[str]:
        """Roll back any rewrite that crashed mid-swap: for every
        pending marker, restore each partition whose ``.old`` directory
        survives (the swap for that partition did not complete — rename
        is atomic, so ``.old`` present means the OLD data is the safe
        copy unless the new directory fully arrived AND its ``.old``
        cleanup was the only step left; restoring old is always
        consistent with the still-current snapshot).  Returns the table
        names recovered."""
        recovered = []
        for f in os.listdir(self.root):
            if not (f.startswith("_pending_rewrite_") and f.endswith(".json")):
                continue
            name = f[len("_pending_rewrite_"):-len(".json")]
            with open(os.path.join(self.root, f)) as fh:
                shards = json.load(fh)["shards"]
            for s in shards:
                dst = self.partition_path(name, s)
                old = dst + ".old"
                if os.path.isdir(old):
                    shutil.rmtree(dst, ignore_errors=True)
                    os.rename(old, dst)
            shutil.rmtree(self.table_path(f"_{name}__rewrite"), ignore_errors=True)
            os.remove(os.path.join(self.root, f))
            recovered.append(name)
        return recovered

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.table_path(name))

    def read_snapshot(self, spark: SparkSession, name: str) -> DataFrame:
        """Like ``read`` but memoizes the DataFrame handle per committed
        snapshot — reuses the resolved file index across queries.  Use
        on the QUERY path only (between writes, ``read`` stays exact)."""
        snap = self.current_snapshot()
        key = (spark.sparkContext.applicationId, name,
               snap["sequence"] if snap else -1)
        df = self._df_cache.get(key)
        if df is None:
            if len(self._df_cache) > 16:
                self._df_cache.clear()
            df = self._df_cache[key] = self.read(spark, name)
        return df

    def exists(self, name: str) -> bool:
        p = self.table_path(name)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f.startswith(("shard=", "_SUCCESS"))
            for f in os.listdir(p)
        )

    def drop(self) -> None:
        if os.path.isdir(self.root):
            shutil.rmtree(self.root)
        os.makedirs(self.root, exist_ok=True)
