"""Snapshot-manifest table catalog — Iceberg-shaped storage on parquet.

The production design targets Iceberg tables (`documents` partitioned
by days(warc_ts); `postings`/`doc_stats`/`term_stats` partitioned by
shard) with snapshot-based resumability.  The sandbox has no Iceberg
runtime jars and no network, so this module provides the same contract
over parquet directories + JSON snapshot manifests:

- atomic-ish commits (write to ``_tmp`` then rename),
- per-shard lineage + build metrics in each snapshot (north rule:
  "resumable from checkpoint with per-partition lineage + metrics"),
- resume = diff (wanted shards) − (shards in current snapshot).

On a real cluster, swap `_write`/`_read` for ``df.writeTo(...)`` on an
Iceberg catalog; the build/query code does not change.
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

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None,
              mode: str = "overwrite") -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.table_path(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.table_path(name))

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
