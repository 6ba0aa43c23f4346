"""Versioned parquet table: the lakehouse commit primitive (snapshot
directories + an atomically swapped pointer) built on plain parquet —
snapshot isolation, time travel, and TRANSACTIONAL MERGE without a
Delta/Iceberg runtime in the environment.

Layout:

    table_root/
      v=0/ ... v=N/     immutable snapshot directories (parquet)
      _latest           one-line pointer file: the committed version

Commit protocol (the same shape Delta's _delta_log append and
Iceberg's metadata swap provide, coarser-grained):

1. the new snapshot is fully written to ``v=N+1/`` — readers keep
   resolving ``_latest`` → ``v=N`` and never see partial files;
2. the pointer is swapped via write-temp + ``os.replace`` (atomic on
   POSIX): a crash before the swap leaves an orphan directory (cleaned
   by ``vacuum``), never a torn table;
3. old snapshots stay readable (``version=``) until vacuumed — time
   travel and long-running readers get a consistent snapshot for free.

MERGE (``merge_commit``) = etl.pipeline.merge_upsert's full-outer
join (the exact join Delta MERGE executes) + a snapshot commit, so
the reference's ON CONFLICT upsert (etl_sync.py:250-254) becomes an
atomic table-version transition instead of an in-place overwrite.

At 100 TB: per-version full rewrite is the plain-parquet cost model
(documented in SCALE.md); the COMMIT primitive is unchanged — on
Delta/Iceberg only steps 1-2 shrink to file-group/metadata scope.
Reading resolves one tiny pointer file driver-side; everything else
is a normal pruned parquet scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from epl_cas_etl_2026_spark.etl.pipeline import merge_upsert


class VersionedTable:
    def __init__(self, root: str):
        self.root = root

    # -- pointer ------------------------------------------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.root, "_latest")

    def latest_version(self) -> int | None:
        try:
            with open(self._pointer_path()) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return None

    def _swap_pointer(self, version: int) -> None:
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._pointer_path())  # atomic on POSIX

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.root, f"v={version}")

    # -- read ---------------------------------------------------------------
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Latest committed snapshot, or time-travel to ``version``."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"versioned table {self.root}: no commits")
        committed = self.latest_version()
        if version is not None and (committed is None or version > committed):
            raise ValueError(f"version {version} not committed (latest {committed})")
        return spark.read.parquet(self._version_dir(v))

    # -- write --------------------------------------------------------------
    def commit(self, df: DataFrame) -> int:
        """Write ``df`` as the next snapshot, then swap the pointer.
        Readers resolve the pointer BEFORE the swap or AFTER — never a
        half-written directory."""
        current = self.latest_version()
        new = 0 if current is None else current + 1
        os.makedirs(self.root, exist_ok=True)
        df.write.mode("overwrite").parquet(self._version_dir(new))
        self._swap_pointer(new)
        return new

    def merge_commit(self, updates: DataFrame, key: str, spark: SparkSession) -> int:
        """Transactional MERGE: full-outer upsert against the latest
        snapshot, committed as a NEW version. Concurrent readers of the
        old pointer keep their snapshot (isolation); a failure before
        the pointer swap leaves the table at the old version."""
        current = self.latest_version()
        if current is None:
            return self.commit(updates)
        merged = merge_upsert(self.read(spark), updates, key)
        # materialize the join BEFORE the write job starts overwriting
        # anything — read-your-own-writes safety, same reason
        # etl.pipeline.sync_job pins batches via localCheckpoint
        return self.commit(merged.localCheckpoint())

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop snapshots older than the newest ``keep_last`` (plus any
        orphan directories beyond the pointer from failed commits).
        Returns removed versions."""
        import shutil

        committed = self.latest_version()
        if committed is None:
            return []
        removed = []
        for name in sorted(os.listdir(self.root)):
            if not name.startswith("v="):
                continue
            v = int(name[2:])
            if v <= committed - keep_last or v > committed:
                shutil.rmtree(os.path.join(self.root, name))
                removed.append(v)
        return sorted(removed)
