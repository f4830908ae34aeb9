"""Versioned table snapshots with time-travel reads — a minimal
Delta-/Iceberg-shaped commit protocol over plain parquet directories.

Layout::

    <root>/v0/ v1/ ... vN/     immutable parquet snapshots
    <root>/_versions.json      the commit log (single JSON file)

Commit protocol (the same data-first/metadata-last ordering Delta's
transaction log uses):

1. write the snapshot's parquet into ``vN.__stage__``,
2. rename it to ``vN`` (data now durable but INVISIBLE),
3. atomically replace ``_versions.json`` with the new version appended
   (tmp file + ``os.replace``) — this single rename IS the commit.

A crash before step 3 leaves an orphan ``vN`` directory that no reader
ever sees (the manifest is the source of truth); the next writer
overwrites it.  Readers never lock: they read the manifest once and
then only immutable directories.

At 100 TB the same shape holds — snapshots are immutable directory
trees and the only mutation is one small metadata swap; on S3/HDFS the
``os.replace`` seam routes through a conditional-put / atomic-rename
committer (see fsutil's limitation note).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    """Append-only versioned parquet table with time-travel reads."""

    def __init__(self, root: str) -> None:
        self.root = root.rstrip("/")
        os.makedirs(self.root, exist_ok=True)

    # ------------------------------------------------------------- manifest
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_versions.json")

    def versions(self) -> list[int]:
        """Committed versions, oldest first (empty for a fresh store)."""
        try:
            with open(self._manifest_path) as f:
                return list(json.load(f)["versions"])
        except FileNotFoundError:
            return []

    def _commit(self, version: int) -> None:
        manifest = {"versions": self.versions() + [version]}
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path)  # the commit point

    # --------------------------------------------------------------- writes
    def _vdir(self, version: int) -> str:
        return os.path.join(self.root, f"v{version}")

    def write_version(self, df: DataFrame) -> int:
        """Write ``df`` as the next snapshot and commit it; returns the
        new version number."""
        version = (self.versions()[-1] + 1) if self.versions() else 0
        vdir = self._vdir(version)
        stage = vdir + ".__stage__"
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(vdir, ignore_errors=True)  # orphan from a prior crash
        df.write.mode("overwrite").parquet(stage)
        os.rename(stage, vdir)
        self._commit(version)
        return version

    # ---------------------------------------------------------------- reads
    def capture_dir(self, src_path: str) -> int:
        """Commit a byte-for-byte COPY of an existing parquet directory
        as the next snapshot version (no Spark job) and return its
        number — same stage/rename/manifest protocol as
        :meth:`write_version`, with the copy in place of df.write.
        The pre-image primitive QueryWrapper.manage_table uses for
        snapshot-backed rollback."""
        version = (self.versions()[-1] + 1) if self.versions() else 0
        vdir = self._vdir(version)
        stage = vdir + ".__stage__"
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(vdir, ignore_errors=True)  # orphan from a prior crash
        shutil.copytree(src_path, stage)
        os.rename(stage, vdir)
        self._commit(version)
        return version

    def read_version(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read a committed snapshot (default: latest)."""
        committed = self.versions()
        if not committed:
            raise ValueError(f"snapshot store {self.root!r} has no committed versions")
        if version is None:
            version = committed[-1]
        if version not in committed:
            raise ValueError(f"version {version} not committed (have {committed})")
        return spark.read.parquet(self._vdir(version))

    def expire(self, keep_last: int) -> list[int]:
        """Retention: drop all but the newest ``keep_last`` versions
        (metadata first — a crash after the manifest commit leaves
        orphan dirs that readers already cannot see; data dirs are
        deleted only after the new manifest is durable).  Returns the
        expired version numbers."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        committed = self.versions()
        expired, kept = committed[:-keep_last], committed[-keep_last:]
        if not expired:
            return []
        manifest = {"versions": kept}
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path)
        for v in expired:
            shutil.rmtree(self._vdir(v), ignore_errors=True)
        return expired

    def diff(self, spark: SparkSession, v_old: int, v_new: int) -> DataFrame:
        """Row-level diff between two snapshots: each row tagged
        'added' or 'removed' (multiset semantics via exceptAll)."""
        from pyspark.sql import functions as F

        old = self.read_version(spark, v_old)
        new = self.read_version(spark, v_new)
        added = new.exceptAll(old).withColumn("change", F.lit("added"))
        removed = old.exceptAll(new).withColumn("change", F.lit("removed"))
        return added.unionByName(removed)
