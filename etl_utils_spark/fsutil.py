"""Staged-promotion primitives for parquet directory "transactions".

One shared pattern everywhere the engine replaces a table in place
(finish_run's UPDATE, merge_write, foreachBatch CDC-apply, staging()):

1. write the new contents ONCE into a stage directory,
2. move the live directory ASIDE (never delete-before-replace),
3. promote the stage with a single rename,
4. drop the aside copy.

A crash at any step leaves either the old or the new table on disk;
``recover_dir`` (called by readers) restores the aside copy if the
crash hit between steps 2 and 3.

LIMITATION — local-POSIX only: ``os.rename`` is atomic on a local
filesystem but NOT on S3 (copy+delete) and only per-file on HDFS.  On
cluster deployments route these promotions through the platform's
committer (Hadoop FileSystem.rename, or a Delta/Iceberg transactional
REPLACE) — the call sites are the seam.
"""

from __future__ import annotations

import os
import shutil


def _aside(target: str) -> str:
    return target.rstrip("/") + ".__old__"


def promote_dir(stage: str, target: str) -> None:
    """Replace ``target`` with ``stage``, keeping a recoverable aside
    copy until the promote has landed."""
    old = _aside(target)
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(target):
        os.rename(target, old)
    os.rename(stage, target)
    shutil.rmtree(old, ignore_errors=True)


def recover_dir(target: str) -> None:
    """Restore the aside copy if a crash left no live directory."""
    old = _aside(target)
    if not os.path.isdir(target) and os.path.isdir(old):
        os.rename(old, target)
