"""Table maintenance: small-file compaction.

The 100 TB operational reality: streaming sinks and incremental jobs
leave thousands of KB-sized parquet files per partition; scans then
pay one task + one footer-read per file and lose run-length locality.
Compaction rewrites a directory to a target file count and promotes
the rewrite atomically (fsutil staged swap — readers see old or new,
never a mix).

``target_files`` sizing rule: total_bytes / 128 MB (one HDFS-ish block
per file).  ``coalesce`` is used rather than ``repartition`` when
shrinking — it avoids a full shuffle (task-merge only); an explicit
``repartition(cols)`` path exists for when the rewrite should also
re-cluster by key.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

from etl_utils_spark import fsutil


def file_count(path: str) -> int:
    return len(glob.glob(os.path.join(path, "*.parquet")))


def compact_dir(
    spark: SparkSession,
    path: str,
    target_files: int,
    cluster_by: list[str] | None = None,
) -> int:
    """Rewrite the parquet directory at ``path`` into ``target_files``
    files (optionally re-clustered by ``cluster_by``), atomically
    promoting the rewrite.  Returns the new file count."""
    df: DataFrame = spark.read.parquet(path)
    if cluster_by:
        df = df.repartition(target_files, *cluster_by)
    else:
        df = df.coalesce(target_files)
    stage = path.rstrip("/") + ".__compact__"
    df.write.mode("overwrite").parquet(stage)
    fsutil.promote_dir(stage, path)
    return file_count(path)
