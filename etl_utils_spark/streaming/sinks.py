"""Streaming sinks: checkpointed file sinks and the foreachBatch
upsert pattern.

- ``to_parquet_sink`` — append-mode parquet file sink with a
  checkpoint: exactly-once per file-commit, the standard landing-zone
  topology.
- ``foreach_batch_merge`` — per-micro-batch MERGE into a dimension
  table (streaming upsert): the canonical CDC-apply pattern; each
  micro-batch reuses the engine's batch merge_upsert, so streaming
  and batch mutation semantics are one code path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etl_utils_spark.operators.upsert import merge_upsert


def to_parquet_sink(
    stream_df: DataFrame, path: str, checkpoint: str, available_now: bool = True
):
    """Write a stream to a parquet directory sink; returns the started
    query (caller awaits)."""
    w = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def foreach_batch_merge(
    stream_df: DataFrame,
    target_path: str,
    key: str,
    checkpoint: str,
    available_now: bool = True,
    order_cols: list[str] | None = None,
):
    """Apply each micro-batch as a MERGE into ``target_path``.

    The batch function deduplicates the micro-batch on the key first so
    the merge input is key-unique.  With ``order_cols`` the winner per
    key is the row with the MAXIMUM order tuple (deterministic
    last-writer-wins — what a CDC apply wants); without it the pick is
    arbitrary (Spark dropDuplicates)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        import os
        import shutil

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from etl_utils_spark.fsutil import promote_dir, recover_dir

        spark = batch_df.sparkSession
        if order_cols:
            w = Window.partitionBy(key).orderBy(*[F.desc(c) for c in order_cols])
            src = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            src = batch_df.dropDuplicates([key])
        recover_dir(target_path)
        if not os.path.isdir(target_path) or not any(
            f.endswith(".parquet") for f in os.listdir(target_path)
        ):
            src.write.mode("overwrite").parquet(target_path)
            return
        target = spark.read.parquet(target_path)
        merged = merge_upsert(target, src.select(*target.columns), key)
        # ONE write into a single reused stage dir, then a recoverable
        # rename-promote — r1 left one full table copy behind per
        # micro-batch and paid a second Spark job re-writing the target.
        stage = target_path.rstrip("/") + ".__merge_stage__"
        shutil.rmtree(stage, ignore_errors=True)
        merged.write.mode("overwrite").parquet(stage)
        promote_dir(stage, target_path)

    w = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
