"""Streaming window operators over the events schema.

Each builder takes a (possibly streaming) events DataFrame with columns
(event_id, ts, user_id, event_type, value, props) and returns the
transformed DataFrame; ``run_stream_to_batch`` executes a streaming
pipeline to completion (Trigger.AvailableNow) into a memory sink and
returns the final result as a batch DataFrame — which is how the
correctness harness hash-checks STREAMING execution against the same
DuckDB oracle as the batch analog.

Scale posture: all aggregations are keyed by (window, type) or
session_window — state per key is O(1); watermarks bound state size;
AvailableNow is the batch-backfill trigger a production pipeline would
use for reprocessing.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open the events fixture as a file-source stream with the same
    timestamp normalization as the batch loader (sources/tables.py).

    The file source requires a user-supplied schema, and the fixture's
    on-disk ``ts`` flavor has varied across driver rounds
    (TIMESTAMP(NANOS) → long under nanosAsLong; naive micros → NTZ;
    tz-adjusted micros → TIMESTAMP). Peek at the batch reader's
    inferred schema (one footer read, no data scan) and declare the
    stream schema to match, then normalize ``ts`` to TIMESTAMP.
    """
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events_path = os.path.join(sf_dir, "events.parquet")
    on_disk = spark.read.parquet(events_path).schema
    if os.path.isdir(events_path):
        # directory-style parquet (derived scale-up dirs): stream the
        # table directory itself — a pathGlobFilter on the parent would
        # match no FILE and silently yield zero rows
        raw = spark.readStream.schema(on_disk).parquet(events_path)
    else:
        # the file source requires a directory: stream the fixture dir
        # with a glob filter selecting only the events file
        raw = (
            spark.readStream.schema(on_disk)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    ts_type = dict((f.name, f.dataType.simpleString()) for f in on_disk.fields)["ts"]
    if ts_type == "bigint":  # TIMESTAMP(NANOS) read as long
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":  # naive micros; session tz is UTC
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw.select("event_id", "ts", "user_id", "event_type", "value", "props")


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """C10a: tumbling-window count/sum per event_type."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "sum_value")
    )


def sliding_counts(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """C10b: sliding-window event counts."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_window_stats(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """C10c: native session windows per user."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def with_watermark(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """C10d: bound lateness/state (no-op on batch frames)."""
    return events.withWatermark("ts", delay) if events.isStreaming else events


def dedup_within_watermark(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """C10e: stateful stream dedup on event_id within the watermark."""
    w = with_watermark(events, delay)
    if events.isStreaming:
        return w.dropDuplicatesWithinWatermark(["event_id"])
    return w.dropDuplicates(["event_id"])


def stream_shuffle_partitions(
    spark: SparkSession, python_stateful: bool = False
) -> str:
    """Shuffle/state-store partition count for harness stream runs.

    Every stateful streaming operator keeps one state store per shuffle
    partition, and each store pays a fixed open/delta-file/commit cost
    PER MICRO-BATCH regardless of data volume — on these AvailableNow
    memory-sink harness runs that fixed cost dwarfs the data (guide
    §2.2: fewer, larger partitions; r12 A/B: 8 stores → 2 saved
    0.3-1.0s per JVM-stateful live query at sf0.1, results identical).

    ``python_stateful`` marks applyInPandasWithState pipelines, where
    the binding resource is Python WORKER parallelism, not store count
    (guide §4: the per-key pandas boundary is the cost): the r12 sweep
    measured 2 partitions 1.4-2.3× SLOWER than 8 for cusum/ewma/funnel,
    with 8 ≈ 16 best at 32 cores — so those get defaultParallelism/4.

    Both defaults scale with the cluster rather than pinning a local
    constant; a production continuous stream sizes state partitions to
    its key cardinality via ``SPARK_GRAFT_STREAM_PARTS``, which
    overrides both."""
    import os

    v = os.environ.get("SPARK_GRAFT_STREAM_PARTS")
    if v:
        return v
    dp = spark.sparkContext.defaultParallelism
    if python_stateful:
        return str(max(4, dp // 4))
    return str(max(2, dp // 16))


def run_stream_to_batch(
    spark: SparkSession,
    stream_df: DataFrame,
    output_mode: str = "complete",
    python_stateful: bool = False,
) -> DataFrame:
    """Execute a streaming DataFrame to completion (AvailableNow) into
    a memory sink; return the sink contents as a batch DataFrame.

    The stream runs with a LOW shuffle-partition count — see
    ``stream_shuffle_partitions`` for the sizing rationale and the
    production override."""
    name = f"sink_{uuid.uuid4().hex[:12]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        stream_shuffle_partitions(spark, python_stateful=python_stateful),
    )
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout=300)
        finally:
            if q.isActive:
                q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(name)
