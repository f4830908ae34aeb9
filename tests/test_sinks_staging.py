"""Streaming sinks (parquet, foreachBatch merge) + staging rollback."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_utils_spark.sources.tables import load_table
from etl_utils_spark.streaming import windows as W
from etl_utils_spark.streaming.sinks import foreach_batch_merge, to_parquet_sink
from etl_utils_spark.wrapper import QueryWrapper


def test_parquet_sink_roundtrip(spark, sf_dir, tmp_path):
    s = W.read_events_stream(spark, sf_dir).select("event_id", "user_id", "value")
    q = to_parquet_sink(s, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q.awaitTermination(timeout=120)
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == load_table(spark, sf_dir, "events").count()


def test_foreach_batch_merge_applies_upserts(spark, sf_dir, tmp_path):
    target = str(tmp_path / "dim_users")
    # seed the dimension with zeroed values
    load_table(spark, sf_dir, "events").select("user_id").distinct().withColumn(
        "value", F.lit(-1.0)
    ).withColumn("event_id", F.lit(-1).cast("long")).select(
        "event_id", "user_id", "value"
    ).write.parquet(target)

    s = W.read_events_stream(spark, sf_dir).select("event_id", "user_id", "value")
    # one row per user per micro-batch: dedup inside the sink
    q = foreach_batch_merge(
        s.withColumn("event_id", F.col("user_id")),  # key-stable ids
        target,
        key="user_id",
        checkpoint=str(tmp_path / "ckpt2"),
    )
    q.awaitTermination(timeout=120)
    got = spark.read.parquet(target)
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert got.count() == n_users
    # every user's value was upserted away from the seed value
    assert got.filter(F.col("value") == -1.0).count() == 0


def test_staging_promotes_on_success(spark, tmp_path):
    w = QueryWrapper(spark, script_name="staging_ok")
    target = str(tmp_path / "t_ok")
    with w.staging(target) as stage:
        spark.range(5).write.parquet(stage)
    assert spark.read.parquet(target).count() == 5
    # second run replaces
    with w.staging(target) as stage:
        spark.range(7).write.parquet(stage)
    assert spark.read.parquet(target).count() == 7


def test_staging_discards_on_error(spark, tmp_path):
    w = QueryWrapper(spark, script_name="staging_err")
    target = str(tmp_path / "t_err")
    with w.staging(target) as stage:
        spark.range(5).write.parquet(stage)
    with pytest.raises(RuntimeError, match="boom"):
        with w.staging(target) as stage:
            spark.range(100).write.parquet(stage)
            raise RuntimeError("boom")
    # target untouched by the failed transaction
    assert spark.read.parquet(target).count() == 5
