"""Source/sink round-trips across formats + partitioned-write pruning."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_utils_spark.plans import formatted_plan
from etl_utils_spark.sources.io import FORMATS, read_any, write_any
from etl_utils_spark.sources.tables import load_table


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip_formats(spark, sf_dir, tmp_path, fmt):
    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / f"rt_{fmt}")
    write_any(src, path, fmt=fmt)
    back = read_any(spark, path, fmt=fmt, schema=src.schema)
    assert sorted(tuple(r) for r in back.collect()) == sorted(tuple(r) for r in src.collect())


def test_inference_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_any(spark, str(tmp_path), fmt="csv")


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """A partitionBy(date-derived) layout must let a filtered scan
    prune partitions: the PartitionFilters entry carries the predicate."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    write_any(orders, path, fmt="parquet", partition_by=["order_year"])
    back = spark.read.parquet(path).filter(F.col("order_year") == 1997)
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan and "order_year" in plan.split("PartitionFilters", 1)[1][:200]
    expected = orders.filter(F.col("order_year") == 1997).count()
    assert back.count() == expected


def test_compact_dir_preserves_rows_and_shrinks_files(spark, tmp_path):
    from etl_utils_spark.sources.maintenance import compact_dir, file_count

    path = str(tmp_path / "t")
    df = spark.range(0, 10000).withColumnRenamed("id", "k")
    df.repartition(16).write.parquet(path)
    assert file_count(path) >= 16
    n = compact_dir(spark, path, target_files=2)
    assert n <= 2
    back = spark.read.parquet(path)
    assert back.count() == 10000
    assert back.agg({"k": "sum"}).collect()[0][0] == 10000 * 9999 // 2


def test_compact_dir_cluster_by_recluster(spark, tmp_path):
    from etl_utils_spark.sources.maintenance import compact_dir

    path = str(tmp_path / "t")
    df = spark.range(0, 1000).selectExpr("id % 7 AS k", "id AS v")
    df.repartition(8).write.parquet(path)
    compact_dir(spark, path, target_files=3, cluster_by=["k"])
    back = spark.read.parquet(path)
    assert back.count() == 1000
    # every key lives in exactly one file after re-clustering
    import pyspark.sql.functions as F

    per_key = (
        back.withColumn("f", F.input_file_name())
        .groupBy("k")
        .agg(F.countDistinct("f").alias("nf"))
    )
    assert per_key.agg(F.max("nf")).collect()[0][0] == 1


def test_csvdir_sink_two_phase_commit(spark, tmp_path):
    """The custom Python Data Source writer must leave ONLY committed
    part files plus the _SUCCESS manifest (with the exact row total) —
    nothing staged."""
    import os

    from etl_utils_spark.sources import pyds

    pyds.register(spark)
    pyds.register_sink(spark)
    out = str(tmp_path / "csvdir_out")
    df = (
        spark.read.format("synthlog")
        .option("rows", "1000")
        .option("partitions", "4")
        .load()
    )
    df.write.format("csvdir").option("path", out).mode("append").save()
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert f.read() == "1000"
    parts = [p for p in os.listdir(out) if p.startswith("part-")]
    assert len(parts) == 4
    staged = os.listdir(os.path.join(out, "_staging"))
    assert staged == []
    n_lines = sum(
        sum(1 for _ in open(os.path.join(out, p))) for p in parts
    )
    assert n_lines == 1000
