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
