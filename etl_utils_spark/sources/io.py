"""Source/sink formats: parquet, CSV, JSON-lines, ORC — uniform
read/write with explicit schemas and partitioned writes.

Scale rules encoded here:
- reads take an explicit schema (schema inference = an extra full scan
  at 100 TB; never default to it);
- writes support partitionBy for date/key layout so downstream scans
  partition-prune;
- CSV/JSON are interchange formats — columnar (parquet/ORC) is the
  engine's native storage; the API makes that the path of least
  resistance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "csv", "json")


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {FORMATS}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(
            f"{fmt} reads require an explicit schema: inference would "
            "full-scan the input"
        )
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)


def write_any(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "error",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {FORMATS}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).save(path)
