"""Upsert (MERGE) and SCD2 history operators.

Spark without a transactional table format has no MERGE INTO statement
over parquet; the engine provides the same semantics as composable
DataFrame transforms plus an overwrite-write helper:

- ``merge_upsert`` — the MERGE result as a pure transformation
  (matched → update, not-matched → insert), so it can be oracle-checked
  and composed; ``merge_write`` materializes it with an atomic
  staged overwrite.
- ``scd2_intervals`` — slowly-changing-dimension type-2 validity
  intervals from a change stream (lead() over the entity timeline).

On Delta/Iceberg deployments ``merge_write`` maps 1:1 onto MERGE INTO;
the transformation shape (and its tests) stay identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """MERGE semantics: source rows replace matching target rows
    (whole-row update), unmatched source rows are inserted, unmatched
    target rows are kept. Both sides must share a schema.

    Implementation: unionByName with a precedence tag + one window —
    a single shuffle on the key, no full-outer join row-widening."""
    if set(target.columns) != set(source.columns):
        raise ValueError("merge_upsert requires identical schemas")
    tagged = target.withColumn("_prec", F.lit(0)).unionByName(
        source.withColumn("_prec", F.lit(1))
    )
    w = Window.partitionBy(key).orderBy(F.desc("_prec"))
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_prec", "_rn")
    )


def merge_write(target_path: str, source: DataFrame, key: str, fmt: str = "parquet") -> None:
    """Materialized MERGE: read target, merge, write ONCE to a stage
    directory, promote with a recoverable rename (fsutil.promote_dir —
    no second Spark job, no leftover tmp dir, crash leaves old or new
    table intact; Delta/Iceberg replace this with a real MERGE INTO)."""
    from etl_utils_spark.fsutil import promote_dir, recover_dir

    spark = source.sparkSession
    recover_dir(target_path)
    target = spark.read.format(fmt).load(target_path)
    merged = merge_upsert(target, source, key)
    stage = target_path.rstrip("/") + ".__merge_stage__"
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    merged.write.format(fmt).mode("overwrite").save(stage)
    promote_dir(stage, target_path)


def scd2_intervals(
    changes: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """SCD2: turn a change stream (key, ts, attrs) into validity
    intervals [valid_from, valid_to) with an is_current flag — lead()
    over the per-entity timeline; one shuffle on the key.

    Consecutive rows with identical attrs are collapsed first (a
    change stream often re-states values)."""
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    attr_struct = F.struct(*[F.col(c) for c in attr_cols])
    dedup = (
        changes.withColumn("_prev", F.lag(attr_struct).over(w))
        .filter(F.col("_prev").isNull() | (attr_struct != F.col("_prev")))
        .drop("_prev")
    )
    w2 = Window.partitionBy(key).orderBy(*order)
    return (
        dedup.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(key, *attr_cols, "valid_from", "valid_to", "is_current")
    )
