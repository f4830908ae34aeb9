"""MERGE/upsert + SCD2 operator invariants, including the materialized
merge_write path."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_utils_spark.operators.upsert import merge_upsert, merge_write, scd2_intervals
from etl_utils_spark.sources.tables import load_table


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, name string, v double"
    )
    source = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], "k int, name string, v double"
    )
    got = sorted(tuple(r) for r in merge_upsert(target, source, "k").collect())
    assert got == [(1, "a", 10.0), (2, "b2", 99.0), (3, "c", 30.0), (4, "d", 40.0)]


def test_merge_write_roundtrip(spark, tmp_path):
    path = str(tmp_path / "dim")
    spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string").write.parquet(path)
    src = spark.createDataFrame([(2, "y2"), (3, "z")], "k int, v string")
    merge_write(path, src, "k")
    got = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert got == [(1, "x"), (2, "y2"), (3, "z")]
    # idempotent re-merge
    merge_write(path, src, "k")
    assert sorted(tuple(r) for r in spark.read.parquet(path).collect()) == got


def test_scd2_intervals_laws(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    iv = scd2_intervals(
        e, key="user_id", ts_col="ts", attr_cols=["event_type"], tiebreak="event_id"
    )
    rows = sorted(iv.collect(), key=lambda r: (r.user_id, r.valid_from))
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, ivs in by_user.items():
        # exactly one current interval, at the end
        assert sum(1 for r in ivs if r.is_current) == 1
        assert ivs[-1].is_current and ivs[-1].valid_to is None
        # contiguous, non-overlapping, no consecutive same-attr rows
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from
            assert a.event_type != b.event_type
