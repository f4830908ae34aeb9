"""SnapshotStore: commit protocol, time travel, diff, crash orphans."""

from __future__ import annotations

import os
import tempfile

from etl_utils_spark.operators.snapshot import SnapshotStore


def _store() -> SnapshotStore:
    return SnapshotStore(tempfile.mkdtemp(prefix="snapstore_") + "/t")


def test_versions_and_time_travel(spark):
    s = _store()
    df0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df1 = spark.createDataFrame([(1, "a"), (3, "c")], "id long, v string")
    assert s.versions() == []
    assert s.write_version(df0) == 0
    assert s.write_version(df1) == 1
    assert s.versions() == [0, 1]
    # latest is v1; v0 unchanged by the later commit
    assert {r.id for r in s.read_version(spark).collect()} == {1, 3}
    assert {r.id for r in s.read_version(spark, 0).collect()} == {1, 2}


def test_diff_between_versions(spark):
    s = _store()
    s.write_version(spark.createDataFrame([(1,), (2,), (2,)], "id long"))
    s.write_version(spark.createDataFrame([(2,), (3,)], "id long"))
    got = sorted((r.id, r.change) for r in s.diff(spark, 0, 1).collect())
    # multiset semantics: one of the duplicate 2s was removed
    assert got == [(1, "removed"), (2, "removed"), (3, "added")]


def test_uncommitted_orphan_is_invisible(spark):
    """A crash after the data rename but before the manifest commit
    leaves an orphan vN that readers never see and the next writer
    replaces."""
    s = _store()
    s.write_version(spark.createDataFrame([(1,)], "id long"))
    # simulate the crash: v1 data lands, manifest never updated
    spark.createDataFrame([(99,)], "id long").write.parquet(s._vdir(1))
    assert s.versions() == [0]
    assert [r.id for r in s.read_version(spark).collect()] == [1]
    # next commit overwrites the orphan and becomes the real v1
    s.write_version(spark.createDataFrame([(2,)], "id long"))
    assert s.versions() == [0, 1]
    assert [r.id for r in s.read_version(spark).collect()] == [2]


def test_read_errors(spark):
    s = _store()
    try:
        s.read_version(spark)
        raise AssertionError("expected ValueError on empty store")
    except ValueError:
        pass
    s.write_version(spark.createDataFrame([(1,)], "id long"))
    try:
        s.read_version(spark, 7)
        raise AssertionError("expected ValueError on unknown version")
    except ValueError:
        pass
    assert os.path.isdir(s._vdir(0))


def test_expire_keeps_newest_and_next_write_continues_numbering(spark):
    s = _store()
    for v in range(4):
        s.write_version(spark.createDataFrame([(v,)], "id long"))
    assert s.expire(keep_last=2) == [0, 1]
    assert s.versions() == [2, 3]
    assert not os.path.isdir(s._vdir(0)) and not os.path.isdir(s._vdir(1))
    assert [r.id for r in s.read_version(spark, 2).collect()] == [2]
    # numbering continues after the retained tail
    assert s.write_version(spark.createDataFrame([(9,)], "id long")) == 4
    assert s.versions() == [2, 3, 4]
    assert s.expire(keep_last=5) == []


def test_foreachbatch_commits_snapshot_versions(spark, sf_dir):
    """Streaming → versioned-table integration: each micro-batch lands
    as one committed snapshot version (the CDC-history pattern: time
    travel across ingest batches)."""
    from etl_utils_spark.sources.tables import load_table
    from etl_utils_spark.streaming import windows as W

    s = _store()
    stream = W.read_events_stream(spark, sf_dir).select("event_id", "user_id", "value")
    q = (
        stream.writeStream.foreachBatch(lambda df, bid: s.write_version(df))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="snap_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    assert s.versions(), "no snapshot version committed"
    total = sum(
        s.read_version(spark, v).count() for v in s.versions()
    )
    assert total == load_table(spark, sf_dir, "events").count()
