"""Crash-safety of the finish_run directory swap: a process death at
any point must leave job_log readable with either the old or the new
contents — never empty, never half-written (r1's read-modify-overwrite
had a deleted-but-not-yet-rewritten window)."""

from __future__ import annotations

import os

from etl_utils_spark.logtables import STATUS_OK, STATUS_RUNNING, LogTables


def _mk(spark, tmp_path, n_runs=3):
    lt = LogTables(spark, str(tmp_path))
    for i in range(n_runs):
        rid = lt.register_run(f"job_{i}")
        assert rid == i + 1
    return lt


def test_finish_updates_single_row(spark, tmp_path):
    lt = _mk(spark, tmp_path)
    lt.finish_run(2, ok=True)
    rows = {r.run_id: r for r in lt.job_log().collect()}
    assert len(rows) == 3
    assert rows[2].status == STATUS_OK and rows[2].end_time is not None
    assert rows[1].status == STATUS_RUNNING and rows[1].end_time is None


def test_crash_between_renames_recovers(spark, tmp_path):
    """Simulate dying after 'move live aside' but before 'promote
    stage': the reader must restore the aside copy."""
    lt = _mk(spark, tmp_path)
    os.rename(lt.job_log_path, lt.job_log_path + ".__old__")
    assert not os.path.isdir(lt.job_log_path)
    rows = lt.job_log().collect()
    assert len(rows) == 3
    assert os.path.isdir(lt.job_log_path)


def test_crash_mid_stage_write_is_invisible(spark, tmp_path):
    """A dot-prefixed temp file from a crashed append must not be read
    (and must not break reads)."""
    lt = _mk(spark, tmp_path)
    junk = os.path.join(lt.job_log_path, ".part-deadbeef.parquet.tmp")
    with open(junk, "wb") as f:
        f.write(b"not parquet at all")
    rows = lt.job_log().collect()
    assert len(rows) == 3


def test_recovery_then_finish_is_consistent(spark, tmp_path):
    lt = _mk(spark, tmp_path)
    os.rename(lt.job_log_path, lt.job_log_path + ".__old__")
    lt.finish_run(1, ok=False)
    rows = {r.run_id: r.status for r in lt.job_log().collect()}
    assert rows[1] == "FINISHED WITH ERROR"
    assert len(rows) == 3
