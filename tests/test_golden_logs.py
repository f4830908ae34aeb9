"""Golden log-table test (SURVEY.md §5.4): the flagship job's
job_log/job_details contents — timestamps nulled, ids normalized —
must match the checked-in golden snapshot. This is the reference's
screenshot-as-golden-output verification, made executable."""

from __future__ import annotations

import csv
from pathlib import Path

from etl_utils_spark.flagship import flagship_job
from etl_utils_spark.logtables import STATUS_OK, LogTables

GOLDEN = Path(__file__).parent / "golden" / "flagship_details.csv"


def test_flagship_logs_match_golden(spark, sf_dir, tmp_path):
    log_dir = str(tmp_path / "golden_logs")
    flagship_job(spark, sf_dir, log_dir=log_dir)
    lt = LogTables(spark, log_dir)

    log = lt.job_log().collect()
    assert len(log) == 1
    assert log[0].status == STATUS_OK
    assert log[0].start_time is not None and log[0].end_time is not None

    details = lt.job_details().orderBy("detail_id").collect()
    got = [
        (i, r.log_level, r.log_message, "" if r.rowcount is None else str(int(r.rowcount)))
        for i, r in enumerate(details)
    ]
    with open(GOLDEN, newline="") as f:
        expected = [
            (int(row["seq"]), row["log_level"], row["log_message"], row["rowcount"])
            for row in csv.DictReader(f)
        ]
    assert got == expected
