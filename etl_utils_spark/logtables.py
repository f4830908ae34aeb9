"""Persistent job-log tables (job_log / job_details).

Schemas mirror the reference DDL (query_wrapper.sql:4-19):
job_log is one row per run, job_details one row per log message.

Storage: Parquet directories under a base path, written driver-side
with pyarrow (the tables are metadata-scale — one row per run / per
message — so a Spark job per write is pure overhead even on a
1000-executor cluster; Spark only ever READS them as DataFrames).
Appends publish one file via atomic rename; the single UPDATE the
reference performs (finish → status/end_time, query_wrapper.sql:168-175)
is a single-write recoverable directory swap (see finish_run). On a
deployment with Delta Lake the same class would use a Delta ``UPDATE``
and identity columns.

run_id allocation: max(run_id)+1 under a per-log-dir POSIX flock
(_writer_lock) — the reference closes the same race with an early
COMMIT (query_wrapper.sql:246-283); here the lock serializes every
writer (register_run / finish_run / append_details) and the reader's
crash-recovery rename, so concurrent jobs get unique monotonic ids
(tests/test_logtables_concurrent.py).  Local-FS only; on HDFS/S3 the
seam is the platform lock service or conditional-put.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import uuid
from decimal import Decimal

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

JOB_LOG_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.LongType(), False),
        T.StructField("script_name", T.StringType(), False),
        T.StructField("status", T.StringType(), True),
        T.StructField("start_time", T.TimestampType(), True),
        T.StructField("end_time", T.TimestampType(), True),
    ]
)

JOB_DETAILS_SCHEMA = T.StructType(
    [
        T.StructField("detail_id", T.LongType(), False),
        T.StructField("run_id", T.LongType(), False),
        T.StructField("log_time", T.TimestampType(), True),
        T.StructField("log_level", T.StringType(), True),
        T.StructField("log_message", T.StringType(), True),
        T.StructField("rowcount", T.DecimalType(18, 0), True),
    ]
)

STATUS_RUNNING = "RUNNING"
STATUS_OK = "FINISHED SUCCESSFULLY"
STATUS_ERROR = "FINISHED WITH ERROR"

# Arrow twins of the Spark schemas — the log tables are metadata-scale
# (one row per run / per message), so all writes happen driver-side via
# pyarrow: a single parquet file per flush, no Spark job launch, and
# published atomically (write hidden ".name.tmp", os.replace to final —
# Spark and our reader both ignore dot-prefixed files, so a crash
# mid-write never corrupts the table).
_PA_JOB_LOG = pa.schema(
    [
        pa.field("run_id", pa.int64(), nullable=False),
        pa.field("script_name", pa.string(), nullable=False),
        pa.field("status", pa.string()),
        pa.field("start_time", pa.timestamp("us")),
        pa.field("end_time", pa.timestamp("us")),
    ]
)

_PA_JOB_DETAILS = pa.schema(
    [
        pa.field("detail_id", pa.int64(), nullable=False),
        pa.field("run_id", pa.int64(), nullable=False),
        pa.field("log_time", pa.timestamp("us")),
        pa.field("log_level", pa.string()),
        pa.field("log_message", pa.string()),
        pa.field("rowcount", pa.decimal128(18, 0)),
    ]
)


def _publish_file(dir_path: str, table: pa.Table) -> None:
    """Append one parquet file to ``dir_path`` atomically: write under a
    dot-prefixed temp name (invisible to readers), then os.replace to
    the final name — a single filesystem rename."""
    os.makedirs(dir_path, exist_ok=True)
    name = f"part-{uuid.uuid4().hex}.parquet"
    tmp = os.path.join(dir_path, "." + name + ".tmp")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(dir_path, name))


def _read_arrow(dir_path: str, schema: pa.Schema) -> pa.Table:
    files = (
        [
            os.path.join(dir_path, f)
            for f in os.listdir(dir_path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        if os.path.isdir(dir_path)
        else []
    )
    if not files:
        return schema.empty_table()
    return pa.concat_tables(pq.read_table(f, schema=schema) for f in files)


class LogTables:
    """Parquet-backed job_log / job_details pair."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        self.job_log_path = os.path.join(base_dir, "job_log")
        self.job_details_path = os.path.join(base_dir, "job_details")

    def _writer_lock(self):
        """Serialize log-table writers across PROCESSES.

        The reference tolerates concurrent runs by COMMITting the
        run-id insert early (query_wrapper.sql:277-282); this engine's
        max+1 read-modify-write needs the equivalent mutual exclusion,
        provided here by one POSIX advisory flock per log directory —
        register_run / finish_run / append_details all take it, so
        concurrent jobs get unique monotonic run ids and no writer can
        overwrite another's insert during finish_run's table rewrite
        (tests/test_logtables_concurrent.py pins 8-process behavior).
        Local-FS deployments only; on HDFS/S3 the seam is the
        platform's lock service or conditional-put."""
        import fcntl
        from contextlib import contextmanager

        @contextmanager
        def _ctx():
            os.makedirs(self.base_dir, exist_ok=True)
            with open(os.path.join(self.base_dir, ".writer.lock"), "w") as fh:
                fcntl.flock(fh, fcntl.LOCK_EX)
                try:
                    yield
                finally:
                    fcntl.flock(fh, fcntl.LOCK_UN)

        return _ctx()

    # ------------------------------------------------------------ reads

    def _recover(self, path: str, have_lock: bool = False) -> None:
        """Crash recovery for the finish_run directory swap: if a crash
        landed between 'rename target aside' and 'promote stage', the
        previous table is still intact under .__old__ — restore it.

        Recovery itself runs under the writer lock (double-checked: the
        no-recovery-needed fast path never locks).  Without it a READER
        observing the one-instruction window inside a live writer's
        promote_dir — target renamed aside, stage not yet promoted —
        would 'recover' the aside copy back and make the writer's
        os.rename land on a non-empty directory (code-review r10).
        Writers already inside the lock pass ``have_lock=True``; the
        flock is per-open-file-description, so re-acquiring from the
        same process would deadlock, not recurse."""
        from etl_utils_spark.fsutil import _aside, recover_dir

        if have_lock:
            recover_dir(path)
            return
        if os.path.isdir(path) or not os.path.isdir(_aside(path)):
            return  # live table (or nothing to recover): lock-free
        with self._writer_lock():
            recover_dir(path)  # re-checks the condition under the lock

    def _read_or_empty(self, path: str, schema: T.StructType) -> DataFrame:
        self._recover(path)
        if os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path) if not f.startswith(("_", "."))
        ):
            return self.spark.read.schema(schema).parquet(path)
        return self.spark.createDataFrame([], schema)

    def job_log(self) -> DataFrame:
        return self._read_or_empty(self.job_log_path, JOB_LOG_SCHEMA)

    def job_details(self) -> DataFrame:
        return self._read_or_empty(self.job_details_path, JOB_DETAILS_SCHEMA)

    # ----------------------------------------------------------- writes

    def _max_of(self, path: str, schema: pa.Schema, col: str) -> int:
        # callers (register_run, append_details) already hold the lock
        self._recover(path, have_lock=True)
        tbl = _read_arrow(path, schema)
        if tbl.num_rows == 0:
            return 0
        import pyarrow.compute as pc

        return int(pc.max(tbl.column(col)).as_py() or 0)

    def register_run(self, script_name: str) -> int:
        """INSERT a RUNNING row and return the new run_id
        (query_wrapper.sql:246-283 register/get_unique_run_id).
        Driver-side pyarrow append — no Spark job for a 1-row insert.
        The max+1 allocation and the publish run under the per-log-dir
        writer lock, so concurrent jobs get unique monotonic ids (the
        reference's early-COMMIT contention contract,
        query_wrapper.sql:277-282)."""
        with self._writer_lock():
            run_id = self._max_of(self.job_log_path, _PA_JOB_LOG, "run_id") + 1
            table = pa.Table.from_pylist(
                [
                    {
                        "run_id": run_id,
                        "script_name": script_name,
                        "status": STATUS_RUNNING,
                        "start_time": dt.datetime.now(),
                        "end_time": None,
                    }
                ],
                schema=_PA_JOB_LOG,
            )
            _publish_file(self.job_log_path, table)
            return run_id

    def finish_run(self, run_id: int, ok: bool) -> None:
        """UPDATE the run's row to its final status + end_time
        (query_wrapper.sql:163-175).

        Single write + recoverable directory swap: the updated table is
        written ONCE into a stage directory, the live directory is moved
        aside (not deleted), the stage is promoted, and only then is the
        old copy removed.  A crash at any step leaves either the old or
        the new table readable — _recover() restores the aside copy if
        the crash hit between the two renames.  (r1 shipped a
        double-write with a deleted-but-not-rewritten window; this also
        drops the two Spark jobs it paid — the update is driver-side
        pyarrow on a metadata-scale table.)  Local-POSIX rename
        semantics; on HDFS/S3 deployments route through the cluster's
        atomic-commit primitive instead."""
        with self._writer_lock():
            self._recover(self.job_log_path, have_lock=True)
            status = STATUS_OK if ok else STATUS_ERROR
            end = dt.datetime.now()
            rows = _read_arrow(self.job_log_path, _PA_JOB_LOG).to_pylist()
            for r in rows:
                if r["run_id"] == run_id:
                    r["status"] = status
                    r["end_time"] = end
            table = pa.Table.from_pylist(rows, schema=_PA_JOB_LOG)

            from etl_utils_spark.fsutil import promote_dir

            stage = self.job_log_path + ".__stage__"
            shutil.rmtree(stage, ignore_errors=True)
            os.makedirs(stage, exist_ok=True)
            pq.write_table(table, os.path.join(stage, "part-00000.parquet"))
            promote_dir(stage, self.job_log_path)

    def append_details(self, run_id: int, messages: list[tuple]) -> None:
        """Flush the whole message buffer in ONE append — the engine
        replacement for the reference's 100-row prepared-INSERT batching
        (query_wrapper.sql:87-125): one parquet file published with a
        single atomic rename, regardless of row count."""
        if not messages:
            return
        with self._writer_lock():
            self._append_details_locked(run_id, messages)

    def _append_details_locked(self, run_id: int, messages: list[tuple]) -> None:
        base = self._max_of(self.job_details_path, _PA_JOB_DETAILS, "detail_id")
        rows = [
            {
                "detail_id": base + i + 1,
                "run_id": run_id,
                "log_time": (
                    dt.datetime.strptime(msg_time, "%Y-%m-%d %H:%M:%S")
                    if isinstance(msg_time, str)
                    else msg_time
                ),
                "log_level": msg_type,
                "log_message": msg_text,
                "rowcount": None if rowcount is None else Decimal(int(rowcount)),
            }
            for i, (msg_time, msg_type, msg_text, rowcount) in enumerate(messages)
        ]
        _publish_file(
            self.job_details_path, pa.Table.from_pylist(rows, schema=_PA_JOB_DETAILS)
        )
