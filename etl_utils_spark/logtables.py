"""Persistent job-log tables (job_log / job_details).

Schemas mirror the reference DDL (query_wrapper.sql:4-19):
job_log is one row per run, job_details one row per log message.

Storage: Parquet directories under a base path. Appends are atomic at
file granularity (each flush writes new files); the single UPDATE the
reference performs (finish → status/end_time, query_wrapper.sql:168-175)
is implemented as read-modify-overwrite of the tiny job_log table. On a
deployment with Delta Lake the same class would use a Delta ``UPDATE``
and identity columns; the log tables are metadata-scale (one row per
run / per message), never data-scale, so driver-side handling is
appropriate even on a 1000-executor cluster.

run_id allocation: max(run_id)+1 under a single-writer assumption —
the reference has the same race and papers over it with an early COMMIT
(query_wrapper.sql:246-283); we document it instead of hiding it.
"""

from __future__ import annotations

import datetime as dt
import os
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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


class LogTables:
    """Parquet-backed job_log / job_details pair."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        self.job_log_path = os.path.join(base_dir, "job_log")
        self.job_details_path = os.path.join(base_dir, "job_details")

    # ------------------------------------------------------------ reads

    def _read_or_empty(self, path: str, schema: T.StructType) -> DataFrame:
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

    def register_run(self, script_name: str) -> int:
        """INSERT a RUNNING row and return the new run_id
        (query_wrapper.sql:246-283 register/get_unique_run_id)."""
        prev = self.job_log().agg(F.max("run_id")).collect()[0][0]
        run_id = int(prev or 0) + 1
        row = [(run_id, script_name, STATUS_RUNNING, dt.datetime.now(), None)]
        self.spark.createDataFrame(row, JOB_LOG_SCHEMA).write.mode("append").parquet(
            self.job_log_path
        )
        return run_id

    def finish_run(self, run_id: int, ok: bool) -> None:
        """UPDATE the run's row to its final status + end_time
        (query_wrapper.sql:163-175) via read-modify-overwrite."""
        status = STATUS_OK if ok else STATUS_ERROR
        end = dt.datetime.now()
        rows = [list(r) for r in self.job_log().collect()]
        for r in rows:
            if r[0] == run_id:
                r[2] = status
                r[4] = end
        df = self.spark.createDataFrame([tuple(r) for r in rows], JOB_LOG_SCHEMA)
        tmp = self.job_log_path + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.schema(JOB_LOG_SCHEMA).parquet(tmp)
        final.write.mode("overwrite").parquet(self.job_log_path)

    def append_details(self, run_id: int, messages: list[tuple]) -> None:
        """Flush the whole message buffer in ONE append — the engine
        replacement for the reference's 100-row prepared-INSERT batching
        (query_wrapper.sql:87-125): a Spark append is a single atomic
        job regardless of row count."""
        if not messages:
            return
        prev = self.job_details().agg(F.max("detail_id")).collect()[0][0]
        base = int(prev or 0)
        rows = [
            (
                base + i + 1,
                run_id,
                (
                    dt.datetime.strptime(msg_time, "%Y-%m-%d %H:%M:%S")
                    if isinstance(msg_time, str)
                    else msg_time
                ),
                msg_type,
                msg_text,
                None if rowcount is None else Decimal(int(rowcount)),
            )
            for i, (msg_time, msg_type, msg_text, rowcount) in enumerate(messages)
        ]
        self.spark.createDataFrame(rows, JOB_DETAILS_SCHEMA).write.mode("append").parquet(
            self.job_details_path
        )
