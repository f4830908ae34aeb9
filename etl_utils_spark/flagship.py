"""Flagship job: the reference README example, re-imagined on Spark.

The reference's end-to-end example (README.md:35-69) iterates catalog
tables, runs a parameterized COUNT(*) per table with quoted identifier
substitution, logs custom messages, and finishes — returning the log
buffer as the script's result table. This is that job against the
driver fixtures: it exercises wrapper construction + registration,
query_values iteration, ``::identifier`` and ``:value`` params, the
rowcount 'count' heuristic, custom log entries, and finish().
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from etl_utils_spark.sources.tables import TABLES, register_views
from etl_utils_spark.wrapper import QueryWrapper


def flagship_job(spark: SparkSession, sf_dir: str, log_dir: str | None = None) -> DataFrame:
    """Count every fixture table through the wrapper; return the run's
    message buffer (stable schema, ≥1 row per table)."""
    register_views(spark, sf_dir)
    if log_dir is None:
        log_dir = tempfile.mkdtemp(prefix="etl_utils_spark_logs_")
    w = QueryWrapper(spark, log_dir=log_dir, script_name="flagship_fixture_counts")

    # The catalog-driven loop (README.md:41-58): table list from the
    # session catalog, restricted to the fixture views.
    listed = [t.name for t in spark.catalog.listTables() if t.name in TABLES]
    for name in sorted(listed):
        w.set_param("TABLE_NAME", name)
        ok, info = w.query("SELECT COUNT(*) AS cnt FROM ::TABLE_NAME")
        if ok:
            w.log("MY_LOG", f"counted table {name}", info.rows)

    # value-parameterized analytical step (the README's quoted-vs-
    # unquoted param usage, README.md:43-58)
    w.set_param("SEG", "BUILDING")
    ok, info = w.query(
        "SELECT COUNT(*) AS cnt FROM customer WHERE c_mktsegment = :SEG"
    )
    if ok:
        w.log("MY_LOG", "segment BUILDING customers", info.rows)

    # procedural step dispatch (query_wrapper.sql:226-243 run())
    w.run(_steps, "revenue_summary")

    return w.finish()


class _steps:
    """Flagship job steps dispatched through wrapper.run()."""

    @staticmethod
    def revenue_summary(w: QueryWrapper) -> None:
        ok, info = w.query(
            "SELECT l_returnflag, "
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue "
            "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
            logging=False,
        )
        if ok:
            for flag, revenue in w.query_values(info):
                w.log("REVENUE", f"returnflag {flag} revenue {revenue:.2f}")
