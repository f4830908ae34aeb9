"""QueryWrapper behaviors with exact reference semantics
(SURVEY.md §5.3): truncation, on_error policies, rowcount inference,
iterators, prepared execute, finish statuses."""

from __future__ import annotations

import pytest

from etl_utils_spark.logtables import STATUS_ERROR, STATUS_OK, LogTables
from etl_utils_spark.sources.tables import register_views
from etl_utils_spark.wrapper import QueryWrapper, WrapperError


@pytest.fixture
def wrapper(spark, sf_dir, tmp_path):
    register_views(spark, sf_dir)
    return QueryWrapper(spark, log_dir=str(tmp_path / "logs"), script_name="t")


def test_log_truncation_rules(wrapper):
    # type >10 chars → first 7 + '...' (query_wrapper.sql:73-75)
    wrapper.log("VERYLONGTYPE", "m")
    assert wrapper.messages[-1][1] == "VERYLON..."
    # message >20000 chars → first 19995 + '...' (query_wrapper.sql:77-79)
    wrapper.log("INFO", "x" * 20005)
    msg = wrapper.messages[-1][2]
    assert len(msg) == 19998 and msg.endswith("...")
    # short values pass through trimmed
    wrapper.log("  OK  ", "  hello  ")
    assert wrapper.messages[-1][1] == "OK" and wrapper.messages[-1][2] == "hello"


def test_rowcount_count_heuristic(wrapper):
    ok, info = wrapper.query("SELECT COUNT(*) AS cnt FROM region")
    assert ok and info.rows == 5  # the VALUE, not 1 (query_wrapper.sql:55-58)
    ok, info = wrapper.query("SELECT r_regionkey FROM region")
    assert ok and info.rows == 5


def test_on_error_abort(wrapper):
    with pytest.raises(WrapperError):
        wrapper.query("SELECT * FROM no_such_table_xyz")
    assert wrapper.error_count == 1
    assert wrapper.finished


def test_on_error_continue(wrapper):
    wrapper.on_error = "continue"
    ok, info = wrapper.query("SELECT * FROM no_such_table_xyz")
    assert not ok and not wrapper.finished
    assert wrapper.error_count == 1
    # job can proceed
    ok, _ = wrapper.query("SELECT 1 AS one")
    assert ok


def test_param_binding(wrapper):
    wrapper.set_param("SEG", "BUILDING")
    wrapper.set_param("T", "customer")
    ok, info = wrapper.query(
        "SELECT COUNT(*) AS n FROM ::T WHERE c_mktsegment = :SEG"
    )
    assert ok
    n = info.df.collect()[0][0]
    assert n > 0


def test_iterators_name_and_index(wrapper):
    rows = list(wrapper.query_rows("SELECT r_regionkey, r_name FROM region"))
    assert len(rows) == 5
    assert rows[0].r_name == rows[0][1]  # by name or index (ref :352-361)
    vals = list(wrapper.query_values("SELECT r_regionkey, r_name FROM region"))
    assert all(isinstance(v, tuple) and len(v) == 2 for v in vals)


def test_prepared_insert_set_based(wrapper, spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS tmp_ps_target")
    spark.sql(
        "CREATE TABLE tmp_ps_target (a INT, b STRING) USING parquet "
        f"LOCATION '{tmp_path}/ps_target'"
    )
    stmt = wrapper.prepare("INSERT INTO tmp_ps_target VALUES (?, ?)")
    assert stmt.n_params == 2
    ok, results = stmt.execute([[1, "x"], [2, "y"], [3, None]])
    assert ok
    got = sorted(tuple(r) for r in spark.table("tmp_ps_target").collect())
    assert got == [(1, "x"), (2, "y"), (3, None)]  # missing → NULL (ref :291)
    spark.sql("DROP TABLE IF EXISTS tmp_ps_target")


def test_finish_statuses(spark, sf_dir, tmp_path):
    register_views(spark, sf_dir)
    log_dir = str(tmp_path / "logs2")

    w = QueryWrapper(spark, log_dir=log_dir, script_name="good")
    w.query("SELECT COUNT(*) AS c FROM region")
    out = w.finish()
    assert out.count() >= 2  # START + logged query

    w2 = QueryWrapper(spark, log_dir=log_dir, script_name="bad")
    w2.on_error = "continue"
    w2.query("SELECT * FROM missing_table_abc")
    w2.finish()

    logs = LogTables(spark, log_dir).job_log().collect()
    by_name = {r.script_name: r.status for r in logs}
    assert by_name["good"] == STATUS_OK
    assert by_name["bad"] == STATUS_ERROR
    # run ids are unique and increasing
    ids = sorted(r.run_id for r in logs)
    assert ids == sorted(set(ids))


def test_verbosity_gates_auto_logging(wrapper):
    # verbosity < 2 suppresses the per-statement INFO logging
    # (query_wrapper.sql:61-65); explicit log() still works
    wrapper.verbosity = 1
    n_before = len(wrapper.messages)
    ok, _ = wrapper.query("SELECT COUNT(*) AS c FROM region")
    assert ok and len(wrapper.messages) == n_before
    wrapper.log("MANUAL", "still logs")
    assert len(wrapper.messages) == n_before + 1
    wrapper.verbosity = 2
    ok, _ = wrapper.query("SELECT COUNT(*) AS c FROM region")
    assert ok and len(wrapper.messages) == n_before + 2


def test_run_dispatch(wrapper):
    class Steps:
        @staticmethod
        def step_ok(w, x):
            return x + 1

    ok, res = wrapper.run(Steps, "step_ok", 41)
    assert ok and res == 42
    with pytest.raises(WrapperError):
        wrapper.run(Steps, "no_such_fn")


def test_prepared_insert_column_list_binds_by_name(wrapper, spark, tmp_path):
    """'INSERT INTO t (b, a) VALUES (?, ?)' must honor the column list
    — r1's fast path ignored it and wrote positionally-swapped values."""
    spark.sql("DROP TABLE IF EXISTS tmp_ps_cols")
    spark.sql(
        "CREATE TABLE tmp_ps_cols (a INT, b STRING) USING parquet "
        f"LOCATION '{tmp_path}/ps_cols'"
    )
    stmt = wrapper.prepare("INSERT INTO tmp_ps_cols (b, a) VALUES (?, ?)")
    ok, _ = stmt.execute([["x", 1], ["y", 2]])
    assert ok
    got = sorted(tuple(r) for r in spark.table("tmp_ps_cols").collect())
    assert got == [(1, "x"), (2, "y")]
    spark.sql("DROP TABLE IF EXISTS tmp_ps_cols")


def test_prepared_insert_expression_not_dropped(wrapper, spark, tmp_path):
    """'VALUES (?, ? + 1)' must evaluate the expression — r1's fast
    path silently dropped it."""
    spark.sql("DROP TABLE IF EXISTS tmp_ps_expr")
    spark.sql(
        "CREATE TABLE tmp_ps_expr (a INT, b INT) USING parquet "
        f"LOCATION '{tmp_path}/ps_expr'"
    )
    stmt = wrapper.prepare("INSERT INTO tmp_ps_expr VALUES (?, ? + 1)")
    ok, _ = stmt.execute([[1, 10], [2, 20]])
    assert ok
    got = sorted(tuple(r) for r in spark.table("tmp_ps_expr").collect())
    assert got == [(1, 11), (2, 21)]
    spark.sql("DROP TABLE IF EXISTS tmp_ps_expr")


def test_prepared_empty_batch_is_noop(wrapper, spark, tmp_path):
    """Empty value matrix + placeholders → success without executing
    (the reference loops zero times) — common in incremental jobs."""
    spark.sql("DROP TABLE IF EXISTS tmp_ps_empty")
    spark.sql(
        "CREATE TABLE tmp_ps_empty (a INT) USING parquet "
        f"LOCATION '{tmp_path}/ps_empty'"
    )
    stmt = wrapper.prepare("INSERT INTO tmp_ps_empty VALUES (?)")
    ok, results = stmt.execute([])
    assert ok and results == []
    assert spark.table("tmp_ps_empty").count() == 0
    spark.sql("DROP TABLE IF EXISTS tmp_ps_empty")


def test_infer_rowcount_multirow_count_column(wrapper, spark):
    """A multi-row single-column result whose text contains 'count'
    must log the TRUE row count, not len(take(2)) == 2."""
    ok, info = wrapper.query(
        "SELECT c_custkey AS c_count FROM customer WHERE c_custkey <= 5"
    )
    assert ok
    expected = spark.table("customer").filter("c_custkey <= 5").count()
    assert expected > 2  # the buggy r1 path would have logged exactly 2
    assert info.rows == expected


def test_error_log_silencing_is_scoped(wrapper, spark):
    """The PySpark query-context error loggers are silenced ONLY inside
    wrapper regions that own the error by contract, and restored
    afterward — the r9 replacement for the pre-r9 process-global
    import-time disable (ADVICE r8)."""
    import logging

    from etl_utils_spark.wrapper import _QUERY_CTX_LOGGERS

    if not _QUERY_CTX_LOGGERS:  # pyspark<4
        pytest.skip("no query-context loggers on this pyspark")

    records = []

    class _Catch(logging.Handler):
        def emit(self, record):
            records.append(record)

    h = _Catch()
    for lg in _QUERY_CTX_LOGGERS:
        lg.addHandler(h)
    try:
        # handled by contract: on_error='continue' swallows → no blob
        wrapper.on_error = "continue"
        ok, info = wrapper.query("SELECT * FROM missing_table_abc")
        assert not ok and info.error is not None
        assert records == [], "handled failure must not emit a structured blob"
        # outside any wrapper call the loggers are live again
        assert all(not lg.disabled for lg in _QUERY_CTX_LOGGERS)
        with pytest.raises(Exception):
            spark.sql("SELECT * FROM missing_table_def")
        assert records, "consumer errors outside the wrapper keep their logs"
    finally:
        for lg in _QUERY_CTX_LOGGERS:
            lg.removeHandler(h)


def test_snapshot_rollback_restores_managed_table(wrapper, spark, tmp_path):
    """on_error='rollback' must revert a managed table to its
    pre-transaction content — the reference's mid-job ROLLBACK over DML
    (query_wrapper.sql:138-144), closing VERDICT r9 missing item 1."""
    target = str(tmp_path / "dim")
    v0 = spark.range(3).selectExpr("id", "id * 10 AS val")
    v0.write.mode("overwrite").parquet(target)

    wrapper.on_error = "rollback"
    # step 1: the job overwrites the managed table...
    wrapper.write_table(spark.range(7).selectExpr("id", "id AS val"), target)
    assert spark.read.parquet(target).count() == 7
    # step 2: ...then a later statement fails → rollback + WrapperError
    with pytest.raises(WrapperError):
        wrapper.query("SELECT * FROM no_such_table_rollback_check")
    back = spark.read.parquet(target).orderBy("id").collect()
    assert [(r.id, r.val) for r in back] == [(0, 0), (1, 10), (2, 20)]
    assert wrapper.finished


def test_rollback_removes_table_created_in_transaction(wrapper, spark, tmp_path):
    import os

    target = str(tmp_path / "fresh")
    wrapper.write_table(spark.range(4), target)
    assert os.path.isdir(target)
    wrapper.rollback()
    assert not os.path.isdir(target)


def test_commit_releases_restore_points(wrapper, spark, tmp_path):
    """After commit(), rollback() reverts only to the commit point —
    the reference's transaction-boundary semantics."""
    target = str(tmp_path / "dim2")
    spark.range(2).write.mode("overwrite").parquet(target)  # pre-run: 2 rows
    wrapper.write_table(spark.range(5), target)             # txn 1: 5 rows
    wrapper.commit()                                        # durable
    wrapper.write_table(spark.range(9), target)             # txn 2: 9 rows
    wrapper.rollback()
    assert spark.read.parquet(target).count() == 5          # commit point, not 2


def test_manage_table_recovers_crashed_aside_as_preimage(wrapper, spark, tmp_path):
    """A table left in the crashed-aside state (target missing,
    <target>.__old__ present — the window promote_dir/recover_dir exist
    for) must be repaired BEFORE manage_table classifies it: it is a
    pre-existing table and gets a restore point, not the
    created-in-transaction status whose rollback() rmtree would delete
    it permanently (advice r10)."""
    import os

    target = str(tmp_path / "dim_crash")
    spark.range(3).selectExpr("id", "id * 2 AS val").write.parquet(target)
    # simulate a death mid-promote: live dir renamed aside, no new dir
    os.rename(target, target + ".__old__")
    assert not os.path.isdir(target)

    wrapper.write_table(spark.range(9), target)  # manage → recover → snapshot
    assert spark.read.parquet(target).count() == 9
    wrapper.rollback()
    # the recovered pre-image is restored — NOT deleted as created-in-txn
    back = spark.read.parquet(target).orderBy("id").collect()
    assert [(r.id, r.val) for r in back] == [(0, 0), (1, 2), (2, 4)]


def test_finish_releases_restore_points_like_commit(wrapper, spark, tmp_path):
    """finish() on the success path must release the managed registry
    with commit() semantics (reference wrap_finish commits on the way
    out, query_wrapper.sql:146-154): snapshot retention runs, and a
    post-finish rollback() cannot rewind writes finish made durable
    (advice r10)."""
    import os

    target = str(tmp_path / "dim_fin")
    spark.range(2).write.mode("overwrite").parquet(target)   # pre-run: 2 rows
    wrapper.write_table(spark.range(6), target)              # run writes 6
    wrapper.finish()                                         # success close
    wrapper.rollback()                                       # must be a no-op
    assert spark.read.parquet(target).count() == 6           # durable at finish
    # retention ran: at most one forensics pre-image remains
    snapdir = target + ".__snapshots__"
    versions = [d for d in os.listdir(snapdir) if d.startswith("v")]
    assert len(versions) <= 1


def test_write_table_failure_routes_through_on_error(wrapper, spark, tmp_path):
    """A failing managed write must follow the uniform on_error
    contract like query()/run(): under 'rollback' the managed tables
    are restored and the run finishes with WrapperError; the raw Spark
    exception never leaks (code-review r10)."""
    target_a = str(tmp_path / "dim_a")
    spark.range(3).write.mode("overwrite").parquet(target_a)

    wrapper.on_error = "rollback"
    wrapper.write_table(spark.range(8), target_a)        # step 1 ok
    assert spark.read.parquet(target_a).count() == 8
    bad = spark.range(1).selectExpr("assert_true(id > 100) AS boom")
    with pytest.raises(WrapperError):
        wrapper.write_table(bad, str(tmp_path / "dim_b"))  # step 2 fails
    assert spark.read.parquet(target_a).count() == 3       # restored
    assert wrapper.finished
    # and under 'continue' the failure just reports False
    w2 = QueryWrapper(spark, script_name="t2")
    w2.on_error = "continue"
    assert w2.write_table(bad, str(tmp_path / "dim_c")) is False
    assert w2.error_count == 1


def test_raw_dml_outside_managed_net_is_flagged_rollback_gap(wrapper, spark, tmp_path):
    """The one remaining reference semantic delta, made loud: a raw
    catalog-writing statement through query() (INSERT/CREATE/UPDATE/...)
    bypasses the snapshot rollback net, so the wrapper must flag it
    ROLLBACK_GAP in the message log — a failed job's rollback() then
    has its partial coverage on the record (judge r10 item 5)."""
    loc = str(tmp_path / "gap_t")
    wrapper.query(
        f"CREATE TABLE gap_demo_t (k INT) USING parquet LOCATION '{loc}'"
    )
    wrapper.query("INSERT INTO gap_demo_t VALUES (1)")
    try:
        gap_msgs = [m for (_, ty, m, _) in wrapper.messages if "ROLLBACK_GAP" in m]
        assert any("CREATE on 'gap_demo_t'" in m for m in gap_msgs)
        assert any("INSERT on 'gap_demo_t'" in m for m in gap_msgs)
        # once per (head, target): a second INSERT does not re-warn
        n_before = len(gap_msgs)
        wrapper.query("INSERT INTO gap_demo_t VALUES (2)")
        gap_msgs2 = [m for (_, ty, m, _) in wrapper.messages if "ROLLBACK_GAP" in m]
        assert len(gap_msgs2) == n_before
        # SELECTs and temp views never warn
        wrapper.query("SELECT * FROM gap_demo_t")
        wrapper.query("CREATE OR REPLACE TEMPORARY VIEW gap_v AS SELECT 1 AS x")
        gap_msgs3 = [m for (_, ty, m, _) in wrapper.messages if "ROLLBACK_GAP" in m]
        assert len(gap_msgs3) == n_before
    finally:
        spark.sql("DROP TABLE IF EXISTS gap_demo_t")


def test_strict_rollback_refuses_raw_dml_per_on_error_policy(spark, tmp_path):
    """strict_rollback=True (judge r11 item 5): a raw catalog-writing
    statement through query() is REFUSED before execution and routed
    through the uniform on_error policy — under the default 'abort'
    the run raises WrapperError and the target is never written; under
    'continue' it reports False and the job keeps going.  SELECTs and
    TEMP views are unaffected."""
    loc = str(tmp_path / "strict_t")
    spark.range(3).write.mode("overwrite").parquet(loc)
    spark.read.parquet(loc).createOrReplaceTempView("strict_demo_src")
    try:
        w = QueryWrapper(spark, script_name="strict", strict_rollback=True)
        ok, _ = w.query("SELECT * FROM strict_demo_src")  # reads untouched
        assert ok
        ok, _ = w.query("CREATE OR REPLACE TEMPORARY VIEW strict_v AS SELECT 1 AS x")
        assert ok  # session-scoped: not a rollback gap
        with pytest.raises(WrapperError, match="ROLLBACK_GAP \\(strict\\)"):
            w.query(
                f"CREATE TABLE strict_gap_t (k INT) USING parquet "
                f"LOCATION '{tmp_path / 'gap'}'"
            )
        assert w.finished  # abort policy finished the run
        assert not spark.catalog.tableExists("strict_gap_t")  # never written

        w2 = QueryWrapper(spark, script_name="strict2", strict_rollback=True)
        w2.on_error = "continue"
        ok, info = w2.query("INSERT INTO strict_demo_src VALUES (9)")
        assert ok is False and "ROLLBACK_GAP (strict)" in info.error
        assert w2.error_count == 1
        ok, _ = w2.query("SELECT * FROM strict_demo_src")  # job keeps going
        assert ok
        assert spark.read.parquet(loc).count() == 3  # write never happened
    finally:
        spark.catalog.dropTempView("strict_demo_src")
        spark.sql("DROP TABLE IF EXISTS strict_gap_t")


def test_strict_rollback_managed_path_unaffected(spark, tmp_path):
    """Under strict mode the SNAPSHOT-BACKED path stays fully
    functional: write_table + rollback restores the pre-image exactly
    as in default mode."""
    target = str(tmp_path / "managed_dim")
    spark.range(3).write.mode("overwrite").parquet(target)
    w = QueryWrapper(spark, script_name="strict3", strict_rollback=True)
    w.write_table(spark.range(8), target)
    assert spark.read.parquet(target).count() == 8
    w.rollback()
    assert spark.read.parquet(target).count() == 3
    w.finish()


def test_rollback_gap_target_skips_modifier_keywords():
    """Modifier keywords (IF NOT EXISTS / OVERWRITE TABLE / EXTERNAL
    ...) must be consumed before the target capture, or two distinct
    tables collapse onto the same 'CREATE:IF' dedup key and the second
    table's warning is silently suppressed (judge r11 advice).  Spark
    treats these words as non-reserved, so a table literally NAMED
    after one must still resolve as the target (code-review r12)."""
    cases = {
        "CREATE TABLE IF NOT EXISTS tbl_a (k INT)": ("CREATE", "tbl_a"),
        "CREATE TABLE IF NOT EXISTS tbl_b (k INT)": ("CREATE", "tbl_b"),
        "DROP TABLE IF EXISTS tbl_c": ("DROP", "tbl_c"),
        "INSERT OVERWRITE TABLE tbl_d SELECT 1": ("INSERT", "tbl_d"),
        "CREATE EXTERNAL TABLE tbl_e (k INT)": ("CREATE", "tbl_e"),
        "INSERT INTO tbl_f VALUES (1)": ("INSERT", "tbl_f"),
        "DELETE FROM db.tbl_g WHERE k = 1": ("DELETE", "db.tbl_g"),
        "UPDATE tbl_h SET k = 2": ("UPDATE", "tbl_h"),
        "DROP DATABASE IF EXISTS db_i": ("DROP", "db_i"),
        "CREATE TABLE `weird name` (k INT)": ("CREATE", "weird name"),
        # identifiers that merely PREFIX a modifier keyword still capture
        "INSERT INTO intox VALUES (1)": ("INSERT", "intox"),
        # keyword-NAMED tables (non-reserved words in Spark SQL)
        "CREATE TABLE external (k INT)": ("CREATE", "external"),
        "CREATE TABLE IF NOT EXISTS external (k INT)": ("CREATE", "external"),
        "UPDATE external SET k = 1": ("UPDATE", "external"),
        "DROP TABLE IF EXISTS exists": ("DROP", "exists"),
        "CREATE TABLE `external` (k INT)": ("CREATE", "external"),
    }
    for sql, (head, target) in cases.items():
        hit = QueryWrapper._classify_gap_stmt(sql)
        assert hit is not None, sql
        assert hit == (head, target), (sql, hit)
    assert QueryWrapper._classify_gap_stmt("SELECT * FROM t") is None
    assert (
        QueryWrapper._classify_gap_stmt(
            "CREATE OR REPLACE TEMPORARY VIEW v AS SELECT 1"
        )
        is None
    )
