"""Multi-writer LogTables contention (VERDICT r9 item 8 / SURVEY §7
risk 2): N processes registering runs against the SAME log directory
must produce unique, gap-free monotonic run ids — the reference
tolerates concurrent jobs via an early COMMIT on run-id allocation
(query_wrapper.sql:277-282); this engine serializes the max+1
read-modify-write with a per-log-dir POSIX flock
(logtables.py:_writer_lock).

Pure driver-side pyarrow paths — no SparkSession anywhere, so the
subprocesses are cheap and the test exercises REAL process-level
concurrency, not threads behind one GIL.
"""

import multiprocessing as mp
import os

from etl_utils_spark.logtables import STATUS_OK, STATUS_RUNNING, LogTables


def _register_some(base_dir: str, n: int, out: "mp.Queue") -> None:
    lt = LogTables(None, base_dir)  # spark unused on the writer paths
    ids = []
    for _ in range(n):
        rid = lt.register_run(f"job-{os.getpid()}")
        ids.append(rid)
        lt.append_details(rid, [("2026-01-01 00:00:00", "INFO", "m", None)])
    for rid in ids[: n // 2]:
        lt.finish_run(rid, ok=True)
    out.put(ids)


def test_concurrent_register_run_unique_monotonic(tmp_path):
    base = str(tmp_path / "logs")
    procs, out = [], mp.Queue()
    n_procs, per_proc = 8, 5
    for _ in range(n_procs):
        p = mp.Process(target=_register_some, args=(base, per_proc, out))
        p.start()
        procs.append(p)
    all_ids = []
    for _ in range(n_procs):
        all_ids.extend(out.get(timeout=120))
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0

    total = n_procs * per_proc
    # unique AND gap-free: the lock serializes max+1 so the id space is
    # exactly 1..total — a lost update would duplicate an id, a read of
    # a half-published directory would skip one
    assert sorted(all_ids) == list(range(1, total + 1))

    import pyarrow.dataset as ds

    log = ds.dataset(os.path.join(base, "job_log")).to_table().to_pylist()
    assert sorted(r["run_id"] for r in log) == list(range(1, total + 1))
    # every row holds exactly one coherent status (finish_run's rewrite
    # under the lock never clobbers a concurrent insert)
    assert all(r["status"] in (STATUS_RUNNING, STATUS_OK) for r in log)
    assert sum(r["status"] == STATUS_OK for r in log) == n_procs * (per_proc // 2)

    det = ds.dataset(os.path.join(base, "job_details")).to_table().to_pylist()
    assert len(det) == total
    # detail ids allocated under the same lock: unique and gap-free too
    assert sorted(r["detail_id"] for r in det) == list(range(1, total + 1))


def _finish_loop(base_dir: str, run_ids, out: "mp.Queue") -> None:
    lt = LogTables(None, base_dir)
    try:
        for rid in run_ids:
            lt.finish_run(rid, ok=True)
        out.put("ok")
    except Exception as exc:  # noqa: BLE001
        out.put(f"writer crashed: {type(exc).__name__}: {exc}")


def _reader_loop(base_dir: str, n: int, out: "mp.Queue") -> None:
    import pyarrow.dataset as ds

    from etl_utils_spark.fsutil import _aside

    lt = LogTables(None, base_dir)
    try:
        for _ in range(n):
            # the reader-side recovery path under test: _recover must
            # not rename the aside copy out from under a live writer
            lt._recover(lt.job_log_path)
            try:
                ds.dataset(os.path.join(base_dir, "job_log"))
            except FileNotFoundError:
                pass  # transient mid-swap window — allowed
        assert not os.path.isdir(_aside(lt.job_log_path) + ".bogus")
        out.put("ok")
    except Exception as exc:  # noqa: BLE001
        out.put(f"reader crashed: {type(exc).__name__}: {exc}")


def test_reader_recovery_never_breaks_live_writer(tmp_path):
    """code-review r10: a reader's crash-recovery rename racing a
    writer's finish_run directory swap crashed the writer (rename onto
    a recovered non-empty dir).  With recovery under the writer lock,
    heavy concurrent finish_run + reader-recover loops must all
    complete cleanly and the final table must hold every run."""
    base = str(tmp_path / "logs")
    lt = LogTables(None, base)
    n_runs = 30
    ids = [lt.register_run("job") for _ in range(n_runs)]

    out = mp.Queue()
    writers = [
        mp.Process(target=_finish_loop, args=(base, ids[i::2], out))
        for i in range(2)
    ]
    readers = [
        mp.Process(target=_reader_loop, args=(base, 200, out)) for _ in range(3)
    ]
    procs = writers + readers
    for p in procs:
        p.start()
    results = [out.get(timeout=180) for _ in procs]
    for p in procs:
        p.join(timeout=180)
        assert p.exitcode == 0
    assert results == ["ok"] * len(procs), results

    import pyarrow.dataset as ds

    log = ds.dataset(os.path.join(base, "job_log")).to_table().to_pylist()
    assert sorted(r["run_id"] for r in log) == list(range(1, n_runs + 1))
    assert all(r["status"] == STATUS_OK for r in log)
