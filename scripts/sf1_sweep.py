"""Beyond-fixture bitwise sweep: the round-close scale-robustness gate.

Runs EVERY registered query against its DuckDB oracle on the 10×
derived dataset (/tmp/sparkgraft_sf1, built by scripts/scale_probe.py)
at driver-hash strictness (bitwise), with a per-query SIGALRM watchdog.
A query whose compare blows the watchdog at 10× is automatically
retried at the bounded 3× dir (/tmp/sparkgraft_sf03) and recorded as a
``bounded`` pass — cost-bounded, never silently skipped.  This replaces
the round-7 ad-hoc exclusion list with a measured classification: the
only hard skips left are fixture-shape ones (streaming file-glob
``_live`` twins, io_file_metadata_audit), each with the reason printed.

Rows-only queries run their count() action at 10× — under ANSI mode a
green run certifies no silent integer overflow at that scale.

Usage::

    python scripts/scale_probe.py --reuse    # ensure the 10x dir exists
    python scripts/sf1_sweep.py              # full sweep
    python scripts/sf1_sweep.py name1 name2  # subset

Exits nonzero on any FAIL (timeout-at-3× counts as FAIL too).
"""

from __future__ import annotations

import os
import signal
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/sparkgraft_sf1")
SF3 = os.environ.get("SPARK_GRAFT_SF3_DIR", "/tmp/sparkgraft_sf03")
TIMEOUT = int(os.environ.get("SPARK_GRAFT_SWEEP_TIMEOUT", "300"))

# Fixture-shape skips (NOT cost): reasons are printed into the summary.
HARD_SKIPS = {
    "io_file_metadata_audit": "subject IS the file layout, which differs at every scale by construction",
}
_LIVE_REASON = (
    "file-source streaming twin; derived dirs are directory-parquet, the "
    "stream fixtures are single files — batch twin shares the oracle at "
    "every fixture scale"
)


class _Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Timeout()


def classify(run, timeout=TIMEOUT, sf10=None, sf3=None):
    """Drive one query's 10×→bounded-3× classification and NEVER raise.

    ``run(sf_dir, budget)`` returns ``(ok, msg)`` or raises (_Timeout
    for a blown watchdog, anything else for a real error).  Returns
    ``(status, msg)`` with status in {'pass', 'bounded', 'fail'}.  Every
    exception path — including a non-timeout error inside the bounded
    retry (missing 3× corpus dir, a DuckDB error, …) — records a FAIL
    for THIS query instead of propagating and aborting the whole sweep
    (ADVICE r9 / VERDICT r9 item 5); unit-tested in
    tests/test_sweep_classify.py by injecting each failure shape."""
    sf10 = SF10 if sf10 is None else sf10
    sf3 = SF3 if sf3 is None else sf3
    try:
        ok, msg = run(sf10, timeout)
        return ("pass", msg) if ok else ("fail", msg)
    except _Timeout:
        # oracle-side cost at 10× — bound the compare, don't skip it.
        # The bounded retry gets a doubled budget: the point is a
        # cost-bounded COMPARE, not a fast one (measured:
        # join_fuzzy_hamming_ids needs ~510s at 3×).
        try:
            ok, msg = run(sf3, 2 * timeout)
            if ok:
                return ("bounded", msg)
            return ("fail", f"3x after 10x timeout: {msg}")
        except _Timeout:
            return ("fail", "timeout at 10x AND 3x")
        except Exception as exc:  # noqa: BLE001
            return ("fail", f"3x retry {type(exc).__name__}: {exc}")
    except Exception as exc:  # noqa: BLE001
        return ("fail", f"{type(exc).__name__}: {exc}")


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import etl_utils_spark.queries  # noqa: F401 — registers the registry
    from etl_utils_spark.queries.registry import REGISTRY
    from oracle import compare_query, compare_types

    names = sys.argv[1:] or list(REGISTRY)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    signal.signal(signal.SIGALRM, _alarm)

    passed, bounded, skipped, failures = [], [], [], []
    t_all = time.time()
    for i, name in enumerate(names):
        q = REGISTRY[name]
        if name in HARD_SKIPS:
            skipped.append((name, HARD_SKIPS[name]))
            print(f"[{i+1}/{len(names)}] SKIP {name}: {HARD_SKIPS[name]}", flush=True)
            continue
        if name.endswith("_live"):
            skipped.append((name, _LIVE_REASON))
            print(f"[{i+1}/{len(names)}] SKIP {name}: streaming file-glob twin", flush=True)
            continue

        def _run(sf_dir, budget=TIMEOUT):
            # Two watchdogs: SIGALRM bounds the Spark/python side
            # (socket waits service signals promptly), and duck_budget
            # arms con.interrupt() for the oracle side — SIGALRM alone
            # can sit unserviced for MINUTES inside one DuckDB pipeline
            # (measured on the quadratic Hamming-join oracle).
            import duckdb

            t_start = time.time()
            signal.alarm(2 * budget)
            try:
                ok, msg = compare_query(
                    spark, sf_dir, name, bitwise=True, duck_budget=budget
                )
                if ok and q.oracle is not None:
                    ok, msg = compare_types(spark, sf_dir, name)
                return ok, msg
            except duckdb.InterruptException as exc:
                # the con.interrupt() watchdog — but only trust it as a
                # timeout if the budget actually elapsed; anything else
                # is a real failure wearing the same exception type
                if time.time() - t_start >= budget * 0.9:
                    raise _Timeout() from None
                raise RuntimeError(f"interrupted before budget: {exc}") from exc
            except RuntimeError as exc:
                # a pending SIGALRM landing mid-query surfaces as
                # DuckDB's "Query interrupted" RuntimeError
                if (
                    "query interrupted" in str(exc).lower()
                    and time.time() - t_start >= budget * 0.9
                ):
                    raise _Timeout() from None
                raise
            finally:
                signal.alarm(0)

        t0 = time.time()
        status, msg = classify(lambda sf, budget: _run(sf, budget=budget))
        dt = time.time() - t0
        if status == "pass":
            passed.append(name)
            print(f"[{i+1}/{len(names)}] PASS {name} ({dt:.1f}s)", flush=True)
        elif status == "bounded":
            bounded.append(name)
            print(
                f"[{i+1}/{len(names)}] BOUNDED-PASS {name} "
                f"(10x timeout; total {dt:.1f}s)",
                flush=True,
            )
        else:
            failures.append((name, msg))
            print(f"[{i+1}/{len(names)}] FAIL {name}: {msg}", flush=True)

    print(
        f"\ntotal {time.time()-t_all:.0f}s — {len(passed)} pass@10x, "
        f"{len(bounded)} bounded-pass@3x, {len(skipped)} skipped, "
        f"{len(failures)} failures"
    )
    for n, r in skipped:
        print(f"  skip {n}: {r}")
    for n, r in failures:
        print(f"  FAIL {n}: {r}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
