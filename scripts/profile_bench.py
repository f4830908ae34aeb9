"""Per-query cost split: construction (Python+driver actions inside the
query fn) vs execution (the bench's count() action) vs a second
execution (warm re-run, isolates one-time costs like codegen compile).

The bench total at sf0.1 is fixed-overhead dominated (~0.5s/query over
346 queries); this script attributes that overhead so optimization
targets the right layer (guide §1: measure first).

Usage::

    python scripts/profile_bench.py                # all benched queries
    python scripts/profile_bench.py name1 name2    # named queries
    python scripts/profile_bench.py --top 40       # slowest N from BENCH_local.json

Writes /tmp/profile_bench.json: {name: {"construct": s, "exec": s,
"exec2": s, "jobs_construct": n, "jobs_exec": n}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    top_n = None
    if "--top" in args:
        i = args.index("--top")
        top_n = int(args[i + 1])
        del args[i : i + 2]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from etl_utils_spark.session import get_spark

    spark = get_spark(
        app_name="profile-bench",
        cpus=cpus,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "32g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from etl_utils_spark.queries import REGISTRY
    from etl_utils_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:  # noqa: BLE001
            pass

    def _excluded(name: str) -> bool:
        return name == "profile_all_tables_rowcounts" or name.startswith(
            ("gate_", "diag_")
        )

    if args:
        names = args
    else:
        names = sorted(n for n in REGISTRY if not _excluded(n))
        if top_n:
            try:
                prev = json.load(open(os.path.join(_REPO, "BENCH_local.json")))
                ranked = sorted(
                    prev["queries"].items(), key=lambda kv: -kv[1]
                )
                names = [n for n, _ in ranked[:top_n] if n in REGISTRY]
            except Exception:  # noqa: BLE001
                names = names[:top_n]

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def _njobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    out: dict[str, dict[str, float]] = {}
    for name in names:
        q = REGISTRY[name]
        j0 = _njobs()
        t0 = time.perf_counter()
        try:
            df = q.fn(spark, sf_dir)
            t1 = time.perf_counter()
            j1 = _njobs()
            df.count()
            t2 = time.perf_counter()
            j2 = _njobs()
            # warm re-run: fresh construction + count (codegen caches warm)
            df2 = q.fn(spark, sf_dir)
            df2.count()
            t3 = time.perf_counter()
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": str(exc)[:200]}  # type: ignore[dict-item]
            continue
        out[name] = {
            "construct": round(t1 - t0, 3),
            "exec": round(t2 - t1, 3),
            "exec2": round(t3 - t2, 3),
            "total": round(t2 - t0, 3),
            "jobs_construct": j1 - j0,
            "jobs_exec": j2 - j1,
        }
        print(
            f"{name:45s} cons={t1-t0:6.2f}s exec={t2-t1:6.2f}s "
            f"rerun={t3-t2:6.2f}s jobs={j1-j0}+{j2-j1}",
            flush=True,
        )

    with open("/tmp/profile_bench.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote /tmp/profile_bench.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
