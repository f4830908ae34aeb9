"""Time named queries standalone at $SPARK_GRAFT_SF_DIR with the bench's
session and action (count()), N reps each (median printed).  For quick
A/B during optimization — the committed record stays bench.py.

Usage: python scripts/time_queries.py [-n REPS] name1 name2 ...
"""

from __future__ import annotations

import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from etl_utils_spark.session import get_spark

    spark = get_spark(
        app_name="time-queries",
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

    for name in args:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).count()
            ts.append(time.perf_counter() - t0)
        print(
            f"{name:46} med {statistics.median(ts):6.3f}  "
            f"min {min(ts):6.3f}  runs {[round(t, 3) for t in ts]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
