"""Full pre-round-end rehearsal of the driver's t2 gate: run EVERY
registered query against its DuckDB oracle at sf0.01 with both the
value compare and the Arrow-type-family compare.  Exits nonzero on any
failure — run before ending a round.

``--bitwise`` upgrades the float compare from 9 significant digits to
exact IEEE-754 bit equality (the driver-hash-equivalent strictness; see
scripts/check_exact.py for the single-query form).  The round-close
protocol runs the bitwise form."""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from pyspark.sql import SparkSession

from oracle import compare_query, compare_types  # noqa: E402

BITWISE = "--bitwise" in sys.argv
if BITWISE:
    sys.argv.remove("--bitwise")

spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import etl_utils_spark.queries  # noqa: E402,F401
from etl_utils_spark.queries.registry import REGISTRY  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
failures = []
t_all = time.time()
for i, (name, q) in enumerate(REGISTRY.items()):
    t0 = time.time()
    try:
        if q.oracle is None:
            n = q.fn(spark, sf).count()
            status = f"rows-only n={n}"
        else:
            ok, msg = compare_query(spark, sf, name, bitwise=BITWISE)
            assert ok, msg
            ok, msg = compare_types(spark, sf, name)
            assert ok, msg
            status = "oracle-pass" + ("-bitwise" if BITWISE else "")
        print(f"[{i+1}/{len(REGISTRY)}] PASS {name} ({time.time()-t0:.1f}s {status})", flush=True)
    except Exception as exc:  # noqa: BLE001
        failures.append(name)
        print(f"[{i+1}/{len(REGISTRY)}] FAIL {name}: {type(exc).__name__}: {exc}", flush=True)
print(f"total {time.time()-t_all:.0f}s, {len(failures)} failures: {failures}")
sys.exit(1 if failures else 0)
