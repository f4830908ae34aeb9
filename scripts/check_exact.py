"""Bitwise oracle checker — the driver-hash-equivalent strictness.

The driver's per-round correctness gate hashes canonicalized values, so
two doubles that agree to 9 significant digits but differ in the last
ulp still mismatch (the round-5 ``stats_rolling_corr_price_qty`` red
shipped through exactly that gap).  ``tests/oracle.py:compare_query``
defaults to the 9-sig-digit compare; this script runs the SAME compare
with ``bitwise=True`` (IEEE-754 bit equality for floats, -0.0 distinct
from +0.0) at sf0.001 and sf0.01.

Usage::

    python scripts/check_exact.py name1 [name2 ...]   # named queries
    python scripts/check_exact.py --all               # every oracle-backed query
    python scripts/check_exact.py --sf /root/testdata/sf0.01 name1

Run this for EVERY new oracle-backed query before staging it in the
driver window (docs/SCALE.md §Cross-engine determinism records the
numeric laws that make queries pass it).  Exits nonzero on any failure.
"""

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="*", help="registered query names to check")
    ap.add_argument("--all", action="store_true", help="check every oracle-backed query")
    ap.add_argument(
        "--sf",
        action="append",
        help="fixture dir(s); default sf0.001 + sf0.01",
    )
    args = ap.parse_args()
    sf_dirs = args.sf or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

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

    if args.all:
        names = [n for n, q in REGISTRY.items() if q.oracle is not None]
    else:
        names = args.names
        unknown = [n for n in names if n not in REGISTRY]
        if unknown:
            print(f"unknown queries: {unknown}", file=sys.stderr)
            return 2
        rows_only = [n for n in names if REGISTRY[n].oracle is None]
        if rows_only:
            print(f"rows-only (no oracle, skipped): {rows_only}", file=sys.stderr)
            names = [n for n in names if n not in rows_only]
    if not names:
        print("nothing to check (pass names or --all)", file=sys.stderr)
        return 2

    failures = []
    for sf in sf_dirs:
        for i, name in enumerate(names):
            t0 = time.time()
            try:
                ok, msg = compare_query(spark, sf, name, bitwise=True)
                assert ok, msg
                ok, msg = compare_types(spark, sf, name)
                assert ok, msg
                print(f"[{sf}] PASS {name} ({time.time()-t0:.1f}s)", flush=True)
            except Exception as exc:  # noqa: BLE001
                failures.append((sf, name))
                print(f"[{sf}] FAIL {name}: {exc}", flush=True)
    print(f"{len(failures)} bitwise failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
