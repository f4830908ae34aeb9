"""Type-family parity between every Spark query schema and its DuckDB
oracle — the driver's value-hash is type-sensitive (r1: DuckDB HUGEINT
/ DECIMAL(38,0) from integer SUM hash-mismatched Spark's bigint even
with identical values), so the local gate must catch family-level
drift (decimal vs int, date vs timestamp, float32 vs float64) before
the driver does.  Plan-only for batch queries (Spark schema is lazy;
DuckDB DESCRIBE plans without executing); streaming _live queries do
run their stream once at sf0.001.
"""

from __future__ import annotations

import pytest

import etl_utils_spark.queries as q
from tests.oracle import compare_types


def _names():
    return sorted(n for n in q.REGISTRY if q.REGISTRY[n].oracle is not None)


@pytest.mark.parametrize("name", _names())
def test_query_types_match_oracle(spark, sf_dir, name):
    ok, msg = compare_types(spark, sf_dir, name)
    assert ok, f"{name}: {msg}"


# The nested-output-column guard (array/map/struct cells crash the
# driver's pandas canonicalizer — the r2 array_advanced_ops / r4
# map_funcs_events reds) lives INSIDE compare_types above, so the
# parametrized test covers it per query without constructing every
# frame a second time (gates and _live streams execute driver-side
# actions at construction, so a separate sweep would re-run them all).
