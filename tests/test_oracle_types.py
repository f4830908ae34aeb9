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


def test_no_nested_output_columns_in_oracle_backed_queries(spark, sf_dir):
    """The driver's pandas canonicalizer hashes rows with
    sort_values/factorize, which CRASHES on array/map/struct cells
    (r4 red `map_funcs_events`; r2 red `array_advanced_ops`).  Every
    oracle-backed query must therefore emit SCALAR columns only —
    array_join nested values to CSV on both engine sides.  Schema-only
    sweep (lazy analysis, nothing executes)."""
    from pyspark.sql import types as T

    offenders = []
    for name in _names():
        schema = q.REGISTRY[name].fn(spark, sf_dir).schema
        nested = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if nested:
            offenders.append((name, nested))
    assert not offenders, offenders
