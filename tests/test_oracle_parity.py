"""Every registered query must match its DuckDB oracle on sf0.001 —
the local replica of the driver's t2 gate."""

from __future__ import annotations

import pytest

import etl_utils_spark.queries as q
from tests.oracle import compare_query


def _names():
    return sorted(q.REGISTRY)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_dir, name):
    ok, msg = compare_query(spark, sf_dir, name)
    assert ok, f"{name}: {msg}"
