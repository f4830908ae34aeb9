"""Local replica of the driver's t2 correctness gate.

Runs a registered query's Spark DataFrame and its DuckDB oracle SQL on
the same parquet fixtures and compares row count, sorted column names,
and order-insensitive values (floats compared to 9 significant digits,
timestamps normalized to naive datetimes).
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        # 9 significant digits — tolerates engine-level float formatting
        # differences while catching real numeric drift.
        return float(f"{v:.9g}")
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _normalize_rows(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        out.append(tuple(_norm(row[i]) for i in order))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare_query(spark, sf_dir: str, name: str):
    """Return (ok, message) for one registered query vs its oracle."""
    from etl_utils_spark.queries import REGISTRY

    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    if q.oracle is None:
        return (len(s_rows) >= 0, f"rows-only: {len(s_rows)} rows")

    con = duckdb_connect(sf_dir)
    try:
        res = con.execute(q.oracle)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()

    if sorted(s_cols) != sorted(d_cols):
        return (False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        return (False, f"rowcount mismatch: spark={len(s_rows)} duckdb={len(d_rows)}")

    sn = _normalize_rows(s_rows, s_cols)
    dn = _normalize_rows(d_rows, d_cols)
    if sn != dn:
        diff_i = next(i for i, (a, b) in enumerate(zip(sn, dn)) if a != b)
        return (
            False,
            "value mismatch at sorted row %d:\n  spark : %r\n  duckdb: %r"
            % (diff_i, sn[diff_i], dn[diff_i]),
        )
    return (True, f"ok: {len(s_rows)} rows")
