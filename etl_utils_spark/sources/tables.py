"""Parquet table catalog over the driver fixtures (TESTDATA.md).

Scans stay declarative (``spark.read.parquet``) so Catalyst keeps
predicate pushdown, column pruning, and partition pruning — at 100 TB
these scans are the dominant cost and must stay prunable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
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

# Dimension tables small enough to broadcast at any realistic scale
# (region=5, nation=25 rows; bounded by geography, not by data volume).
BROADCAST_DIMS = ("region", "nation")


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Per-session PLAN-HANDLE cache: load_table resolves a table's schema
# by reading parquet footers, and the engine's query functions call it
# hundreds of times per process (measured ~0.09s per call — ~15% of a
# full bench run was footer re-reads).  A catalog-backed deployment
# resolves table metadata once; this dict is the same thing for the
# path-based fixtures.  It stores ONLY the lazy DataFrame (an
# unexecuted logical plan): no rows, no results — every action on it
# still scans the parquet inputs.  Weakly keyed by session so entries
# die with their SparkSession (DataFrames are session-bound and the
# events loader sets a per-session conf).
import weakref

_PLAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    per_session = _PLAN_CACHE.setdefault(spark, {})
    key = (os.path.abspath(sf_dir), name)
    df = per_session.get(key)
    if df is None:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if name == "events":
            df = _normalize_ntz(_load_events(spark, path))
        else:
            df = _normalize_ntz(spark.read.parquet(path))
        per_session[key] = df
    return df


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Normalize TIMESTAMP_NTZ columns to TIMESTAMP (instant semantics).

    The driver fixtures have shipped three on-disk timestamp flavors
    across rounds: TIMESTAMP(NANOS), tz-adjusted micros (read as
    TIMESTAMP), and naive micros (read as TIMESTAMP_NTZ since Spark 4
    infers NTZ from isAdjustedToUTC=false). The engine standardizes on
    TIMESTAMP: epoch arithmetic (``unix_micros``) is only defined for
    instants, and the session timezone is pinned to UTC
    (session.py), so the naive→instant cast is the identity mapping on
    wall-clock values — exactly what the DuckDB oracle computes on the
    same naive parquet values.
    """
    from pyspark.sql import functions as F

    ntz_cols = [name for name, dtype in df.dtypes if dtype == "timestamp_ntz"]
    if ntz_cols:
        df = df.withColumns(
            {name: F.col(name).cast("timestamp") for name in ntz_cols}
        )
    return df


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS) which Spark rejects
    ([PARQUET_TYPE_ILLEGAL]). Read nanos as long and truncate to
    microsecond timestamps (integer division — ns epochs exceed
    double's 2^53 mantissa, so no float path). DuckDB truncates
    ns→µs on read the same way, keeping the oracle exact."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(path)
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.select("event_id", "ts", "user_id", "event_type", "value", "props")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register fixture tables as temp views for spark.sql access."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def _parse_bytes(v: str) -> int:
    """Parse a Spark byte-size conf value ('134217728', '128m', '1g')."""
    v = v.strip().lower().rstrip("b")
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40)):
        if v.endswith(suffix):
            v = v[: -len(suffix)]
            mult = m
            break
    return int(float(v)) * mult


def estimated_scan_splits(df: DataFrame) -> int | None:
    """Estimated number of scan partitions for ``df``'s file source:
    ``sum(ceil(size / maxPartitionBytes))`` over its input files.

    File COUNT alone is the wrong spread signal — one LARGE splittable
    parquet already yields many scan partitions, and repartitioning it
    would add a gratuitous shuffle at scale; only a scan whose total
    estimated splits are few genuinely needs a repartition before
    per-row-heavy work (the single-small-file fixture case).  Returns
    None (caller should assume the input is already well split) for
    non-local URIs or unreadable paths — a remote object store at
    100 TB is many files by construction."""
    import math
    from urllib.parse import unquote, urlparse

    files = df.inputFiles()
    if not files:
        return 0
    max_bytes = _parse_bytes(
        df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    splits = 0
    for uri in files:
        p = urlparse(uri)
        if p.scheme not in ("file", ""):
            return None
        try:
            size = os.path.getsize(unquote(p.path))
        except OSError:
            return None
        splits += max(1, math.ceil(size / max_bytes))
    return splits
