"""Per-key sequential recurrences (EWMA and friends) over
``mapInPandas``.

A recurrence y_i = f(x_i, y_{i-1}) is the one shape Catalyst's window
frames cannot express (each output depends on the previous OUTPUT, not
a fixed frame of inputs).  The scale-correct Spark formulation:

1. ONE hash shuffle on the key (``repartition(key)``) so each key's
   rows land in one partition,
2. a partition-local sort on (key, order) — no extra exchange,
3. ``mapInPandas`` scanning each partition once, restarting the
   recurrence at every key change and carrying state across Arrow
   batch boundaries (a key's rows may span batches).

This costs ONE Python call per Arrow batch instead of one per key —
the grouped-map (``applyInPandas``) formulation paid ~2ms of pandas
frame assembly per key, which at 1,500 keys was 3-5s and at 10^8 keys
would be catastrophic.  Per-group work is inherently sequential, but
partitions parallelize across executors.

Determinism contract: the loop computes ``alpha*x + (1-alpha)*prev``
in that literal order so the IEEE-754 double result is bit-identical
to a SQL engine evaluating the same expression (the DuckDB
recursive-CTE oracle relies on this).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _python_stage_partitions(
    df: DataFrame, target_bytes: int = 32 << 20
) -> int:
    """Data-proportional partition count for a mapInPandas stage.

    The r12 driver scaling block showed these stages running SLOWER
    with more cores (ewma c8/c32 = 0.67): the key-hash repartition
    inherits ``spark.sql.shuffle.partitions``, so tiny inputs fan out
    into dozens of Python tasks whose worker round-trip cost dwarfs
    the data (guide §4).  Size the stage from the INPUT instead: one
    Python task per ~``target_bytes`` of optimizer-estimated input, so
    a small frame runs as a handful of tasks at any core count and a
    100 TB frame still gets its thousands.  ``SPARK_GRAFT_PY_STAGE_PARTS``
    overrides for deployments that know their key cardinality."""
    v = os.environ.get("SPARK_GRAFT_PY_STAGE_PARTS")
    if v:
        return max(1, int(v))
    spark = df.sparkSession
    fallback = spark.sparkContext.defaultParallelism
    try:
        size = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:  # noqa: BLE001 — stats are an estimate, never fatal
        return fallback
    if size <= 0:
        return fallback
    return max(1, min(math.ceil(size / target_bytes), 1 << 16))


def ewma(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average per key, ordered by
    ``order_col``; the first observation seeds the average.

    ``order_col`` must be unique within a key for a deterministic
    result (true of the fixture's ``(user_id, ts)``).
    """
    out_fields = [f for f in df.schema.fields] + [
        T.StructField(out_col, T.DoubleType())
    ]
    schema = T.StructType(out_fields)
    cols = [f.name for f in out_fields]
    a = float(alpha)
    b = 1.0 - a

    def _run(batches):
        # carry across Arrow batches: partition order is (key, order),
        # so a key split over two batches continues seamlessly
        prev_key = None
        prev_ew = 0.0
        for pdf in batches:
            if not len(pdf):
                continue
            keys = pdf[key_col].tolist()
            vals = [float(v) for v in pdf[value_col].tolist()]
            out = []
            for k, x in zip(keys, vals):
                prev_ew = a * x + b * prev_ew if k == prev_key else x
                prev_key = k
                out.append(prev_ew)
            pdf = pdf.assign(**{out_col: out})
            yield pdf[cols]

    part = df.repartition(
        _python_stage_partitions(df), key_col
    ).sortWithinPartitions(key_col, order_col)
    return part.mapInPandas(_run, schema)


def cusum(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    drift: float = 5.0,
    out_col: str = "cusum",
) -> DataFrame:
    """One-sided CUSUM drift detector per key:
    ``s_i = max(0, s_{i-1} + x_i - drift)``, ``s_0 = 0`` — the
    classic change-point accumulator for streaming quality monitors.

    Same physical shape as :func:`ewma` (one key shuffle, partition-
    local sort, one ``mapInPandas`` scan, state carried across Arrow
    batches).  Determinism contract: the update is evaluated as
    ``max(0.0, (prev + x) - drift)`` so the IEEE-754 result is
    bit-identical to a SQL engine computing
    ``greatest(0, prev + x - drift)`` left-to-right.
    """
    out_fields = [f for f in df.schema.fields] + [
        T.StructField(out_col, T.DoubleType())
    ]
    schema = T.StructType(out_fields)
    cols = [f.name for f in out_fields]
    k = float(drift)

    def _run(batches):
        prev_key = None
        prev_s = 0.0
        for pdf in batches:
            if not len(pdf):
                continue
            keys = pdf[key_col].tolist()
            vals = [float(v) for v in pdf[value_col].tolist()]
            out = []
            for key, x in zip(keys, vals):
                if key != prev_key:
                    prev_s = 0.0
                prev_s = max(0.0, prev_s + x - k)
                prev_key = key
                out.append(prev_s)
            pdf = pdf.assign(**{out_col: out})
            yield pdf[cols]

    part = df.repartition(
        _python_stage_partitions(df), key_col
    ).sortWithinPartitions(key_col, order_col)
    return part.mapInPandas(_run, schema)


def holt_linear(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    level_col: str = "level",
    trend_col: str = "trend",
) -> DataFrame:
    """Holt double exponential smoothing (level + trend) per key:

    ``l_i = alpha*x_i + (1-alpha)*(l_{i-1} + b_{i-1})``
    ``b_i = beta*(l_i - l_{i-1}) + (1-beta)*b_{i-1}``

    seeded ``l_1 = x_1, b_1 = 0``.  A TWO-variable recurrence — the
    shape that proves the recurrence operator generalizes past scalar
    state (EWMA/CUSUM) without changing the physical plan: still one
    key shuffle, one partition-local sort, one ``mapInPandas`` scan.

    Determinism contract: updates are evaluated in the literal order
    ``alpha*x + (1-alpha)*(l + b)`` then ``beta*(l_new - l) +
    (1-beta)*b`` so the doubles are bit-identical to a SQL engine
    (DuckDB recursive CTE) evaluating the same expressions.
    """
    out_fields = [f for f in df.schema.fields] + [
        T.StructField(level_col, T.DoubleType()),
        T.StructField(trend_col, T.DoubleType()),
    ]
    schema = T.StructType(out_fields)
    cols = [f.name for f in out_fields]
    a = float(alpha)
    ac = 1.0 - a
    b = float(beta)
    bc = 1.0 - b

    def _run(batches):
        prev_key = None
        lev = 0.0
        trd = 0.0
        for pdf in batches:
            if not len(pdf):
                continue
            keys = pdf[key_col].tolist()
            vals = [float(v) for v in pdf[value_col].tolist()]
            out_l = []
            out_b = []
            for key, x in zip(keys, vals):
                if key != prev_key:
                    lev = x
                    trd = 0.0
                else:
                    new_l = a * x + ac * (lev + trd)
                    trd = b * (new_l - lev) + bc * trd
                    lev = new_l
                prev_key = key
                out_l.append(lev)
                out_b.append(trd)
            pdf = pdf.assign(**{level_col: out_l, trend_col: out_b})
            yield pdf[cols]

    part = df.repartition(
        _python_stage_partitions(df), key_col
    ).sortWithinPartitions(key_col, order_col)
    return part.mapInPandas(_run, schema)
