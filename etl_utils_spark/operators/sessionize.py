"""Event-sequence operators: sessionization (batch analog of session
windows) and as-of joins (SURVEY.md §2 C10c, C1f-adjacent).

Both are window-function compositions — one shuffle on the entity key,
then linear per-partition work; the shapes that scale to 100 TB of
events because state per key is O(1), not O(events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event of the same user exceeds ``gap_seconds``.

    lag → boundary flag → running sum = session index (the classic
    gaps-and-islands composition). Deterministic ordering via the
    (ts, tiebreak) total order."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    micros = F.unix_micros(F.col(ts_col))
    gap_us = micros - F.lag(micros).over(w)
    is_new = F.when(gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), 1).otherwise(0)
    return df.withColumn("session_seq", F.sum(is_new).over(w))


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session aggregate: bounds, event count, value sum (exact
    decimal)."""
    s = sessionize(df, user_col, ts_col, gap_seconds)
    return s.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    right_ts <= left_ts (per ``on`` key), optionally within a
    tolerance.

    Implementation is the union-and-carry pattern: tag both sides,
    union on (key, ts), and carry the last right values forward with a
    running last_value window — ONE shuffle on the key, no range
    explosion (a join+filter+argmax would materialize every candidate
    pair; this never does). The standard streaming/asof shape used by
    time-series engines."""
    rcols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in [right_ts, *rcols]]).alias("s")).schema[
                "s"
            ].dataType
        ).alias("_r"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s")).schema[
                "s"
            ].dataType
        ).alias("_l"),
        F.struct(*[F.col(c) for c in [right_ts, *rcols]]).alias("_r"),
    )
    u = l_tag.unionByName(r_tag)
    # right rows sort before left rows at identical ts (_side 0 < 1),
    # so a right row at exactly left_ts is visible to that left row.
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_last_r", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        within = (
            F.unix_micros(F.col("_ts")) - F.unix_micros(F.col(f"_last_r.{right_ts}"))
        ) <= tolerance_seconds * 1_000_000
        out = out.withColumn("_last_r", F.when(within, F.col("_last_r")))
    sel = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    sel += [F.col(f"_last_r.{right_ts}").alias(f"right_{right_ts}")]
    sel += [F.col(f"_last_r.{c}").alias(f"right_{c}") for c in rcols]
    return out.select(*sel)
