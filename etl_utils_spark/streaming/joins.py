"""Stream-stream joins (C10-adjacent): two event streams joined with
an equi-key plus a time-interval condition, watermarks bounding the
join state on both sides.

The canonical topology: purchases matched to the same user's clicks in
the preceding 10 minutes. State per side is bounded by (watermark +
interval) — without the time bound a stream-stream join's state grows
forever; the engine's API makes the bound mandatory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "10 minutes",
    watermark: str = "30 minutes",
    prefix: str = "r_",
) -> DataFrame:
    """INNER join: left row ↔ right rows of the same key with
    right_ts in (left_ts - lookback, left_ts]. Works identically on
    batch frames (no watermark applied) — the batch result is the
    streaming result's oracle."""
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    r = rw.select(
        F.col(on).alias(f"{prefix}{on}"),
        F.col(right_ts).alias(f"{prefix}{right_ts}"),
        *[
            F.col(c).alias(f"{prefix}{c}")
            for c in right.columns
            if c not in (on, right_ts)
        ],
    )
    cond = (
        (F.col(on) == F.col(f"{prefix}{on}"))
        & (F.col(f"{prefix}{right_ts}") <= F.col(left_ts))
        & (F.col(f"{prefix}{right_ts}") > F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
    )
    return lw.join(r, cond, "inner").drop(f"{prefix}{on}")
