"""Custom stateful streaming (SURVEY.md §2 C10 'custom stateful
operators'): applyInPandasWithState — arbitrary per-key state the
built-in windows can't express.

The example operator keeps a running per-user event count + value sum.
State is O(1) per key (two numbers); the same code processes a live
stream incrementally and a backfill (AvailableNow) identically — which
is exactly why its single-batch result can be hash-checked against a
plain batch aggregate.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, s long"


def _update_user_counts(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    # State carries EXACT integer cents (shared floor(v*100+0.5) IEEE
    # quantization): float-sum state + python round(s, 2) drifts from
    # any SQL oracle at the ulp level and round() half-even diverges
    # from SQL ROUND on ties; the integer state is associative across
    # micro-batches and the final /100.0 is one shared IEEE division.
    import numpy as np

    n, s = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents = np.floor(
            pdf["value"].to_numpy(dtype="float64") * 100.0 + 0.5
        ).astype(np.int64)
        s += int(cents.sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [s / 100.0]}
    )


EWMA_OUTPUT_SCHEMA = "user_id long, event_id long, ts timestamp, value double, ewma double"
EWMA_STATE_SCHEMA = "ew double"


def _update_ewma(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    # state = last EWMA carried across micro-batches; absent until the
    # key's first event.  Same literal op order as the batch operator
    # (operators/recurrence.py) → bit-identical doubles.
    seeded = state.exists
    ew = state.get[0] if seeded else 0.0
    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("ts", kind="mergesort")
    out = []
    for x in pdf["value"].to_numpy(dtype="float64"):
        ew = (0.5 * x + 0.5 * ew) if seeded else float(x)
        seeded = True
        out.append(ew)
    state.update((float(ew),))
    pdf = pdf.assign(user_id=key[0], ewma=out)
    yield pdf[["user_id", "event_id", "ts", "value", "ewma"]]


def running_ewma(events: DataFrame) -> DataFrame:
    """Streaming EWMA (alpha=0.5) per user: O(1) state per key (the
    last average), each micro-batch's events folded in ts order.  On a
    batch DataFrame falls back to the grouped-map recurrence operator
    (same output contract)."""
    if not events.isStreaming:
        from etl_utils_spark.operators.recurrence import ewma

        return ewma(
            events.select("user_id", "event_id", "ts", "value"),
            "user_id", "ts", "value", alpha=0.5,
        )
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_ewma,
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


CUSUM_OUTPUT_SCHEMA = "user_id long, event_id long, ts timestamp, value double, cusum double"
CUSUM_STATE_SCHEMA = "s double"


def _make_update_cusum(drift: float):
    k = float(drift)

    def _update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        # state = last accumulator value; 0 before the key's first
        # event.  Same literal op order as the batch operator
        # (operators/recurrence.py:cusum) → bit-identical doubles.
        s = state.get[0] if state.exists else 0.0
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("ts", kind="mergesort")
        out = []
        for x in pdf["value"].to_numpy(dtype="float64"):
            s = max(0.0, s + x - k)
            out.append(s)
        state.update((float(s),))
        pdf = pdf.assign(user_id=key[0], cusum=out)
        yield pdf[["user_id", "event_id", "ts", "value", "cusum"]]

    return _update


def running_cusum(events: DataFrame, drift: float = 5.0) -> DataFrame:
    """Streaming one-sided CUSUM drift detector per user
    (``s_i = max(0, s_{i-1} + x_i - drift)``): O(1) state per key, the
    change-point monitor shape for live data-quality alerting.  On a
    batch DataFrame falls back to the mapInPandas recurrence operator
    (same output contract)."""
    if not events.isStreaming:
        from etl_utils_spark.operators.recurrence import cusum

        return cusum(
            events.select("user_id", "event_id", "ts", "value"),
            "user_id", "ts", "value", drift=drift,
        ).select("user_id", "event_id", "ts", "value", "cusum")
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_cusum(drift),
            outputStructType=CUSUM_OUTPUT_SCHEMA,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_counts(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum) via custom state. On a
    batch DataFrame falls back to the equivalent aggregate (same
    output contract)."""
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long")).cast(
                    "double"
                )
                / 100.0
            ).alias("sum_value"),
        )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_counts,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ------------------------------------------------ streaming funnel

FUNNEL_OUTPUT_SCHEMA = "user_id long, t1 long, t2 long, t3 long"
FUNNEL_STATE_SCHEMA = "t1 long, t2 long, t3 long"
FUNNEL_WINDOW_US = 7 * 86400000000  # 7 days per step, in microseconds

_FUNNEL_STAGES = {"signup": 0, "click": 1, "purchase": 2}


def _update_funnel(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    # State = the user's greedy-earliest funnel stage times in exact
    # integer microseconds (-1 = not reached): signup -> first click
    # within 7 days of t1 -> first purchase within 7 days of t2.
    # Events fold in (ts, stage) order so a same-instant
    # signup->click->purchase chain counts, matching the batch
    # oracle's inclusive >= bounds.
    t1, t2, t3 = state.get if state.exists else (-1, -1, -1)
    pdf = pd.concat(list(pdfs), ignore_index=True)
    stage = pdf["event_type"].map(_FUNNEL_STAGES).fillna(3).astype("int64")
    pdf = pdf.assign(_stage=stage).sort_values(
        ["tus", "_stage"], kind="mergesort"
    )
    for tus, st in zip(pdf["tus"].to_numpy("int64"), pdf["_stage"].to_numpy()):
        tus = int(tus)
        if st == 0 and t1 < 0:
            t1 = tus
        elif st == 1 and t2 < 0 and t1 >= 0 and t1 <= tus <= t1 + FUNNEL_WINDOW_US:
            t2 = tus
        elif st == 2 and t3 < 0 and t2 >= 0 and t2 <= tus <= t2 + FUNNEL_WINDOW_US:
            t3 = tus
    state.update((t1, t2, t3))
    yield pd.DataFrame(
        {
            "user_id": pd.array([key[0]], dtype="Int64"),
            "t1": pd.array([t1 if t1 >= 0 else None], dtype="Int64"),
            "t2": pd.array([t2 if t2 >= 0 else None], dtype="Int64"),
            "t3": pd.array([t3 if t3 >= 0 else None], dtype="Int64"),
        }
    )


def running_funnel(events: DataFrame) -> DataFrame:
    """Streaming greedy-earliest funnel (signup -> click -> purchase,
    7-day window per step): O(1) state per user (three integer
    timestamps), folded incrementally per micro-batch — the live
    product-analytics counterpart of ``funnel_conversion_windowed``
    (queries/behavioral.py).  Works only on streaming input; batch
    funnels should use the keyed-aggregate formulation directly."""
    from pyspark.sql import functions as F

    return (
        events.select(
            "user_id", "event_type", F.unix_micros("ts").alias("tus")
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
