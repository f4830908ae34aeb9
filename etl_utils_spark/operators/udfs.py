"""User-defined function surface (SURVEY.md §2 C7a-C7c): Arrow-
vectorized pandas UDFs only — scalar, grouped-aggregate, and
grouped-map (applyInPandas). Row-at-a-time Python UDFs are deliberately
absent: at 100 TB the 10-100× Arrow batching advantage is the
difference between feasible and not.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.DoubleType())
def l2_norm(v: pd.Series) -> pd.Series:
    """C7a scalar pandas UDF: L2 norm of an array<float> column,
    vectorized over the Arrow batch."""
    import numpy as np

    return v.map(lambda x: float(np.sqrt(np.sum(np.square(np.asarray(x, dtype=np.float64))))))


@pandas_udf(T.DoubleType())
def mean_value(v: pd.Series) -> float:
    """C7b grouped-aggregate pandas UDF (used with groupBy().agg());
    the Series→scalar type hints mark it GROUPED_AGG.  Exact-sum
    discipline: elements quantize to integer cents with the shared
    floor(v*100+0.5) IEEE expression, the sum is exact int64, and the
    mean is ONE IEEE division — bit-identical to the SQL oracle's
    SUM(cents)/(n*100.0), where np.mean's pairwise float summation
    would drift at the ulp level."""
    import numpy as np

    cents = np.floor(v.to_numpy(np.float64) * 100.0 + 0.5).astype(np.int64)
    return float(cents.sum()) / (len(cents) * 100.0)


def zscore_per_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """C7c grouped-map via applyInPandas: per-group population z-score.
    The whole group arrives as ONE pandas DataFrame — the contract for
    custom per-group logic Spark can't express relationally."""
    schema = T.StructType(
        df.schema.fields + [T.StructField("zscore", T.DoubleType())]
    )

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        import numpy as np

        x = pdf[value_col].to_numpy(dtype=np.float64)
        # Exact-moment z-score: cents via the shared floor(x*100+0.5)
        # IEEE expression, exact integer n/S/Sxx, then the single
        # shared double expression (n*c - S)/sqrt(n*Sxx - S^2) — scale-
        # invariant (equals the dollars z-score for 2-decimal data) and
        # bit-identical to the SQL oracle, unlike np.mean/np.std whose
        # pairwise summation drifts at the ulp level.
        c = np.floor(x * 100.0 + 0.5).astype(np.int64)
        n = len(c)
        s = int(c.sum())
        sxx = int(np.dot(c, c))
        d = n * sxx - s * s
        pdf = pdf.copy()
        if d > 0:
            pdf["zscore"] = (n * c - s).astype(np.float64) / math.sqrt(float(d))
        else:
            pdf["zscore"] = 0.0
        return pdf

    return df.groupBy(group_col).applyInPandas(_z, schema)


def embedding_norms(emb: DataFrame) -> DataFrame:
    """vec_id + L2 norm through the scalar pandas UDF (rounded so the
    numpy pairwise summation and a sequential SQL sum agree)."""
    return emb.select("vec_id", F.round(l2_norm("embedding"), 6).alias("l2_norm"))


def cogrouped_conversion_lag(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """C7 cogrouped-map (groupBy().cogroup().applyInArrow): the two
    sides of a key arrive as a PAIR of per-key tables — the API for
    custom per-key two-table logic (merge_asof-style matching,
    per-entity reconciliation) that a relational join would have to
    materialize candidate pairs for.  Here: per user, count purchases
    and clicks and average the purchase→latest-preceding-click lag via
    a vectorized searchsorted — one co-shuffle on user_id, Arrow both
    ways, no pair explosion.

    r12 (guide §4.1/§4.2): the per-key frames now cross the boundary as
    ``pyarrow.Table`` pairs (``applyInArrow``) instead of pandas
    (``applyInPandas``).  The cogrouped-map surface and the arithmetic
    are unchanged — but the pandas serializer builds each 1-row result
    via ``pd.concat`` + block-manager construction PER KEY, which
    dominated the query (measured 6.4s → 0.93s at sf0.1/1500 keys,
    collected-row hashes identical).  Arrow table construction per key
    is ~50× cheaper, and the numpy kernel reads the Arrow buffers
    zero-copy.

    Scale bound: a cogrouped map still invokes Python ONCE PER KEY —
    fine for 10⁴-10⁶ users, a 10⁸ Python-round-trip wall at 10⁸ keys.
    At that scale prefer the pure relational as-of (union +
    last(click_ts) window + one groupBy; see
    conversion_lag_relational) or mapInArrow over frames co-sorted by
    (user_id, ts), both of which batch thousands of keys per Arrow
    exchange; this function is the declared C7c cogroup API surface,
    not the 100 TB plan.

    Cross-engine parity (docs/SCALE.md): the lag average is a
    small-denominator rational, so it is NEVER rounded — we return the
    single IEEE division of two exact integers (int64 microsecond lag
    sum / (match count · 10⁶)), which the oracle reproduces bit-for-bit
    with CAST(SUM(..us..) AS DOUBLE) / (COUNT(..) * 1000000.0).
    np.mean + round() was the r4 hash mismatch (pairwise vs sequential
    summation pre-round)."""
    schema = (
        "user_id long, n_purchases long, n_clicks long, avg_lag_s double"
    )

    def _lag(left: "pa.Table", right: "pa.Table") -> "pa.Table":
        import numpy as np
        import pyarrow as pa

        nl, nr = left.num_rows, right.num_rows
        uid = (left if nl else right).column("user_id")[0].as_py()
        avg = None
        # Spark 4.1 prunes unused input columns of a cogrouped map when
        # the caller discards output columns (e.g. df.count()): a frame
        # can arrive with rows but WITHOUT ``ts``. Guard on column
        # presence, not row count — the pruned output is discarded, so
        # skipping the lag computation is semantically free.
        has_ts = "ts" in left.column_names and "ts" in right.column_names
        if has_ts and nl and nr:
            cts = np.sort(
                right.column("ts")
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .astype("int64")
            )
            pts = (
                left.column("ts")
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .astype("int64")
            )
            idx = np.searchsorted(cts, pts, side="right") - 1
            ok = idx >= 0
            if ok.any():
                lag_us = pts[ok] - cts[idx[ok]]
                avg = int(lag_us.sum()) / (int(ok.sum()) * 1_000_000)
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "n_purchases": pa.array([nl], pa.int64()),
                "n_clicks": pa.array([nr], pa.int64()),
                "avg_lag_s": pa.array([avg], pa.float64()),
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInArrow(_lag, schema)
    )
