"""Per-key sequential recurrences (EWMA and friends) over
``applyInPandas``.

A recurrence y_i = f(x_i, y_{i-1}) is the one shape Catalyst's window
frames cannot express (each output depends on the previous OUTPUT, not
a fixed frame of inputs).  The scale-correct Spark formulation is a
single hash shuffle on the key followed by an Arrow-batched grouped-map
that runs the loop in numpy — per-group work is inherently sequential,
but groups parallelize across executors, which is exactly how a
1000-executor cluster wants 10^8 independent keys laid out.

Determinism contract: the loop computes ``alpha*x + (1-alpha)*prev`` in
that literal order so the IEEE-754 double result is bit-identical to a
SQL engine evaluating the same expression (the DuckDB recursive-CTE
oracle relies on this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


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

    One shuffle (groupBy key), Arrow transfer, numpy loop per group.
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

    def _run(pdf):
        pdf = pdf.sort_values(order_col, kind="mergesort")
        vals = pdf[value_col].to_numpy(dtype="float64")
        out = vals.copy()
        for i in range(1, len(out)):
            out[i] = a * vals[i] + b * out[i - 1]
        pdf[out_col] = out
        return pdf[cols]

    return df.groupBy(key_col).applyInPandas(_run, schema)
