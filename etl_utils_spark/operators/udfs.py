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
    the Series→scalar type hints mark it GROUPED_AGG."""
    return float(v.mean())


def zscore_per_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """C7c grouped-map via applyInPandas: per-group population z-score.
    The whole group arrives as ONE pandas DataFrame — the contract for
    custom per-group logic Spark can't express relationally."""
    schema = T.StructType(
        df.schema.fields + [T.StructField("zscore", T.DoubleType())]
    )

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        x = pdf[value_col].to_numpy(dtype=np.float64)
        mu = x.mean() if len(x) else 0.0
        sd = x.std() if len(x) else 0.0
        pdf = pdf.copy()
        pdf["zscore"] = (x - mu) / sd if sd > 0 else 0.0
        return pdf

    return df.groupBy(group_col).applyInPandas(_z, schema)


def embedding_norms(emb: DataFrame) -> DataFrame:
    """vec_id + L2 norm through the scalar pandas UDF (rounded so the
    numpy pairwise summation and a sequential SQL sum agree)."""
    return emb.select("vec_id", F.round(l2_norm("embedding"), 6).alias("l2_norm"))
