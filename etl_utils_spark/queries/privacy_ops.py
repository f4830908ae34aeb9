"""Data-governance pack: the privacy-release checks a training-data
pipeline runs before publishing aggregates or corpora (complements
etl_audit's pseudonymize_user_ids / text redaction):

- ``privacy_k_anonymity_events`` — k-anonymity audit + enforcement in
  one statement: quasi-identifier groups with fewer than k distinct
  users are flagged suppressed (release would re-identify).
- ``privacy_dp_noisy_counts`` — ε-differentially-private count release
  with ORACLE-REPLAYABLE Laplace noise: the noise is the inverse-CDF
  transform of the repo's portable LCG uniform keyed on the released
  group, so both engines draw the identical "randomness" — the
  determinism trick behind the bootstrap/randomization queries applied
  to a privacy mechanism (docs/SCALE.md "Oracle-replayable
  randomness"; round AFTER the irrational ln map).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.operators.prng import lcg_uniform, lcg_uniform_sql
from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_K_ANON = 5


@query(
    "privacy_k_anonymity_events",
    oracle=f"""
        SELECT event_type,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_of_day,
               count(*) AS n_rows,
               count(DISTINCT user_id) AS n_users,
               (count(DISTINCT user_id) < {_K_ANON}) AS suppressed
        FROM events
        GROUP BY event_type, EXTRACT(hour FROM ts)
    """,
)
def privacy_k_anonymity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier (event_type,
    hour-of-day): a released group is k-anonymous only if ≥ k distinct
    users share it — smaller groups are flagged ``suppressed`` (the
    generalize-or-drop decision of a release pipeline).  ONE hash
    aggregate with an embedded count-distinct; the QI cardinality
    bounds the output (|types| × 24), so the frame is driver-safe at
    any data scale."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.hour("ts").cast("long").alias("hour_of_day"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .withColumn("suppressed", F.col("n_users") < _K_ANON)
    )


# Laplace(b=1/ε) noise from one uniform: u' = u - 0.5;
# noise = -b · sign(u') · ln(1 - 2|u'|).  u is the LCG uniform of the
# group's rank key, so the draw is a pure function of the released
# group — identical on both engines.  ε = 0.5 → b = 2.
_DP_B = 2.0
_DP_U = lcg_uniform_sql("grp_key", "0", 1)


@query(
    "privacy_dp_noisy_counts",
    oracle=f"""
        WITH g AS (
            SELECT event_type, count(*) AS true_n,
                   CAST(row_number() OVER (ORDER BY event_type) AS BIGINT)
                       AS grp_key
            FROM events GROUP BY event_type
        ),
        n AS (
            SELECT event_type, true_n,
                   ({_DP_U}) - 0.5 AS u2
            FROM g
        )
        SELECT event_type, true_n,
               ROUND(true_n + (-{_DP_B}) * sign(u2) * ln(1 - 2 * abs(u2)), 6)
                   AS noisy_n
        FROM n
    """,
)
def privacy_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP (ε=0.5) Laplace-mechanism count release per event type:
    noise = −b·sign(u−½)·ln(1−2|u−½|) with b = 1/ε and u the portable
    LCG uniform of the group's alphabetical rank — a REAL inverse-CDF
    Laplace draw whose replayability makes the mechanism testable
    (real deployments swap the LCG for a CSPRNG; the dataflow is
    identical).  The released-group frame is bounded by |event_type|,
    so the rank window is a no-op at scale; ln() is the irrational
    map → round 6 AFTER it (docs/SCALE.md)."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    g = (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("true_n"))
        .withColumn(
            "grp_key",
            F.row_number()
            .over(Window.orderBy("event_type"))
            .cast("long"),
        )
    )
    u2 = lcg_uniform(F.col("grp_key"), F.lit(0), 1) - 0.5
    noise = (-_DP_B) * F.signum(u2) * F.log(1 - 2 * F.abs(u2))
    return g.select(
        "event_type",
        "true_n",
        F.round(F.col("true_n") + noise, 6).alias("noisy_n"),
    )
