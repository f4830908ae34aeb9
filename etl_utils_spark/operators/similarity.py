"""Similarity search over embedding columns (north star C9a).

Two paths:
- ``cosine_topk_bruteforce`` — exact top-k: broadcast the (small) query
  set against the corpus; one scan, per-partition heaps via
  window row_number. The baseline and the verifier for approximations.
- ``cosine_topk_lsh`` — the scale path: random-hyperplane LSH (SimHash
  for vectors) assigns each corpus vector to buckets; queries probe
  only their own buckets. At 100 TB the corpus side stays partitioned
  by bucket (co-located via repartition on the bucket key) and each
  query touches a tiny fraction of the data. Deterministic
  hyperplanes (seeded per-index hashing of coordinates — no RNG state)
  keep results reproducible.

Vectors are cast to double before any arithmetic → bit-identical
results across engines (verified vs DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_utils_spark.operators.dedup import cosine, dvec


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Deterministic top-k: order by rounded cosine DESC then id ASC —
    the rounding makes rank stable under any sub-ulp engine noise."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cos_sim"), 9)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query set is broadcast (it is the small side by construction);
    the corpus is scanned once with no shuffle until the final
    per-query top-k."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), dvec(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), dvec(vec_col).alias("qv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos_sim"))
    )
    return _topk_per_query(scored, k)


def hyperplane_bucket(vec_col: Column, n_planes: int = 8, seed: str = "lsh") -> Column:
    """Random-hyperplane LSH bucket id (0..2^n_planes-1) for a vector.

    Plane p's coefficient for dimension d is a deterministic pseudo-
    random ±1/±3 derived from xxhash64(seed,p,d) — no RNG state, the
    same bucket function on every run and every engine."""
    def plane_sign(p: int) -> Column:
        # dot(vec, plane_p) where plane coefficients come from hashing
        # the (plane, dimension) pair; reduce over the vector.
        prods = F.zip_with(
            vec_col,
            F.transform(
                F.sequence(F.lit(0), F.size(vec_col) - 1),
                lambda d: (
                    F.pmod(
                        F.xxhash64(F.concat_ws(":", F.lit(seed), F.lit(p), d.cast("string"))),
                        F.lit(8),
                    ).cast("double")
                    - 3.5
                ),
            ),
            lambda x, y: x * y,
        )
        return F.aggregate(prods, F.lit(0.0), lambda a, v: a + v)

    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        bucket = bucket + F.when(plane_sign(p) > 0, F.lit(1 << p).cast("long")).otherwise(0)
    return bucket


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket.

    Recall trades against bucket count (2^n_planes); the bruteforce
    operator is the oracle for recall measurement. Corpus bucketing is
    a one-time repartition — amortized across every query batch."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), dvec(vec_col).alias("cv"))
    c = c.withColumn("bucket", hyperplane_bucket(F.col("cv"), n_planes)).repartition("bucket")
    q = queries.select(F.col(id_col).alias("query_id"), dvec(vec_col).alias("qv"))
    q = q.withColumn("bucket", hyperplane_bucket(F.col("qv"), n_planes))
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos_sim"))
    )
    return _topk_per_query(scored, k)
