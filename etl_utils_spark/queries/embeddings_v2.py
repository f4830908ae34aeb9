"""Embedding-space analytics v2 (round 4): per-label centroids and
centroid separation — the cluster-health metrics an embedding-dedup /
ANN pipeline monitors alongside recall.

Scale posture: centroids are ONE hash aggregate over (label, dim)
after a posexplode — fan-out factor = embedding dim (64), the standard
columnar decomposition of vector math into engine-native aggregates
(no UDF, stays in whole-stage codegen).  The separation matrix is
labels x labels over the tiny centroid table — broadcast territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table as _t


@query(
    "embedding_centroids_by_label",
    oracle="""
        WITH flat AS (
            SELECT label,
                   generate_subscripts(embedding, 1) AS dim,
                   CAST(unnest(embedding) AS DOUBLE) AS e
            FROM embeddings
        )
        SELECT CAST(label AS BIGINT) AS label,
               CAST(dim AS BIGINT) AS dim,
               CAST(count(*) AS BIGINT) AS n_vectors,
               CAST(SUM(CAST(floor(e * 1048576.0 + 0.5) AS BIGINT)) AS DOUBLE)
                   / (CAST(count(*) AS DOUBLE) * 1048576.0) AS centroid
        FROM flat GROUP BY label, dim
    """,
)
def embedding_centroids_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors via posexplode + hash aggregate —
    vector averaging decomposed into (label, dim) scalar aggregates so
    Catalyst vectorizes it end-to-end (no Python UDF, no array state).
    At 100 TB this is one shuffle keyed by (label, dim): cardinality
    labels x 64, tiny reduce state."""
    emb = _t(spark, sf_dir, "embeddings")
    flat = emb.select(
        F.col("label").cast("long").alias("label"),
        F.posexplode("embedding").alias("pos", "e"),
    ).select(
        "label",
        (F.col("pos") + 1).cast("long").alias("dim"),  # 1-based like SQL
        F.col("e").cast("double").alias("e"),
    )
    # Mean of floats is summation-order-dependent (a ROUND on top is
    # the r5 red class): quantize each element at 2^-20 with the shared
    # floor(e*2^20+0.5) IEEE expression (exact — power-of-two scaling
    # of a float32 never rounds), sum as exact BIGINT, divide once.
    q = F.floor(F.col("e") * 1048576.0 + 0.5).cast("long")
    return flat.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        (
            F.sum(q).cast("double")
            / (F.count(F.lit(1)).cast("double") * 1048576.0)
        ).alias("centroid"),
    )


@query(
    "centroid_separation_by_label",
    oracle="""
        WITH flat AS (
            SELECT label,
                   generate_subscripts(embedding, 1) AS dim,
                   CAST(unnest(embedding) AS DOUBLE) AS e
            FROM embeddings
        ),
        cent AS (
            SELECT label, dim,
                   CAST(floor(
                       CAST(SUM(CAST(floor(e * 1048576.0 + 0.5) AS BIGINT))
                            AS DOUBLE)
                       / (CAST(count(*) AS DOUBLE) * 1048576.0) * 1000000.0
                       + 0.5) AS BIGINT) AS cq
            FROM flat GROUP BY label, dim
        )
        SELECT CAST(a.label AS BIGINT) AS label_a,
               CAST(b.label AS BIGINT) AS label_b,
               sqrt(CAST(SUM((a.cq - b.cq) * (a.cq - b.cq)) AS DOUBLE))
                   / 1000000.0 AS euclidean_dist
        FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
        GROUP BY a.label, b.label
    """,
)
def centroid_separation_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Euclidean distance between label centroids — the
    between-cluster separation half of a cluster-quality report.  The
    pairwise join runs on the CENTROID table (labels x dim rows), never
    on the raw vectors, so it is constant-size regardless of corpus
    scale."""
    emb = _t(spark, sf_dir, "embeddings")
    flat = emb.select(
        F.col("label").cast("long").alias("label"),
        F.posexplode("embedding").alias("pos", "e"),
    ).select(
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.col("e").cast("double").alias("e"),
    )
    # Deterministic centroids: exact BIGINT sums of 2^-20-quantized
    # elements, one IEEE division, then the centroid itself quantized
    # at 1e-6 to a BIGINT so the pairwise distance sums EXACT integers
    # (bounded by the quantization grid — overflow-free at any corpus
    # scale) instead of order-dependent doubles; sqrt + one division
    # at the very end, shared IEEE on both engines.
    qe = F.floor(F.col("e") * 1048576.0 + 0.5).cast("long")
    cent = flat.groupBy("label", "dim").agg(
        F.floor(
            F.sum(qe).cast("double")
            / (F.count(F.lit(1)).cast("double") * 1048576.0)
            * 1000000.0
            + 0.5
        )
        .cast("long")
        .alias("cq")
    )
    a = cent.alias("a")
    b = cent.alias("b")
    d = F.col("a.cq") - F.col("b.cq")
    return (
        a.join(
            b,
            (F.col("a.dim") == F.col("b.dim")) & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b")
        )
        .agg(
            (F.sqrt(F.sum(d * d).cast("double")) / 1000000.0).alias(
                "euclidean_dist"
            )
        )
    )


@query(
    "kmeans_embed_lloyd2",
    oracle="""
        WITH flat AS (
            SELECT vec_id,
                   generate_subscripts(embedding, 1) AS dim,
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                              * 1048576.0 + 0.5) AS BIGINT) AS qv
            FROM embeddings
        ),
        c0 AS (SELECT vec_id AS cid, dim, qv AS qc FROM flat
               WHERE vec_id < 8),
        d1 AS (
            SELECT f.vec_id, c.cid,
                   SUM((f.qv - c.qc) * (f.qv - c.qc)) AS dist
            FROM flat f JOIN c0 c USING (dim)
            GROUP BY f.vec_id, c.cid
        ),
        a1 AS (
            SELECT vec_id, CAST(min(dist * 8 + cid) % 8 AS BIGINT) AS cid
            FROM d1 GROUP BY vec_id
        ),
        c1 AS (
            SELECT a.cid, f.dim,
                   CAST(floor(CAST(SUM(f.qv) AS DOUBLE)
                              / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT)
                       AS qc
            FROM flat f JOIN a1 a USING (vec_id)
            GROUP BY a.cid, f.dim
        ),
        d2 AS (
            SELECT f.vec_id, c.cid,
                   SUM((f.qv - c.qc) * (f.qv - c.qc)) AS dist
            FROM flat f JOIN c1 c USING (dim)
            GROUP BY f.vec_id, c.cid
        ),
        a2 AS (SELECT vec_id, min(dist * 8 + cid) AS k FROM d2
               GROUP BY vec_id)
        SELECT CAST(k % 8 AS BIGINT) AS cluster_id,
               count(*)::BIGINT AS n_members,
               SUM(CAST((k - (k % 8)) / 8.0 AS BIGINT))::BIGINT AS inertia
        FROM a2 GROUP BY 1
    """,
)
def kmeans_embed_lloyd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (k=8, two full Lloyd iterations) over the
    embedding corpus, HASH-CERTIFIED against an oracle that replays
    the identical iterations in SQL — possible because every step is
    exact integer arithmetic: elements quantize to the 2^-20 grid
    (float32 x power-of-two is exact), squared distances are exact
    BIGINT sums, argmin packs (dist, cid) into dist*8+cid so the
    min + tie-break (lowest cid) is ONE integer min, and updated
    centroids re-quantize via floor(sum/n + 0.5) — a single shared
    IEEE division whose inputs are identical on both engines.  The
    output (cluster sizes + exact-integer inertia after the second
    assignment) is integer-only: nothing to round, nothing
    engine-specific.  IVF/PQ already run Lloyd internally (rows-only
    by SQL-inexpressibility of their sampled init); this query is the
    certifiable face of the same operator.

    100 TB shape: per iteration, ONE broadcast join against the
    k x dim centroid table (512 rows) and one partial-aggregated
    shuffle keyed by (vec_id, cid) — the canonical distributed Lloyd;
    no driver-side collect anywhere (centroids stay a DataFrame).
    Empty clusters simply drop out of the centroid table, identically
    on both engines.  The /8.0 inertia unpack is exact: dividing a
    <2^53 integer double by a power of two never rounds."""
    emb = _t(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "e")
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.floor(F.col("e").cast("double") * 1048576.0 + 0.5)
        .cast("long")
        .alias("qv"),
    ).localCheckpoint(eager=True)  # reused by both assign and both update passes
    c0 = flat.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), "dim", F.col("qv").alias("qc")
    )

    def assign(cent: DataFrame) -> DataFrame:
        diff = F.col("qv") - F.col("qc")
        d = (
            flat.join(F.broadcast(cent), "dim")
            .groupBy("vec_id", "cid")
            .agg(F.sum(diff * diff).alias("dist"))
        )
        return d.groupBy("vec_id").agg(
            F.min(F.col("dist") * 8 + F.col("cid")).alias("k")
        )

    a1 = assign(c0).select("vec_id", (F.col("k") % 8).alias("cid"))
    c1 = (
        flat.join(a1, "vec_id")
        .groupBy("cid", "dim")
        .agg(
            F.floor(
                F.sum("qv").cast("double")
                / F.count(F.lit(1)).cast("double")
                + 0.5
            )
            .cast("long")
            .alias("qc")
        )
    )
    a2 = assign(c1)
    return a2.groupBy((F.col("k") % 8).cast("long").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(((F.col("k") - (F.col("k") % 8)) / 8.0).cast("long"))
        .cast("long")
        .alias("inertia"),
    )
