"""Semantic-dedup & prototype-pruning pack (round 9, ≤5-addition cap):

- ``dedup_semdedup_prune`` — SemDeDup-style semantic deduplication
  (Abbas et al., 2023, arXiv:2303.09540): within each embedding
  cluster, elect one keeper and flag every other member whose
  cosine-to-centroid clears the duplication threshold.  This is the
  LINEAR scale path for semantic dedup — each vector is compared to
  its cluster CENTROID only (k·d-sized frame), never pairwise, so
  the cost is one map-side-combinable aggregate per vector
  regardless of duplicate density.  The quadratic pairwise face of
  the same capability is the existing ``dedup_embeddings_cosine``.
- ``prune_prototypes_percluster`` — prototypicality pruning
  (Sorscher et al., NeurIPS 2022 "Beyond neural scaling laws"):
  drop the most prototypical quartile of every cluster (the vectors
  closest to their centroid carry the least marginal training
  signal on large corpora) and keep the informative tail.

Both queries cluster by the fixture's ``label`` column; in the full
pipeline the assignment step is the already-certified k-means face
(``kmeans_embed_lloyd2``) — the operator under test here is the
centroid-similarity election/pruning, not the clustering.

Determinism (docs/SCALE.md float policy): every element is quantized
once onto the 2^-20 grid (exact for float32), the centroid is
re-quantized onto the SAME grid (the ``centroid_separation_by_label``
idiom), so per-vector dot products and norms are EXACT int64 sums
bounded by the GRID (≤ 64·2^40 ≈ 2^46), not by corpus size.  That
bound ASSUMES |element| ≤ 1 (quantized magnitude ≤ 2^20): the fixture
embeddings satisfy it (components in [-1, 1] by generation), and a
deployment feeding unnormalized vectors must rescale first — past the
bound the two engines diverge rather than both failing loudly,
because DuckDB widens SUM(BIGINT) to HUGEINT (int128) while ANSI
Spark stays int64 and aborts (DuckDB succeeds where Spark raises).
The one corpus-bounded integer is the centroid's SUM(qv) per
(label, dim): it overflows Spark's int64 only past ~2^43 rows in a
single cluster (ANSI aborts loudly, never silently — DuckDB again
widens instead) and stays double-exact below 2^33 rows/cluster — both
orders of magnitude beyond a 100 TB / 64-dim corpus.  The cosine is one shared IEEE expression over sub-2^53
integers, with the zero-norm convention cos := 0.0 CASE-matched on
both engines (ANSI Spark would otherwise raise DIVIDE_BY_ZERO where
DuckDB yields NULL); ranking ties break on vec_id for a total order.

Scale shape: one posexplode (no shuffle), one (label, dim) aggregate
whose state is k×64 rows, that tiny centroid frame broadcast back,
one per-vector aggregate with map-side combine.  The keeper election
is a k-row ``max_by`` aggregate, NOT a window over the corpus — at
100 TB a per-cluster window would funnel n/k rows through single
partitions; the aggregate form keeps the reduce state at k rows.
Reference parity: capability-surface tier (SURVEY.md §2, LLM-pipeline
dedup family; query_wrapper.sql:255 delegated-SQL tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table

_GRID = 1048576.0  # 2^20 — shared element-quantization grid
_TAU = 0.30  # semantic-duplicate threshold on cosine-to-centroid

# Shared oracle CTE chain: 2^-20-quantized elements, grid-requantized
# centroid, exact-int64 dot/norms, one IEEE cosine at the end.
_COS_CTES = f"""
    WITH flat AS (
        SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {_GRID} + 0.5)
                    AS BIGINT) AS qv
        FROM embeddings
    ),
    cent AS (
        SELECT label, dim,
               CAST(floor(CAST(SUM(qv) AS DOUBLE)
                          / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS cq
        FROM flat GROUP BY label, dim
    ),
    nc AS (SELECT label, SUM(cq * cq) AS nc FROM cent GROUP BY label),
    pv AS (
        SELECT f.vec_id, f.label,
               SUM(f.qv * c.cq) AS dot, SUM(f.qv * f.qv) AS nv
        FROM flat f JOIN cent c ON f.label = c.label AND f.dim = c.dim
        GROUP BY f.vec_id, f.label
    ),
    cosv AS (
        SELECT vec_id, label,
               CASE WHEN nv = 0 OR nc.nc = 0 THEN 0.0
                    ELSE CAST(dot AS DOUBLE)
                         / (sqrt(CAST(nv AS DOUBLE))
                            * sqrt(CAST(nc.nc AS DOUBLE)))
               END AS cos_centroid
        FROM pv JOIN nc USING (label)
    )
"""


def _cos_to_centroid(
    spark: SparkSession, sf_dir: str, checkpoint: bool = True
) -> DataFrame:
    """(vec_id, label, cos_centroid) with the exact-grid arithmetic above.

    ``checkpoint=False`` keeps the full lineage so the plan-quality
    tests can gate the broadcast/aggregate shape that the eager
    checkpoints otherwise hide behind an RDD scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.posexplode("embedding").alias("pos", "e"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("e").cast("double") * _GRID + 0.5).cast("long").alias("qv"),
    )
    # cent is k×64 rows but its lineage is the corpus-scale explode +
    # aggregate, and it is consumed TWICE (nc and pv); cosv itself is
    # consumed twice by the semdedup keeper election.  localCheckpoint
    # both (order_stats.py idiom).  Cost model: the flat explode still
    # evaluates twice — once materializing cent, once on pv's probe
    # side — but the checkpoints remove the DUPLICATE aggregate build
    # inside the cosv job and the double evaluation of cosv itself
    # (un-checkpointed, the plan rebuilt the corpus pipeline up to 12
    # scans deep).  cent's materialized size is grid-bounded (k×64
    # rows); cosv is a 3-column corpus frame, far cheaper to persist
    # than to rebuild through the 64×-wider posexplode pipeline.
    cent = flat.groupBy("label", "dim").agg(
        F.floor(
            F.sum("qv").cast("double") / F.count(F.lit(1)).cast("double") + 0.5
        )
        .cast("long")
        .alias("cq")
    )
    if checkpoint:
        cent = cent.localCheckpoint(eager=True)
    nc = cent.groupBy("label").agg(F.sum(F.col("cq") * F.col("cq")).alias("nc"))
    pv = (
        flat.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("qv") * F.col("cq")).alias("dot"),
            F.sum(F.col("qv") * F.col("qv")).alias("nv"),
        )
    )
    cosv = pv.join(F.broadcast(nc), "label").select(
        "vec_id",
        "label",
        F.when((F.col("nv") == 0) | (F.col("nc") == 0), F.lit(0.0))
        .otherwise(
            F.col("dot").cast("double")
            / (
                F.sqrt(F.col("nv").cast("double"))
                * F.sqrt(F.col("nc").cast("double"))
            )
        )
        .alias("cos_centroid"),
    )
    return cosv.localCheckpoint(eager=True) if checkpoint else cosv


@query(
    "dedup_semdedup_prune",
    oracle=_COS_CTES
    + f""",
    rnk AS (
        SELECT vec_id, label, cos_centroid,
               row_number() OVER (PARTITION BY label
                                  ORDER BY cos_centroid DESC, vec_id) AS rn
        FROM cosv
    )
    SELECT CAST(label AS BIGINT) AS cluster_id, vec_id, cos_centroid,
           CAST(cos_centroid >= {_TAU} AND rn > 1 AS BIGINT) AS is_dup
    FROM rnk
    """,
)
def dedup_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup centroid-similarity semantic dedup: per cluster, the
    max-cosine vector (tie: min vec_id) is the keeper; every OTHER
    member at cos_centroid >= tau is flagged ``is_dup``.  Keeper
    election is a k-row max_by aggregate broadcast back — the oracle's
    window formulation is semantically identical (the rank-1 row always
    has the cluster's max cosine, so "rn > 1" == "vec_id != keeper"),
    but the aggregate form is the one that survives 100 TB."""
    cosv = _cos_to_centroid(spark, sf_dir)
    # keeper = argmax(cos_centroid), tie-break min vec_id: max over the
    # (cos, -vec_id) struct picks highest cosine then lowest vec_id.
    keep = cosv.groupBy("label").agg(
        F.max_by("vec_id", F.struct(F.col("cos_centroid"), -F.col("vec_id"))).alias(
            "keeper_id"
        )
    )
    return cosv.join(F.broadcast(keep), "label").select(
        F.col("label").alias("cluster_id"),
        "vec_id",
        "cos_centroid",
        ((F.col("cos_centroid") >= F.lit(_TAU)) & (F.col("vec_id") != F.col("keeper_id")))
        .cast("long")
        .alias("is_dup"),
    )


@query(
    "prune_prototypes_percluster",
    oracle=_COS_CTES
    + """,
    rnk AS (
        SELECT vec_id, label, cos_centroid,
               row_number() OVER (PARTITION BY label
                                  ORDER BY cos_centroid DESC, vec_id) AS rn,
               count(*) OVER (PARTITION BY label) AS n
        FROM cosv
    )
    SELECT CAST(label AS BIGINT) AS cluster_id, vec_id, cos_centroid
    FROM rnk
    WHERE rn > (n + 3) // 4
    """,
)
def prune_prototypes_percluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototype pruning: drop the ceil(n/4) most prototypical members
    of each cluster (highest cosine-to-centroid, ties on vec_id) and
    keep the informative tail.  The exact per-cluster rank cut needs a
    total order within the cluster, so this face uses the per-cluster
    window (k = 10 labels here); at 100 TB-scale k the same cut is the
    two-pass form — per-cluster count + rank-threshold cosine via the
    exact order-stats operator (operators/order_stats.py), then a
    stateless filter — documented rather than implemented because the
    window face is what the rank semantics certify."""
    cosv = _cos_to_centroid(spark, sf_dir)
    w = Window.partitionBy("label").orderBy(F.col("cos_centroid").desc(), "vec_id")
    wn = Window.partitionBy("label")
    return (
        cosv.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        # integer `div` mirrors the oracle's (n+3)//4 EXACTLY: for
        # integer rn, rn > (n+3)/4.0 and rn > (n+3) div 4 coincide,
        # but the integer form can't drift if the threshold expression
        # or the rank type is ever refactored (ADVICE r9)
        .where(F.col("rn") > F.expr("(n + 3) div 4"))
        .select(F.col("label").alias("cluster_id"), "vec_id", "cos_centroid")
    )
