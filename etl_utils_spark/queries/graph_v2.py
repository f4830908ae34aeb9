"""Graph analytics v2 over the near-dup document graph (round 4):
partition quality (modularity), link prediction, and degree
assortativity.

These extend the corpus-curation graph chain (CC / PageRank / k-core /
triangles) with the metrics a curation pipeline uses to JUDGE its dedup
clustering — is the pair graph modular (clean clusters) or a hairball
(threshold too low)?  All three consume the shared, once-materialized
``jaccard_pair_graph`` (queries/shared.py) — one shingle pass feeds the
whole graph suite.

Scale notes: the common-neighbor join is adjacency x adjacency on the
shared-neighbor key — the standard distributed triangle/2-path shape,
bounded by sum(deg^2), not |V|^2; skew on hub nodes is the known hazard
and is bounded here by the upstream Jaccard threshold.  Modularity and
assortativity are single aggregates over the edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.operators import exact_moments
from etl_utils_spark.queries.registry import query
from etl_utils_spark.queries.shared import JACCARD_PAIRS_CTE as _PAIRS_CTE
from etl_utils_spark.queries.shared import jaccard_pair_graph


@query(
    "graph_modularity_cc",
    oracle=f"""
        WITH RECURSIVE {_PAIRS_CTE},
        cc AS (
            SELECT u AS node, u AS comp FROM edges
            UNION
            SELECT e.u, c.comp FROM edges e JOIN cc c ON e.v = c.node
            WHERE c.comp < e.u
        ),
        labels AS MATERIALIZED (SELECT node, min(comp) AS comp FROM cc GROUP BY node),
        m AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS m_edges FROM pairs),
        lc AS (
            SELECT l.comp, CAST(count(*) AS BIGINT) AS l_c
            FROM pairs p JOIN labels l ON p.id_a = l.node
            GROUP BY l.comp
        )
        SELECT (SELECT m_edges FROM m) AS m_edges,
               CAST(count(*) AS BIGINT) AS n_components,
               1.0 - CAST(SUM(CAST(l_c AS HUGEINT) * l_c) AS DOUBLE)
                     / (CAST((SELECT m_edges FROM m) AS DOUBLE)
                        * CAST((SELECT m_edges FROM m) AS DOUBLE))
                   AS modularity
        FROM lc
    """,
)
def graph_modularity_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the connected-component partition of the
    near-dup graph.  Every edge is intra-component by construction, so
    Q = 1 - sum_c (L_c/m)^2 — a per-component edge count plus one
    aggregate.  Q near 1 = many small tight clusters (healthy dedup
    threshold); Q near 0 = one giant component (threshold too low) —
    the pipeline's dial for tuning the Jaccard cutoff."""
    from etl_utils_spark.operators.clustering import connected_components

    pairs = jaccard_pair_graph(spark, sf_dir)
    labels = connected_components(pairs)
    m = pairs.count()  # 1 scalar; pair graph is already materialized
    lc = (
        pairs.join(labels, pairs.id_a == labels.node)
        .groupBy("comp")
        .agg(F.count(F.lit(1)).alias("l_c"))
    )
    # Q = 1 - (Σ l_c²)/m² with the squared sum EXACT (integer), then
    # one shared IEEE division — summing per-component float squares
    # is order-dependent and pow() itself differs across engines.
    lsq = F.col("l_c").cast("decimal(18,0)") * F.col("l_c").cast("decimal(18,0)")
    return lc.agg(
        F.lit(m).cast("long").alias("m_edges"),
        F.count(F.lit(1)).alias("n_components"),
        (
            1.0
            - F.sum(lsq).cast("double")
            / (F.lit(m).cast("double") * F.lit(m).cast("double"))
        ).alias("modularity"),
    )


@query(
    "link_predict_common_neighbors",
    oracle=f"""
        WITH {_PAIRS_CTE},
        deg AS MATERIALIZED (SELECT u AS node, CAST(count(*) AS BIGINT) AS d
                FROM edges GROUP BY u),
        cand AS (
            SELECT e1.u AS u, e2.v AS v, CAST(count(*) AS BIGINT) AS common
            FROM edges e1 JOIN edges e2 ON e1.v = e2.u AND e1.u < e2.v
            GROUP BY 1, 2
        ),
        nonedge AS (
            SELECT c.u, c.v, c.common FROM cand c
            LEFT JOIN pairs p ON c.u = p.id_a AND c.v = p.id_b
            WHERE p.id_a IS NULL
        )
        SELECT n.u AS id_a, n.v AS id_b, n.common AS common_neighbors,
               CAST(n.common AS DOUBLE) / (du.d + dv.d - n.common)
                   AS neighbor_jaccard
        FROM nonedge n
        JOIN deg du ON n.u = du.node JOIN deg dv ON n.v = dv.node
        ORDER BY common_neighbors DESC, id_a, id_b
        LIMIT 20
    """,
)
def link_predict_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction on the near-dup graph: 2-path
    join on the shared-neighbor key, existing edges anti-joined out,
    neighbor-Jaccard score, deterministic top-20.  The 2-path join is
    the distributed O(sum deg^2) shape — the same plan triangle
    counting uses — NOT an all-pairs similarity."""
    pairs = jaccard_pair_graph(spark, sf_dir)
    edges = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v")).unionAll(
        pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
    )
    deg = edges.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    cand = (
        e1.join(e2, (F.col("e1.v") == F.col("e2.u")) & (F.col("e1.u") < F.col("e2.v")))
        .groupBy(F.col("e1.u").alias("u"), F.col("e2.v").alias("v"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    nonedge = cand.join(
        pairs,
        (cand.u == pairs.id_a) & (cand.v == pairs.id_b),
        "left_anti",
    )
    du = deg.alias("du")
    dv = deg.alias("dv")
    return (
        nonedge.join(du, nonedge.u == F.col("du.node"))
        .join(dv, nonedge.v == F.col("dv.node"))
        .select(
            F.col("u").alias("id_a"),
            F.col("v").alias("id_b"),
            F.col("common").alias("common_neighbors"),
            # one exact-integer IEEE division — emitted unrounded
            # (engine ROUND diverges on rationals' shortest-repr ties)
            (
                F.col("common").cast("double")
                / (F.col("du.d") + F.col("dv.d") - F.col("common"))
            ).alias("neighbor_jaccard"),
        )
        .orderBy(F.desc("common_neighbors"), "id_a", "id_b")
        .limit(20)
    )


@query(
    "graph_assortativity_degree",
    oracle=f"""
        WITH {_PAIRS_CTE},
        deg AS MATERIALIZED (SELECT u AS node, CAST(count(*) AS BIGINT) AS d
                FROM edges GROUP BY u),
        j AS (
            SELECT du.d AS da, dv.d AS db
            FROM edges e
            JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
        ),
        m AS (SELECT {exact_moments.moments_sql("da", "db")} FROM j)
        SELECT n AS n_directed_edges,
               {exact_moments.corr_sql(6)} AS degree_assortativity
        FROM m
    """,
)
def graph_assortativity_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Pearson correlation of endpoint degrees
    over the directed edge list): positive = hubs link to hubs (dup
    clusters of boilerplate), negative = star topology.  Degree table
    joined twice on the edge list — two hash joins and one corr
    aggregate."""
    pairs = jaccard_pair_graph(spark, sf_dir)
    edges = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v")).unionAll(
        pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
    )
    deg = edges.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    du = deg.alias("du")
    dv = deg.alias("dv")
    j = (
        edges.join(du, edges.u == F.col("du.node"))
        .join(dv, edges.v == F.col("dv.node"))
        .select(F.col("du.d").alias("da"), F.col("dv.d").alias("db"))
    )
    # Exact integer degree moments -> one shared IEEE corr expression
    # (operators/exact_moments.py): builtin corr is ulp-unstable under
    # ROUND across engines.
    m = exact_moments.moments_agg(j, F.col("da"), F.col("db"))
    return m.select(
        F.col("n").alias("n_directed_edges"),
        exact_moments.corr_col(6).alias("degree_assortativity"),
    )
