"""Materialized near-dup pair graph shared across graph-analytics
queries.

Eight registered queries (clustering, degree histogram, PageRank,
k-core, triangles, leakage-safe split, BFS, survivor selection) consume
the SAME trigram-Jaccard pair set. A production corpus pipeline
materializes that graph once and fans analytics out from it — it does
not re-shingle 100 TB eight times. This module is that materialization:
first request per (application, sf_dir, n, threshold) builds the exact
inverted-index join and eagerly localCheckpoints the result; later
requests reuse the checkpointed blocks.

localCheckpoint (not cache) on purpose: it truncates lineage, so the
builder's cached shingle frame is released to the ContextCleaner
instead of pinning executor memory per call, and downstream iterative
consumers (CC / PageRank / k-core) start from flat-lineage blocks.

Keyed by applicationId — a new Spark context invalidates old block ids,
and the stale entries are dropped at that point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, DataFrame] = {}


def jaccard_pair_graph(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """(id_a, id_b, jaccard) — the exact trigram-Jaccard near-dup pair
    set over the documents fixture, built once per application."""
    from etl_utils_spark.operators.dedup import ngram_jaccard_pairs
    from etl_utils_spark.sources.tables import load_table

    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir, n, threshold)
    hit = _CACHE.get(key)
    if hit is not None:
        return hit
    # drop entries from dead applications — their blocks are gone
    for k in [k for k in _CACHE if k[0] != app_id]:
        del _CACHE[k]
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=n, threshold=threshold).localCheckpoint(
        eager=True
    )
    _CACHE[key] = pairs
    return pairs


# DuckDB replica of jaccard_pair_graph — ONE definition of the
# trigram-Jaccard pair CTE chain (threshold 0.1) shared by every
# graph-suite oracle (graph_v2 metrics, the pagerank/k-core exact-replay
# gates in queries/llm.py); `pairs` is the undirected a<b pair list,
# `edges` both directions.
#
# Every multiply-referenced level is AS MATERIALIZED: DuckDB 1.0
# re-inlines doubly-referenced CTEs, so an oracle that touches `edges`
# three times (deg + two joins) would otherwise re-run the shingle
# self-join SIX-plus times — the whole graph-replay oracle family blew
# the 10× sweep watchdog on exactly that recomputation (r12; same
# mechanism advanced_ops._cc_closure_cte measured in r11).
JACCARD_PAIRS_CTE = """
        toks AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        sh AS MATERIALIZED (
            SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
            FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w) - 2)) AS i) t
        ),
        sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        pairs AS MATERIALIZED (
            SELECT id_a, id_b FROM inter
            JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.1
        ),
        edges AS MATERIALIZED (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION SELECT id_b, id_a FROM pairs
        )
"""


# -------------------------------------------- shared funnel oracle
#
# ONE definition of the 7-day greedy-earliest funnel window and its
# three-stage CTE chain, consumed by the batch funnel
# (queries/behavioral.py), the streaming funnel
# (queries/streaming_v2.py), and the state machine
# (streaming/stateful.py imports the same constant) — three
# independent copies would silently desynchronize the stream-vs-batch
# equivalence the hash match certifies.

from etl_utils_spark.streaming.stateful import FUNNEL_WINDOW_US  # noqa: E402


def funnel_stage_ctes() -> str:
    """The u1/u2/u3 stage CTE block (greedy-earliest, inclusive
    bounds, FUNNEL_WINDOW_US per step) shared verbatim by both funnel
    oracles."""
    return f"""
        u1 AS (
            SELECT user_id, min(epoch_us(ts)) AS t1
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ),
        u2 AS (
            SELECT e.user_id, min(epoch_us(e.ts)) AS t2
            FROM events e JOIN u1 USING (user_id)
            WHERE e.event_type = 'click'
              AND epoch_us(e.ts) >= u1.t1
              AND epoch_us(e.ts) <= u1.t1 + {FUNNEL_WINDOW_US}
            GROUP BY e.user_id
        ),
        u3 AS (
            SELECT e.user_id, min(epoch_us(e.ts)) AS t3
            FROM events e JOIN u2 USING (user_id)
            WHERE e.event_type = 'purchase'
              AND epoch_us(e.ts) >= u2.t2
              AND epoch_us(e.ts) <= u2.t2 + {FUNNEL_WINDOW_US}
            GROUP BY e.user_id
        )"""
