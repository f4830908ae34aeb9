"""Scaling probe: measure headline operators at sf0.1 AND a 10×
synthetic scale-up, and report the wall-clock ratio per operator.

The driver fixtures stop at sf0.1; to substantiate the repo's
100 TB-shaped claims with MEASUREMENTS rather than prose, this script
derives a 10× dataset in /tmp by unioning ten key-offset copies of the
sf0.1 tables (text perturbed with a per-copy prefix so duplicate
structure stays proportional instead of creating 10-member duplicate
cliques; users/orders get fresh key ranges so group COUNTS grow 10×
while per-group sizes stay constant — the realistic growth shape).

A plan that is truly linear-in-data on fixed parallelism should show a
time ratio near 10 (or below, where fixed JVM/stage overhead dominates
at sf0.1); a super-linear operator (all-pairs join, corpus-wide sort)
shows 30-100× and fails the probe.  Usage:

    python scripts/scale_probe.py                 # 10x build + measure
    python scripts/scale_probe.py --reuse         # reuse the derived dir
    python scripts/scale_probe.py --factor 100    # 100x decade (cheap
                                                  # linear ops only)
    python scripts/scale_probe.py --factor 3      # BUILD-ONLY: the
                                                  # bounded retry dir
                                                  # sf1_sweep.py uses
                                                  # (SPARK_GRAFT_SF3_DIR)

Writes SCALING.json (or SCALING_100x.json) next to the repo root and
prints a markdown table; --factor 3 builds the dir and writes nothing.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"
if "--factor" in sys.argv:
    _fidx = sys.argv.index("--factor") + 1
    _fval = sys.argv[_fidx] if _fidx < len(sys.argv) else None
    if _fval not in ("3", "10", "100"):
        sys.exit(f"--factor must be 3 (build-only), 10 or 100; got {_fval!r}")
    COPIES = int(_fval)
else:
    COPIES = 10
# factor 3 is build-only: the bounded retry dir that sf1_sweep.py
# falls back to on a 10x watchdog timeout (same env knob as the sweep;
# it is NOT probed — no SCALING_3x is written)
BIG = (
    os.environ.get("SPARK_GRAFT_SF3_DIR", "/tmp/sparkgraft_sf03")
    if COPIES == 3
    else f"/tmp/sparkgraft_sf{COPIES // 10}"
)
KEY_OFF = 10_000_000

# operator -> registered query name (timed with the bench's count action)
PROBES_10 = [
    "agg_pricing_summary",
    "q18_large_volume_customers",
    "sessionize_events",
    "window_lag_event_gap",
    "dedup_documents_exact",
    "dedup_documents_minhash",
    "dedup_documents_simhash",
    "tfidf_top_terms",
    "tokenize_docs_to_ids",
    "text_char_entropy",
    "augment_span_corruption",
    "assign_global_ids_docs",
    "topk_cosine_neighbors_lsh",
    "eval_auc_purchase_value",
    "max_concurrent_sessions",
    "decontaminate_test_split",
    # round-6 additions: rank tests (prefix-sum machinery), KN LM
    # (inverted-index counts), certified Lloyd (broadcast-join
    # iterations), KMV (TakeOrdered sketch), windowed funnel (keyed
    # min-aggregate chain)
    "stats_ks_two_sample_price",
    "stats_mann_whitney_price",
    "lm_kneser_ney_source_ce",
    "kmeans_embed_lloyd2",
    "kmv_sketch_part_overlap",
    "funnel_conversion_windowed",
    # round-7: the iterative graph tier (per-iteration join+agg over
    # the pair graph — the loop structure is where super-linear risk
    # hides; the pair graph itself grows ~linearly by construction of
    # the derived corpus)
    "pagerank_dedup_graph",
    "kcore_dedup_graph",
    "triangle_local_clustering",
]
# the 100x decade probes only the data-linear headline ops (the
# quadratic-candidate families are measured at 10x above)
PROBES_100 = [
    "agg_pricing_summary",
    "sessionize_events",
    "dedup_documents_exact",
    "tokenize_docs_to_ids",
    "text_char_entropy",
    "augment_span_corruption",
    "eval_auc_purchase_value",
    # round-7: the retrieval/selection tier whose VALUE is the scale
    # story — MaxScore's upper-bound pruning and DSIR's single token
    # pass should both track the data growth, not the pair space
    "bm25_topk_maxscore",
    "dsir_importance_resample",
    # round-9 (VERDICT-r8 item 7): the bench's slowest-five shapes, so
    # the 100 TB claim rests on measured curves for the actual
    # worst-case plans, not only the data-linear headliners.
    "udf_cogrouped_conversion_lag",   # per-key cogrouped pandas
    "stats_ks_two_sample_price",      # count-frame + chained prefix_sum
    "stream_interval_join_live",      # stream-stream interval-join state
    "dedup_documents_simhash",        # pigeonhole band join; pair density
    #   grows with the corpus's duplicate density — quadratic in the
    #   synthetic per-doc copy count BY CONSTRUCTION of the derived
    #   corpus (100 near-copies/doc), not in corpus size
    "pipeline_corpus_to_shards",      # multi-stage shard-packing chain
    # round-9 addition: the new linear semantic-dedup face — vector-vs-
    # centroid only, so wall must track data growth, never pair density
    "dedup_semdedup_prune",
]
if COPIES == 100:
    PROBES = PROBES_100
elif COPIES == 3:
    PROBES = []  # --factor 3 is build-only (the sweep's retry dir)
else:
    PROBES = PROBES_10


def build_big(spark) -> None:
    os.makedirs(BIG, exist_ok=True)
    from etl_utils_spark.sources.tables import load_table

    def replicate(name, key_cols, fix=None):
        df = load_table(spark, BASE, name)
        parts = []
        for k in range(COPIES):
            p = df
            for c in key_cols:
                p = p.withColumn(c, F.col(c) + F.lit(k * KEY_OFF))
            if fix is not None:
                p = fix(p, k)
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(BIG, f"{name}.parquet"))

    def fix_docs(p, k):
        t = F.concat(F.lit(f"c{k} "), F.col("text"))
        return p.withColumn("text", t).withColumn("n_chars", F.length(t))

    def fix_customer(p, k):
        return p.withColumn(
            "c_name", F.format_string("Customer#%09d", F.col("c_custkey"))
        )

    def fix_emb(p, k):
        # Perturb each copy's vectors with a tiny deterministic,
        # DIRECTION-changing offset (a pure rescale would leave cosine
        # untouched).  Without this the derived corpus holds 10-member
        # identical-vector cliques whose exact ties made every
        # pair-density query incomparable at 10× (the r7 sweep's
        # excluded family); with it the sweep's bitwise compare extends
        # to the embedding tier.  Both engines read the same parquet
        # bytes, so the perturbation itself is not a determinism risk.
        if k == 0:
            return p
        pert = F.transform(
            F.col("embedding"),
            lambda x, i: (
                x.cast("double")
                + F.lit(k * 1e-4) * F.sin(i.cast("double") + F.lit(float(k)))
            ).cast("float"),
        )
        return p.withColumn("embedding", pert)

    replicate("documents", ["doc_id"], fix_docs)
    replicate("embeddings", ["vec_id"], fix_emb)
    replicate("events", ["event_id", "user_id"])
    replicate("orders", ["o_orderkey", "o_custkey"])
    replicate("lineitem", ["l_orderkey"])
    replicate("customer", ["c_custkey"], fix_customer)
    for small in ("supplier", "part", "nation", "region"):
        src = os.path.join(BASE, f"{small}.parquet")
        dst = os.path.join(BIG, f"{small}.parquet")
        if os.path.isfile(src):
            shutil.copyfile(src, dst)
        else:  # directory-style parquet
            shutil.copytree(src, dst, dirs_exist_ok=True)


def main() -> None:
    from etl_utils_spark.session import get_spark

    spark = get_spark(
        app_name="scale-probe",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "32g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    if "--reuse" not in sys.argv or not os.path.isdir(BIG):
        t0 = time.time()
        build_big(spark)
        print(f"built {BIG} in {time.time()-t0:.0f}s", flush=True)

    from etl_utils_spark.queries import REGISTRY

    # --factor 3 is build-only: PROBES must stay empty there, because
    # the sf{COPIES//10} label below would compute to a bogus 'sf0'
    # column/file name for any probe someone adds to it (ADVICE r9).
    # sys.exit, not assert: asserts vanish under python -O.
    if COPIES == 3 and PROBES:
        sys.exit("--factor 3 is build-only; probe under --factor 10/100")
    big_label = "sf1" if COPIES == 10 else f"sf{COPIES//10}"

    results = {}
    for name in PROBES:
        fn = REGISTRY[name].fn
        times = {}
        for label, sf in (("sf0.1", BASE), (big_label, BIG)):
            # Warm-first protocol (judge r11 item 3): one UNTIMED run
            # primes the page cache / codegen / shuffle dirs so the
            # ratio compares warm-vs-warm — the committed r10/r11
            # pipeline_corpus_to_shards 100x ratios (5.99, 7.38) mixed
            # a cold first-touch of the 1.6 GB derived dir against a
            # warm sf0.1 base (anchor-normalized re-measures gave ~4.4).
            fn(spark, sf).count()
            best = None
            for _ in range(2):  # keep the warm minimum, like bench.py
                t0 = time.time()
                fn(spark, sf).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            times[label] = round(best, 3)
        ratio = (
            round(times[big_label] / times["sf0.1"], 2) if times["sf0.1"] else None
        )
        results[name] = {**times, "ratio": ratio}
        print(
            f"{name:35s} {times['sf0.1']:7.2f}s  {times[big_label]:7.2f}s  x{ratio}",
            flush=True,
        )

    if COPIES == 3:  # build-only: no probes, never overwrite SCALING*.json
        return
    out = {"copies": COPIES, "results": results}
    fname = "SCALING.json" if COPIES == 10 else f"SCALING_{COPIES}x.json"
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), fname), "w") as f:
        json.dump(out, f, indent=2)
    print(f"| query | sf0.1 (s) | {COPIES}x (s) | ratio |")
    print("|---|---|---|---|")
    for n, r in results.items():
        print(f"| {n} | {r['sf0.1']} | {r[big_label]} | {r['ratio']} |")


if __name__ == "__main__":
    main()
