"""Scale-pattern operators: passage-level boilerplate dedup (CCNet-style
line dedup adapted to the fixture's space-separated texts), contiguous
global id assignment (two-phase, no single-partition sort), CDC
change-log application (last-writer-wins as ONE mergeable aggregate),
and a one-pass correlation matrix.

Scale shapes:
- boilerplate dedup groups passages by their md5 (fixed-width shuffle
  keys, never the passage text at scale beyond the digest), and
  reassembly is a per-doc sort of its own passages — no global order.
- global ids avoid ``row_number() OVER (ORDER BY ...)`` (a
  single-reducer sort at 100 TB) via range partition + per-partition
  counters + a #partitions-row offset table (operators/ids.py).
- CDC apply is a ``max_by`` hash aggregate with map-side combine — the
  window formulation would sort every key group; the aggregate form
  merges partials and survives skewed keys under AQE.
- the correlation matrix computes all pairwise Pearson r in ONE scan
  (mergeable moment aggregates), then unpivots the 1-row result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_utils_spark.operators.ids import assign_global_ids
from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_CHUNK = 10  # tokens per passage
_BOILER_MIN_DOCS = 2  # passage present in >= this many docs is boilerplate


@query(
    "dedup_lines_boilerplate",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents
        ),
        chunks AS (
            SELECT doc_id, i AS pos,
                   array_to_string(toks[(i*{_CHUNK}+1):((i+1)*{_CHUNK})], ' ') AS passage
            FROM (
                SELECT doc_id, toks,
                       unnest(range(0, CAST(ceil(len(toks) / {_CHUNK}.0) AS BIGINT))) AS i
                FROM tok WHERE len(toks) > 0
            )
        ),
        freq AS (
            SELECT md5(passage) AS h, count(DISTINCT doc_id) AS n_docs
            FROM chunks GROUP BY 1
        ),
        kept AS (
            SELECT c.doc_id, c.pos, c.passage
            FROM chunks c JOIN freq ON md5(c.passage) = freq.h
            WHERE freq.n_docs < {_BOILER_MIN_DOCS}
        ),
        agg AS (
            SELECT doc_id,
                   count(*) AS n_kept,
                   string_agg(passage, ' ' ORDER BY pos) AS clean_text
            FROM kept GROUP BY doc_id
        ),
        tot AS (SELECT doc_id, count(*) AS n_total FROM chunks GROUP BY doc_id)
        SELECT t.doc_id,
               coalesce(a.clean_text, '') AS clean_text,
               coalesce(a.n_kept, 0)::BIGINT AS n_kept,
               (t.n_total - coalesce(a.n_kept, 0))::BIGINT AS n_dropped
        FROM tot t LEFT JOIN agg a USING (doc_id)
    """,
)
def dedup_lines_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level boilerplate removal (CCNet-style line dedup;
    Wenzek et al. 2020): drop every 10-token passage whose exact text
    occurs in >= 2 distinct documents (duplicated docs and shared
    spans), reassemble the survivors in order.  Passages shuffle keyed
    by a 128-bit composite xxhash64 digest; reassembly sorts only
    within each doc's own rows."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    base = d.select("doc_id", toks.alias("toks")).where(F.size("toks") > 0)
    n_chunks = F.ceil(F.size("toks") / float(_CHUNK)).cast("long")
    chunks = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(
                    F.slice("toks", i * _CHUNK + 1, _CHUNK), " "
                ),
            )
        ).alias("pos", "passage"),
    )
    # r12 folded kept/total/reassembly into ONE per-doc aggregate (the
    # freq join + agg/tot LEFT join — 2 joins, 5 exchanges — are gone).
    # r13 (VERDICT r12 items 1+2) hardens the per-passage frequency
    # step for 100 TB:
    # - KEY: two independent xxhash64 digests (128-bit composite)
    #   instead of one 64-bit value — at ~2^40 passages a single-long
    #   key expects tens of thousands of collisions, each of which
    #   merges two distinct passages and can falsely strip text; at
    #   2^-128 grain collisions are gone.  The key never reaches the
    #   output, so results are unchanged (the oracle groups by md5).
    # - PREDICATE: `keep` ⟺ n_docs < 2 ⟺ every instance of the
    #   passage lives in ONE doc ⟺ min(doc_id)==max(doc_id) over the
    #   same window.  min/max are constant-state window aggregates, so
    #   a true boilerplate passage (the hot key this operator exists to
    #   find) no longer materializes its full distinct doc-id set in a
    #   single task's collect_set buffer (guide §5) — same exchange,
    #   same rows, provably the same boolean per row.
    w_h = Window.partitionBy("h1", "h2")
    keep = F.col("_keep")
    return (
        chunks.withColumn("h1", F.xxhash64("passage"))
        .withColumn("h2", F.xxhash64(F.lit(1), F.col("passage")))
        .withColumn(
            "_keep", F.min("doc_id").over(w_h) == F.max("doc_id").over(w_h)
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(keep, F.struct("pos", "passage")))
                    ),
                    lambda s: s["passage"],
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.when(keep, F.lit(1))).alias("n_kept"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select(
            "doc_id",
            "clean_text",
            F.col("n_kept").cast("long").alias("n_kept"),
            (F.col("n_total") - F.col("n_kept")).cast("long").alias("n_dropped"),
        )
    )


@query(
    "assign_global_ids_docs",
    oracle="""
        SELECT doc_id,
               row_number() OVER (ORDER BY doc_id) AS global_id
        FROM documents
    """,
)
def assign_global_ids_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous 1-based global ids in doc_id order via the two-phase
    range-partition + per-partition-counter operator — the distributed
    IDENTITY backfill.  The oracle is the single-reducer window
    formulation the operator exists to avoid; equal output certifies
    the offset arithmetic."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    return assign_global_ids(d, "doc_id").select("doc_id", "global_id")


@query(
    "cdc_apply_changes",
    oracle="""
        WITH log AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN event_type = 'purchase' THEN 'delete'
                        WHEN event_type = 'signup' THEN 'insert'
                        ELSE 'upsert' END AS op
            FROM events
        ),
        ranked AS (
            SELECT user_id, op, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn,
                   count(*) OVER (PARTITION BY user_id) AS n_changes
            FROM log
        )
        SELECT user_id,
               op AS last_op,
               value AS last_value,
               n_changes::BIGINT AS n_changes
        FROM ranked
        WHERE rn = 1 AND op <> 'delete'
    """,
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture application: collapse a keyed change log to
    final state by last-writer-wins, honoring deletes (purchase =
    tombstone here).  ONE ``max_by`` hash aggregate over a composite
    (ts, event_id) order key — mergeable partials, map-side combine —
    instead of the per-key window sort the oracle uses; equal output
    certifies the aggregate formulation."""
    e = _t(spark, sf_dir, "events")
    log = e.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "purchase", "delete")
        .when(F.col("event_type") == "signup", "insert")
        .otherwise("upsert")
        .alias("op"),
    )
    agg = log.groupBy("user_id").agg(
        F.max_by(
            F.struct("op", "value"), F.struct("ts", "event_id")
        ).alias("last"),
        F.count(F.lit(1)).alias("n_changes"),
    )
    return agg.where(F.col("last.op") != "delete").select(
        "user_id",
        F.col("last.op").alias("last_op"),
        F.col("last.value").alias("last_value"),
        F.col("n_changes").cast("long").alias("n_changes"),
    )


_SHARD_TOKEN_BUDGET = 500


@query(
    "shard_assign_docs",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                   x -> x <> ''))::BIGINT AS n_tok
            FROM documents
        )
        SELECT doc_id, n_tok,
               CAST(FLOOR((SUM(n_tok) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - n_tok) / {_SHARD_TOKEN_BUDGET}.0) AS BIGINT)
                   AS shard_id
        FROM t
    """,
)
def shard_assign_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-preserving shard assignment under a token budget: shard id
    = floor(exclusive-prefix-sum(tokens) / budget), computed with the
    distributed prefix-sum operator (operators/ids.py:prefix_sum) —
    bucket decomposition + per-bucket offsets, never the oracle's
    single-reducer ``SUM() OVER (ORDER BY ...)``.  The writer-side
    primitive for packing a curated corpus into bounded output files
    while preserving global document order."""
    from etl_utils_spark.operators.ids import prefix_sum
    from etl_utils_spark.operators.text import _alpha_tokens

    d = _t(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.size(_alpha_tokens("text")).cast("long").alias("n_tok")
    )
    ps = prefix_sum(t, "doc_id", "n_tok")
    return ps.select(
        "doc_id",
        "n_tok",
        F.floor(
            (F.col("running_total") - F.col("n_tok")) / float(_SHARD_TOKEN_BUDGET)
        )
        .cast("long")
        .alias("shard_id"),
    )


def order_part_baskets(li: DataFrame) -> DataFrame:
    """(l_orderkey, parts: sorted distinct part array) — one exchange.
    ``collect_set`` absorbs the DISTINCT (map-side partial sets), so
    the separate distinct exchange of the self-join formulation is
    gone (r12, guide §2.4)."""
    return li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )


def basket_pairs_expr() -> F.Column:
    """All (part_a < part_b) pairs of a sorted ``parts`` array as an
    array of structs — pure Catalyst (nested transform over the array;
    the sorted order makes a < b structural), no self-join, no shuffle
    of candidate pairs (r12: replaces the op⋈op equi-join — 2
    exchanges + SMJ — with row-local expansion; guide §2.4, §3.3)."""
    return F.flatten(
        F.transform(
            F.col("parts"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("parts"), i + F.lit(2), F.size("parts") - i - F.lit(1)
                ),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )


def copurchase_pair_counts(li: DataFrame) -> DataFrame:
    """Top-20 co-purchased part pairs by distinct-order count —
    baskets → row-local pair expansion → ONE pair-count exchange →
    TakeOrdered.  Two exchanges total where the self-join shape had
    four; results identical (verified bitwise vs the unchanged
    self-join oracle at three SFs)."""
    return (
        order_part_baskets(li)
        .select(F.explode(basket_pairs_expr()).alias("p"))
        .groupBy(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


@query(
    "copurchase_part_pairs",
    oracle="""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*)::BIGINT AS n_orders
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        ORDER BY n_orders DESC, part_a ASC, part_b ASC
        LIMIT 20
    """,
)
def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: top part pairs bought in the same
    order.  r12 shape (guide §2.4): per-order sorted distinct part
    baskets (one exchange; collect_set absorbs the DISTINCT) →
    row-local Catalyst pair expansion (the oracle's a<b theta-join
    becomes structural order in the sorted array — no join, no pair
    shuffle) → pair count → top-k with total-order tie-breaks.
    Per-order fan-out is bounded by basket size exactly as the join
    was; Zipf-head PARTS no longer skew any join key because the only
    remaining exchanges are the basket groupBy (keyed by order) and
    the bounded pair count."""
    li = _t(spark, sf_dir, "lineitem")
    return copurchase_pair_counts(li)


_N_BPE_MERGES = 3


def _bpe_ctes(n_merges: int, with_final: bool) -> str:
    """Generate the DuckDB CTE chain replicating the greedy merge loop:
    round k = pair counts → 1-row argmax (ties → smallest pair) →
    left-to-right non-overlapping replace on the sentinel-wrapped
    corpus.  `replace` semantics are identical in both engines, which
    is what the hash match certifies.  ``with_final`` adds the corpus
    state AFTER the last merge (for apply-stats queries)."""
    ctes = [
        """c0 AS (
            SELECT doc_id,
                   '|' || array_to_string(
                       list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                   x -> x <> ''), '||') || '|' AS w
            FROM documents
        )"""
    ]
    for k in range(n_merges):
        ctes.append(
            f"""t{k} AS (SELECT string_split(trim(w, '|'), '||') AS t FROM c{k}),
        p{k} AS (
            SELECT t[i] AS l, t[i+1] AS r
            FROM (SELECT t, unnest(range(1, len(t))) AS i FROM t{k})
        ),
        n{k} AS (SELECT l, r, count(*) AS n FROM p{k} GROUP BY l, r),
        b{k} AS (SELECT l, r, n FROM n{k} ORDER BY n DESC, l ASC, r ASC LIMIT 1)"""
        )
        if k + 1 < n_merges or with_final:
            ctes.append(
                f"""c{k+1} AS (
            SELECT doc_id,
                   replace(w, '|' || b.l || '||' || b.r || '|',
                              '|' || b.l || b.r || '|') AS w
            FROM c{k}, b{k} b
        )"""
            )
    return "WITH " + ",\n".join(ctes)


def _bpe_oracle(n_merges: int) -> str:
    selects = " UNION ALL ".join(
        f"SELECT {k} AS merge_round, l AS l_tok, r AS r_tok, "
        f"l || r AS merged, n::BIGINT AS n_occ FROM b{k}"
        for k in range(n_merges)
    )
    return _bpe_ctes(n_merges, with_final=False) + "\n" + selects


@query("bpe_learn_merges", oracle=_bpe_oracle(_N_BPE_MERGES))
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge-rule learning (operators/bpe.py): 3 greedy
    merge rounds over the corpus at token granularity.  Each round is
    one scan → pair hash-aggregate → 1-row argmax (driver-bounded) →
    lazy literal replace; the DuckDB oracle replays the identical loop
    and the hash match certifies pair counting, tie-breaks, AND the
    left-to-right non-overlapping merge semantics cross-engine."""
    from etl_utils_spark.operators.bpe import learn_merges
    from etl_utils_spark.operators.text import _alpha_tokens

    d = _t(spark, sf_dir, "documents")
    corpus = d.select(_alpha_tokens("text").alias("toks"))
    rules = learn_merges(corpus, F.col("toks"), _N_BPE_MERGES)
    return spark.createDataFrame(
        [(k, l, r, l + r, n) for k, l, r, n in rules],
        "merge_round int, l_tok string, r_tok string, merged string, n_occ bigint",
    )


@query(
    "bpe_apply_corpus",
    oracle=_bpe_ctes(_N_BPE_MERGES, with_final=True)
    + f"""
        SELECT count(*)::BIGINT AS n_docs,
               SUM(len(string_split(trim(a.w, '|'), '||')))::BIGINT
                   AS n_tokens_before,
               SUM(len(string_split(trim(b.w, '|'), '||')))::BIGINT
                   AS n_tokens_after,
               SUM(CASE WHEN a.w <> b.w THEN 1 ELSE 0 END)::BIGINT
                   AS n_docs_changed
        FROM c0 a JOIN c{_N_BPE_MERGES} b USING (doc_id)
    """,
)
def bpe_apply_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE merges back to the corpus and report the
    compression: token counts before/after and how many documents
    changed.  The apply step is a chain of literal replaces folded into
    one projection — pure codegen, no shuffle; only the final 1-row
    stats aggregate reduces."""
    from etl_utils_spark.operators.bpe import (
        apply_merges,
        learn_merges,
        tokens_of_wrapped,
        wrapped,
    )
    from etl_utils_spark.operators.text import _alpha_tokens

    d = _t(spark, sf_dir, "documents")
    corpus = d.select("doc_id", _alpha_tokens("text").alias("toks"))
    rules = learn_merges(corpus, F.col("toks"), _N_BPE_MERGES)
    w0 = corpus.select("doc_id", wrapped(F.col("toks")).alias("w0"))
    applied = w0.withColumn("w1", apply_merges(F.col("w0"), rules))
    return applied.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(tokens_of_wrapped("w0"))).cast("long").alias("n_tokens_before"),
        F.sum(F.size(tokens_of_wrapped("w1"))).cast("long").alias("n_tokens_after"),
        F.sum(F.when(F.col("w0") != F.col("w1"), 1).otherwise(0))
        .cast("long")
        .alias("n_docs_changed"),
    )


@query(
    "bpe_compression_by_lang",
    oracle=_bpe_ctes(_N_BPE_MERGES, with_final=True)
    + f"""
        SELECT d.lang,
               count(*)::BIGINT AS n_docs,
               SUM(len(string_split(trim(a.w, '|'), '||')))::BIGINT
                   AS n_tokens_before,
               SUM(len(string_split(trim(b.w, '|'), '||')))::BIGINT
                   AS n_tokens_after,
               CAST(SUM(len(string_split(trim(b.w, '|'), '||'))) AS DOUBLE)
                   / CAST(SUM(len(string_split(trim(a.w, '|'), '||')))
                          AS DOUBLE) AS compression
        FROM c0 a JOIN c{_N_BPE_MERGES} b USING (doc_id)
        JOIN documents d USING (doc_id)
        GROUP BY d.lang
    """,
)
def bpe_compression_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-efficiency profile per language: token counts before
    and after the learned BPE merges and their ratio — the fertility/
    compression diagnostic a multilingual tokenizer report needs
    (languages the merges don't cover compress worse, signalling a
    vocabulary biased toward the dominant language).  Same apply chain
    as bpe_apply_corpus (codegen-only replaces, no shuffle until the
    per-lang aggregate); exact integer counts, ONE shared division,
    emitted unrounded."""
    from etl_utils_spark.operators.bpe import (
        apply_merges,
        learn_merges,
        tokens_of_wrapped,
        wrapped,
    )
    from etl_utils_spark.operators.text import _alpha_tokens

    d = _t(spark, sf_dir, "documents")
    corpus = d.select("doc_id", _alpha_tokens("text").alias("toks"))
    rules = learn_merges(corpus, F.col("toks"), _N_BPE_MERGES)
    w0 = corpus.select("doc_id", wrapped(F.col("toks")).alias("w0"))
    applied = w0.withColumn("w1", apply_merges(F.col("w0"), rules)).join(
        d.select("doc_id", "lang"), "doc_id"
    )
    before = F.sum(F.size(tokens_of_wrapped("w0")))
    after = F.sum(F.size(tokens_of_wrapped("w1")))
    return applied.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        before.cast("long").alias("n_tokens_before"),
        after.cast("long").alias("n_tokens_after"),
        (after.cast("double") / before.cast("double")).alias("compression"),
    )


_SHARD_BUDGET2 = 400


@query(
    "pipeline_corpus_to_shards",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents
        ),
        chunks AS (
            SELECT doc_id, i AS pos,
                   array_to_string(toks[(i*{_CHUNK}+1):((i+1)*{_CHUNK})], ' ') AS passage
            FROM (
                SELECT doc_id, toks,
                       unnest(range(0, CAST(ceil(len(toks) / {_CHUNK}.0) AS BIGINT))) AS i
                FROM tok WHERE len(toks) > 0
            )
        ),
        freq AS (
            SELECT md5(passage) AS h, count(DISTINCT doc_id) AS n_docs
            FROM chunks GROUP BY 1
        ),
        kept AS (
            SELECT c.doc_id, c.pos, c.passage
            FROM chunks c JOIN freq ON md5(c.passage) = freq.h
            WHERE freq.n_docs < {_BOILER_MIN_DOCS}
        ),
        agg AS (
            SELECT doc_id,
                   count(*) AS n_kept,
                   string_agg(passage, ' ' ORDER BY pos) AS clean_text
            FROM kept GROUP BY doc_id
        ),
        keepers AS (
            SELECT doc_id, clean_text FROM agg WHERE n_kept >= 2
        ),
        uniq AS (
            SELECT min(doc_id) AS doc_id, clean_text
            FROM keepers GROUP BY clean_text
        ),
        sized AS (
            SELECT doc_id,
                   len(string_split(clean_text, ' '))::BIGINT AS n_tok
            FROM uniq
        )
        SELECT doc_id, n_tok,
               CAST(FLOOR((SUM(n_tok) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - n_tok) / {_SHARD_BUDGET2}.0) AS BIGINT) AS shard_id
        FROM sized
    """,
)
def pipeline_corpus_to_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end writer pipeline composing this pack's primitives in
    ONE statement: boilerplate passage removal → survivors with >= 2
    clean passages → exact dedup on the CLEANED text (min doc_id
    survives) → order-preserving token-budget shard assignment via the
    distributed prefix sum.  Pins stage composition (cleaning happens
    BEFORE dedup, so boilerplate can't mask true duplicates; shard
    order is the post-dedup doc order)."""
    from etl_utils_spark.operators.ids import prefix_sum

    from etl_utils_spark.sources.tables import estimated_scan_splits

    d = _t(spark, sf_dir, "documents")
    # Single-small-file fixture → one scan partition: spread the text
    # before the tokenize/explode stages.  Gate on ESTIMATED SCAN
    # SPLITS (size/maxPartitionBytes), not file count — one large
    # splittable file is already many partitions and must not pay an
    # extra shuffle at scale.
    splits = estimated_scan_splits(d)
    if splits is not None and splits < spark.sparkContext.defaultParallelism:
        d = d.repartition(F.col("doc_id"))
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    base = d.select("doc_id", toks.alias("toks")).where(F.size("toks") > 0)
    n_chunks = F.ceil(F.size("toks") / float(_CHUNK)).cast("long")
    chunks = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(F.slice("toks", i * _CHUNK + 1, _CHUNK), " "),
            )
        ).alias("pos", "passage"),
    )
    # r12 made the per-passage doc frequency ONE window over the hash
    # key instead of a groupBy + join back.  r13 (VERDICT r12 items
    # 1+2, same rewrite as dedup_lines_boilerplate): the key is a
    # 128-bit composite of two independent xxhash64 digests (a single
    # 64-bit key expects ~n²/2⁶⁵ silent passage merges at corpus
    # scale), and the n_docs < 2 predicate is evaluated as
    # min(doc_id)==max(doc_id) over the same window — constant-state
    # aggregates, so a hot boilerplate passage never materializes its
    # distinct doc-id set in one task's collect_set buffer (guide §5).
    # Same exchange, same rows, provably the same boolean per row.
    w_h = Window.partitionBy("h1", "h2")
    kept = (
        chunks.withColumn("h1", F.xxhash64("passage"))
        .withColumn("h2", F.xxhash64(F.lit(1), F.col("passage")))
        .withColumn(
            "_keep", F.min("doc_id").over(w_h) == F.max("doc_id").over(w_h)
        )
        .where(F.col("_keep"))
        .select("doc_id", "pos", "passage")
    )
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "passage"))),
                lambda s: s["passage"],
            ),
            " ",
        ).alias("clean_text"),
    )
    uniq = (
        agg.where(F.col("n_kept") >= 2)
        .groupBy("clean_text")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    sized = uniq.select(
        "doc_id", F.size(F.split("clean_text", " ")).cast("long").alias("n_tok")
    )
    ps = prefix_sum(sized, "doc_id", "n_tok")
    return ps.select(
        "doc_id",
        "n_tok",
        F.floor((F.col("running_total") - F.col("n_tok")) / float(_SHARD_BUDGET2))
        .cast("long")
        .alias("shard_id"),
    )


@query(
    "join_bloom_prefilter",
    oracle="""
        SELECT l.l_returnflag,
               count(*)::BIGINT AS n_items,
               CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                             AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        FROM lineitem l
        WHERE l.l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
        )
        GROUP BY l.l_returnflag
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join (operators/bloom.py): the high-value order
    keys build an 8 KB Bloom bitmap (bit_or aggregate, driver-bounded
    collect), broadcast as a LITERAL into a scan-level predicate that
    drops non-matching lineitem rows BEFORE the semi-join exchange.
    The exact semi join still runs, so the oracle is the plain IN-join
    — false positives cannot change the result, only the shuffled
    volume.  At 100 TB this is the difference between exchanging the
    fact table and exchanging the matching slice."""
    from etl_utils_spark.operators.bloom import build_bitmap, might_contain

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    build = o.where(F.col("o_totalprice") > 400000).select("o_orderkey")
    bitmap = build_bitmap(build, "o_orderkey")
    pruned = li.where(might_contain(F.col("l_orderkey"), bitmap))
    return (
        pruned.join(build, pruned.l_orderkey == build.o_orderkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
                ).cast("decimal(28,4)")
            )
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "match_pattern_user_journeys",
    oracle="""
        WITH e AS (
            SELECT user_id, ts, event_id,
                   CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                        WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                        ELSE 'x' END AS init
            FROM events
        ),
        seqs AS (
            SELECT user_id,
                   string_agg(init, '' ORDER BY ts, event_id) AS journey
            FROM e GROUP BY user_id
        )
        SELECT user_id, journey,
               len(journey)::BIGINT AS n_events,
               len(regexp_extract_all(journey, 'vc*p'))::BIGINT AS n_conversions,
               (journey LIKE 's%') AS signup_first
        FROM seqs
    """,
)
def match_pattern_user_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence pattern matching over per-user event journeys
    (MATCH_RECOGNIZE-lite): encode each user's ordered events as a
    character string, then count regex pattern hits (view → any clicks
    → purchase, non-overlapping left-to-right — identical regex-scan
    semantics in both engines).  One shuffle on user_id; per-user state
    bounded by journey length.  The array_sort(collect_list(struct))
    idiom gives deterministic in-group order with (ts, event_id)
    tie-breaks."""
    e = _t(spark, sf_dir, "events")
    init = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("x")
    )
    seqs = (
        e.select("user_id", "ts", "event_id", init.alias("init"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "init"))
                    ),
                    lambda s: s["init"],
                ),
                "",
            ).alias("journey")
        )
    )
    return seqs.select(
        "user_id",
        "journey",
        F.length("journey").cast("long").alias("n_events"),
        F.size(F.expr("regexp_extract_all(journey, 'vc*p', 0)"))
        .cast("long")
        .alias("n_conversions"),
        F.col("journey").startswith("s").alias("signup_first"),
    )


@query(
    "sql_session_variables",
    oracle="""
        SELECT c_mktsegment,
               count(*)::BIGINT AS n_customers,
               CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 100.0) AS avg_bal
        FROM customer
        WHERE c_mktsegment = 'MACHINERY' AND c_acctbal > 1000.0
        GROUP BY c_mktsegment
    """,
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE session variables (DECLARE/SET VARIABLE, Spark 4): the
    engine-level twin of the wrapper's :NAME parameter system
    (query_wrapper.sql:195-209 set_param/load_params) — declared once,
    referenced by name inside any later statement, no string
    templating.  The oracle is the same query with the values folded
    in."""
    from etl_utils_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE seg STRING DEFAULT 'BUILDING'")
    spark.sql("DECLARE OR REPLACE VARIABLE min_bal DOUBLE DEFAULT 0.0")
    spark.sql("SET VARIABLE seg = 'MACHINERY'")
    spark.sql("SET VARIABLE min_bal = 1000.0")
    return spark.sql(
        """
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 100.0) AS avg_bal
        FROM customer
        WHERE c_mktsegment = seg AND c_acctbal > min_bal
        GROUP BY c_mktsegment
        """
    )


@query(
    "sql_scripting_for_loop",
    oracle="""
        SELECT count(*)::BIGINT AS n_types,
               sum(n)::BIGINT AS total_events,
               max(n)::BIGINT AS max_type_events
        FROM (SELECT count(*) AS n FROM events GROUP BY event_type)
    """,
)
def sql_scripting_for_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE SQL scripting (BEGIN/DECLARE/FOR...END FOR, Spark 4):
    the engine-level twin of the reference's Lua job loop — iterate a
    driving query's rows, accumulate into variables, return a result
    (query_wrapper.sql:386-408 query_values + README.md:41-58).  The
    per-row loop runs on the DRIVER over an already-aggregated
    (bounded) result, exactly like the reference's row iteration; the
    heavy lifting stays in the set-based inner query.  Oracle: the
    equivalent one-shot aggregate."""
    from etl_utils_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        BEGIN
          DECLARE n_types BIGINT DEFAULT 0;
          DECLARE total BIGINT DEFAULT 0;
          DECLARE max_n BIGINT DEFAULT 0;
          FOR r AS SELECT event_type, count(*) AS n
                   FROM events GROUP BY event_type DO
            SET n_types = n_types + 1;
            SET total = total + r.n;
            IF r.n > max_n THEN
              SET max_n = r.n;
            END IF;
          END FOR;
          SELECT n_types AS n_types, total AS total_events,
                 max_n AS max_type_events;
        END
        """
    )


@query(
    "io_file_metadata_audit",
    oracle="""
        SELECT 'documents.parquet' AS file_name,
               count(*)::BIGINT AS n_rows,
               count(DISTINCT doc_id)::BIGINT AS n_distinct_ids
        FROM documents
    """,
)
def io_file_metadata_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden file-metadata column surface (`_metadata.file_path`,
    Spark 3.5+): per-source-file row accounting — the lineage audit a
    lakehouse ingest job runs to reconcile files against their row
    counts without a second listing pass.  The fixture table is one
    file, so the oracle pins the (basename, count) pair; on a
    multi-file table the same query yields one row per file."""
    d = _t(spark, sf_dir, "documents")
    with_file = d.select(
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias(
            "file_name"
        ),
        "doc_id",
    )
    return with_file.groupBy("file_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("doc_id").cast("long").alias("n_distinct_ids"),
    )


@query(
    "agg_modern_ordered_set",
    oracle="""
        WITH s AS (SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders),
        base AS (
            SELECT o_orderpriority,
                   count(*)::BIGINT AS n_orders,
                   mode(o_orderstatus) AS mode_status,
                   median(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                               AS BIGINT)) / 100.0 AS median_price
            FROM orders GROUP BY 1
        ),
        sl AS (
            SELECT o_orderpriority,
                   string_agg(o_orderstatus, ',' ORDER BY o_orderstatus)
                       AS status_list
            FROM s GROUP BY 1
        )
        SELECT base.o_orderpriority, n_orders, mode_status, median_price,
               status_list
        FROM base JOIN sl USING (o_orderpriority)
    """,
)
def agg_modern_ordered_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set / positional aggregates added in recent Spark
    (listagg WITHIN GROUP, mode, median) — per priority: order count,
    modal status, exact interpolated median price, and the ordered
    distinct status list.  listagg runs over the pre-deduped
    (priority, status) frame so the concatenation is bounded by the
    domain, never the row count — the only safe listagg shape at
    100 TB."""
    from etl_utils_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH s AS (SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders),
        base AS (
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   mode(o_orderstatus) AS mode_status,
                   median(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                               AS BIGINT)) / 100.0 AS median_price
            FROM orders GROUP BY 1
        ),
        sl AS (
            SELECT o_orderpriority,
                   listagg(o_orderstatus, ',')
                       WITHIN GROUP (ORDER BY o_orderstatus) AS status_list
            FROM s GROUP BY 1
        )
        SELECT base.o_orderpriority, n_orders, mode_status, median_price,
               status_list
        FROM base JOIN sl USING (o_orderpriority)
        """
    )


_REACH_SQL = """
    WITH RECURSIVE pairs AS (
        SELECT a.doc_id AS u, b.doc_id AS v
        FROM documents a JOIN documents b
          ON md5(a.text) = md5(b.text) AND a.doc_id <> b.doc_id
    ),
    seeds AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 0),
    reach(doc_id, hop) AS (
        SELECT doc_id, 0 FROM seeds
        UNION ALL
        SELECT p.v, r.hop + 1
        FROM reach r JOIN pairs p ON p.u = r.doc_id
        WHERE r.hop < 3
    )
    SELECT doc_id, min(hop)::BIGINT AS dist
    FROM reach GROUP BY doc_id
"""


@query("graph_reach_recursive_cte", oracle=_REACH_SQL)
def graph_reach_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE recursive CTE (Spark 4 WITH RECURSIVE): hop-capped BFS
    from seed documents over the exact-duplicate graph — the IDENTICAL
    SQL text runs on both engines.  Spark materializes each recursion
    step like the hand-rolled frontier loop in
    operators/clustering.py:bfs_distances — the cap bounds iteration;
    per-step joins stay keyed.  This closes the recursive-query SQL
    surface natively rather than via library loops."""
    from etl_utils_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_REACH_SQL)


@query(
    "json_variant_props",
    oracle="""
        SELECT event_type,
               count(*)::BIGINT AS n,
               min(json_extract(props, '$.k')::INT) AS k_min,
               max(json_extract(props, '$.k')::INT) AS k_max,
               CAST(SUM(json_extract(props, '$.k')::INT) AS DOUBLE)
                   / CAST(COUNT(json_extract(props, '$.k')::INT) AS DOUBLE)
                   AS k_avg
        FROM events
        GROUP BY event_type
    """,
)
def json_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VariantType
    (parse_json → variant_get): the open-schema path for property
    bags — a variant column parses once and fields extract with typed
    paths, instead of per-field string re-parsing
    (get_json_object × N).  Aggregates the extracted int across event
    types; DuckDB mirrors with json_extract."""
    e = _t(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            (F.sum("k").cast("double") / F.count("k").cast("double")).alias(
                "k_avg"
            ),
        )
    )


@query(
    "gate_hll_sketch_union",
    oracle="SELECT 'datasketches_hll_union' AS variant, CAST(true AS BOOLEAN) AS within_5pct",
)
def gate_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked gate for MERGEABLE distinct-count sketches
    (Apache DataSketches HLL, public Spark 3.5+ surface): per-
    event_type user sketches are stored as binary partials and
    union-merged to a corpus estimate — the incremental pattern where
    daily sketch partials roll up without rescanning history.  The
    merged estimate must land within 5% of the exact distinct count."""
    e = _t(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    est = per_type.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    ).collect()[0]["est"]
    exact = e.agg(F.countDistinct("user_id").alias("n")).collect()[0]["n"]
    ok = abs(est - exact) / exact <= 0.05 if exact else True
    return spark.createDataFrame(
        [("datasketches_hll_union", bool(ok))],
        "variant string, within_5pct boolean",
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "stats_corr_matrix_lineitem",
    oracle=f"""
        WITH b AS (
            SELECT
                {', '.join(
                    f'CAST(CAST({c} AS DECIMAL(18,2)) * 100 AS BIGINT) AS x_{i}'
                    for i, c in enumerate(_CORR_COLS)
                )}
            FROM lineitem
        ),
        m AS (
            SELECT count(*) AS n,
                {', '.join(
                    f'SUM(x_{i}) AS s_{i}, SUM(x_{i} * x_{i}) AS ss_{i}'
                    for i in range(len(_CORR_COLS))
                )},
                {', '.join(
                    f'SUM(x_{i} * x_{j}) AS sp_{i}_{j}'
                    for i in range(len(_CORR_COLS))
                    for j in range(len(_CORR_COLS))
                    if i < j
                )}
            FROM b
        )
        {' UNION ALL '.join(
            f"SELECT '{a}' AS col_a, '{c}' AS col_b, "
            f"ROUND(CAST(n * sp_{i}_{j} - s_{i} * s_{j} AS DOUBLE)"
            f" / sqrt(CAST(n * ss_{i} - s_{i} * s_{i} AS DOUBLE)"
            f" * CAST(n * ss_{j} - s_{j} * s_{j} AS DOUBLE)), 6) + 0.0 AS r "
            f"FROM m"
            for i, a in enumerate(_CORR_COLS)
            for j, c in enumerate(_CORR_COLS)
            if i < j
        )}
    """,
)
def stats_corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix (upper triangle, 4 numeric
    lineitem columns = 6 pairs) in ONE scan: every pair is a mergeable
    moment aggregate in the same hash-aggregate pass; the 1-row result
    unpivots via stack.  No per-pair scans, no driver-side math."""
    li = _t(spark, sf_dir, "lineitem")
    k = len(_CORR_COLS)
    pairs = [(i, j) for i in range(k) for j in range(k) if i < j]
    # Exact integer moments for every column/pair in ONE hash-aggregate
    # pass.  Products overflow int64 at scale, but BigDecimal-backed
    # decimal(38,0) sums on the HOT per-row path measured 40% slower
    # than long arithmetic (r12, guide §2.3 narrower types / §1.2.2
    # per-task work): each long product is instead split into three
    # 20-bit limbs summed as plain longs — exact for any corpus below
    # 2^43 rows (limb sums < 2^63; 100 TB lineitem ≈ 2^39.5 rows) —
    # and the limbs recombine into the IDENTICAL decimal(38,0) moment
    # on the single result row, so every downstream expression (and
    # the oracle match) is bit-for-bit unchanged.  Builtin corr()
    # stays out for the same reason as before (engine-specific
    # accumulation, the r5 rolling-corr red class).  +0.0
    # canonicalizes IEEE negative zero after the round.
    x = [
        (F.col(c).cast("decimal(18,2)") * 100).cast("long").alias(f"x_{i}")
        for i, c in enumerate(_CORR_COLS)
    ]
    b = li.select(*x)
    _M20 = (1 << 20) - 1
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(k):
        aggs.append(F.sum(F.col(f"x_{i}").cast("decimal(18,0)")).alias(f"s_{i}"))

    def _limb_sums(i: int, j: int, name: str) -> list:
        p = F.col(f"x_{i}") * F.col(f"x_{j}")
        return [
            F.sum(p.bitwiseAND(F.lit(_M20))).alias(f"{name}_l0"),
            F.sum(F.shiftright(p, 20).bitwiseAND(F.lit(_M20))).alias(f"{name}_l1"),
            F.sum(F.shiftright(p, 40)).alias(f"{name}_l2"),
        ]

    for i in range(k):
        aggs.extend(_limb_sums(i, i, f"ss_{i}"))
    for i, j in pairs:
        aggs.extend(_limb_sums(i, j, f"sp_{i}_{j}"))
    one = b.agg(*aggs)

    def _recomb(name: str):
        d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
        return (
            d(F.col(f"{name}_l2")) * F.lit(1 << 40).cast("decimal(38,0)")
            + d(F.col(f"{name}_l1")) * F.lit(1 << 20).cast("decimal(38,0)")
            + d(F.col(f"{name}_l0"))
        )

    recombined = [F.col("n")] + [F.col(f"s_{i}") for i in range(k)]
    recombined += [_recomb(f"ss_{i}").alias(f"ss_{i}") for i in range(k)]
    recombined += [_recomb(f"sp_{i}_{j}").alias(f"sp_{i}_{j}") for i, j in pairs]
    one = one.select(*recombined)

    def _r(i: int, j: int):
        num = (F.col("n") * F.col(f"sp_{i}_{j}") - F.col(f"s_{i}") * F.col(f"s_{j}")).cast("double")
        di = (F.col("n") * F.col(f"ss_{i}") - F.col(f"s_{i}") * F.col(f"s_{i}")).cast("double")
        dj = (F.col("n") * F.col(f"ss_{j}") - F.col(f"s_{j}") * F.col(f"s_{j}")).cast("double")
        return F.round(num / F.sqrt(di * dj), 6) + F.lit(0.0)

    one = one.select(
        *[_r(i, j).alias(f"c_{i}_{j}") for i, j in pairs]
    )
    stack_expr = ", ".join(
        f"'{_CORR_COLS[i]}', '{_CORR_COLS[j]}', c_{i}_{j}" for i, j in pairs
    )
    return one.select(
        F.expr(
            f"stack({len(pairs)}, {stack_expr}) AS (col_a, col_b, r)"
        )
    )


@query(
    "sql_udf_scalar_discount",
    oracle="""
        SELECT l_returnflag,
               count(*)::BIGINT AS n,
               CAST(SUM(CAST(
                   CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,2)))
                   AS DECIMAL(28,4))) AS DOUBLE) AS disc_revenue
        FROM lineitem GROUP BY l_returnflag
    """,
)
def sql_udf_scalar_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE SQL-defined scalar function (CREATE FUNCTION ... RETURN
    expr, Spark 4): the discounted-price rule is declared ONCE in pure
    SQL and reused by name — Catalyst inlines the body at analysis
    time, so the call costs nothing at runtime (no Python, no serde;
    the plan is identical to writing the expression inline, which is
    exactly what the oracle does).  Decimal arithmetic inside the
    function keeps the revenue sum exact."""
    from etl_utils_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DECIMAL(18,2), d DECIMAL(4,2))
        RETURNS DECIMAL(28,4)
        RETURN CAST(p * (1 - d) AS DECIMAL(28,4))
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(disc_price(CAST(l_extendedprice AS DECIMAL(18,2)),
                                   CAST(l_discount AS DECIMAL(4,2))))
                    AS DOUBLE) AS disc_revenue
        FROM lineitem GROUP BY l_returnflag
        """
    )


@query(
    "sql_named_param_binding",
    oracle="""
        SELECT o_orderpriority,
               count(*)::BIGINT AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total
        FROM orders
        WHERE o_totalprice >= 50000.0 AND o_orderstatus = 'F'
        GROUP BY o_orderpriority
    """,
)
def sql_named_param_binding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE named-parameter SQL (spark.sql(..., args={...}), Spark
    3.4+): the engine-level twin of the wrapper's :NAME value binding
    (params.py) — markers are typed AST parameters, not string
    splices, so injection is structurally impossible and plans cache
    across bindings.  The oracle folds the same literals in."""
    from etl_utils_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total
        FROM orders
        WHERE o_totalprice >= :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"min_price": 50000.0, "status": "F"},
    )
