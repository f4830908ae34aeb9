"""Unit tests for the scale-ops pack: global-id assignment invariants,
boilerplate passage dedup semantics, CDC last-writer-wins edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_utils_spark.operators.ids import assign_global_ids
from etl_utils_spark.queries import REGISTRY


def test_global_ids_contiguous_and_ordered(spark):
    df = spark.createDataFrame(
        [(k,) for k in [42, 7, 99, 1, 55, 13, 70, 3]], "k bigint"
    )
    out = assign_global_ids(df, "k", num_partitions=3).collect()
    by_key = sorted(out, key=lambda r: r["k"])
    assert [r["global_id"] for r in by_key] == list(range(1, 9))


def test_global_ids_single_row_and_skewed_partitions(spark):
    one = assign_global_ids(
        spark.createDataFrame([(5,)], "k bigint"), "k", num_partitions=4
    ).collect()
    assert one[0]["global_id"] == 1
    # more partitions than rows → empty partitions must not shift offsets
    few = assign_global_ids(
        spark.createDataFrame([(2,), (1,)], "k bigint"), "k", num_partitions=8
    ).collect()
    assert {(r["k"], r["global_id"]) for r in few} == {(1, 1), (2, 2)}


def test_global_ids_no_global_window(spark, sf_dir):
    # r12: the operator now runs its in-bucket running aggregate as a
    # JVM window PARTITIONED BY the literal-boundary bucket id (bounded
    # partitions).  The scale property this gate protects is "no
    # single-reducer stage": every exchange must be the bucket hash
    # shuffle, never a 1-partition exchange feeding a global window.
    plan = (
        REGISTRY["assign_global_ids_docs"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the data-scale pass: bucket hash shuffle + bucket-partitioned
    # window (never an unpartitioned window over the rows)
    assert "hashpartitioning(_bucket" in plan, plan[:800]
    assert "row_number() windowspecdefinition(_bucket" in plan, plan[:800]
    # any SinglePartition exchange must sit above the per-bucket
    # totals aggregate (<= num_partitions rows, bounded by the
    # constant bucket count) — never above a data-scale subtree
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            below = "\n".join(lines[i + 1 : i + 3])
            assert "HashAggregate(keys=[_bucket" in below, plan[:800]


def test_boilerplate_dedup_drops_shared_passages(spark):
    # two identical docs + one unique: every passage of the dup pair is
    # boilerplate (>=2 docs), the unique doc is untouched.
    rows = [
        (1, "a b c d e f g h i j k l"),
        (2, "a b c d e f g h i j k l"),
        (3, "unique words only here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    df.createOrReplaceTempView("_docs_boiler")
    from etl_utils_spark.queries import scale_ops  # noqa: F401

    # reuse the query body on a temp frame via its building blocks
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    base = df.select("doc_id", toks.alias("toks"))
    n_chunks = F.ceil(F.size("toks") / 10.0).cast("long")
    chunks = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(F.slice("toks", i * 10 + 1, 10), " "),
            )
        ).alias("pos", "passage"),
    )
    freq = chunks.groupBy("passage").agg(F.countDistinct("doc_id").alias("n"))
    shared = {r["passage"] for r in freq.where("n >= 2").collect()}
    assert shared == {"a b c d e f g h i j", "k l"}


def test_global_ids_carry_across_small_arrow_batches(spark):
    # Tiny Arrow batches force the per-partition counter to carry
    # across batch boundaries inside one bucket.
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        df = spark.createDataFrame([(k,) for k in range(100)], "k bigint")
        out = assign_global_ids(df, "k", num_partitions=4).collect()
        assert sorted((r["k"], r["global_id"]) for r in out) == [
            (k, k + 1) for k in range(100)
        ]
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_prefix_sum_exact_with_small_batches(spark):
    from etl_utils_spark.operators.ids import prefix_sum

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        rows = [(k, (k * 7) % 13) for k in range(50)]
        df = spark.createDataFrame(rows, "k bigint, v bigint")
        out = {
            r["k"]: r["running_total"]
            for r in prefix_sum(df, "k", "v", num_partitions=5).collect()
        }
        acc = 0
        for k, v in rows:
            acc += v
            assert out[k] == acc, (k, out[k], acc)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_bpe_greedy_overlap_and_chaining(spark):
    from etl_utils_spark.operators.bpe import learn_merges

    # 'a a a': round 0 counts pair (a,a)=2 but the left-to-right merge
    # fuses only the first occurrence -> [aa, a]; round 1 then merges
    # (aa, a). This pins the non-overlapping replace semantics.
    df = spark.createDataFrame([("a a a",)], "text string")
    corpus = df.select(F.split("text", " ").alias("toks"))
    rules = learn_merges(corpus, F.col("toks"), 2)
    assert rules[0] == (0, "a", "a", 2)
    assert rules[1] == (1, "aa", "a", 1)


def test_bpe_tie_break_smallest_pair(spark):
    from etl_utils_spark.operators.bpe import learn_merges

    # both (b,a) and (a,b) occur once -> tie broken to ('a','b')
    df = spark.createDataFrame([("b a b",)], "text string")
    corpus = df.select(F.split("text", " ").alias("toks"))
    rules = learn_merges(corpus, F.col("toks"), 1)
    assert rules[0][1:3] == ("a", "b")


def test_cdc_delete_tombstone_removes_user(spark, sf_dir):
    out = REGISTRY["cdc_apply_changes"].fn(spark, sf_dir)
    assert out.where(F.col("last_op") == "delete").count() == 0
    # every surviving user's last event in the raw log is not a purchase
    from etl_utils_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    last = (
        e.groupBy("user_id")
        .agg(F.max_by("event_type", F.struct("ts", "event_id")).alias("t"))
    )
    survivors = {r["user_id"] for r in out.collect()}
    for r in last.collect():
        assert (r["t"] != "purchase") == (r["user_id"] in survivors)


def test_new_ops_scans_are_column_pruned(spark, sf_dir):
    from etl_utils_spark.plans import read_schema_columns

    # global ids must scan ONLY the key column
    schemas = read_schema_columns(REGISTRY["assign_global_ids_docs"].fn(spark, sf_dir))
    assert all(s <= {"doc_id"} for s in schemas), schemas
    # shard packing needs only (doc_id, text)
    schemas = read_schema_columns(REGISTRY["shard_assign_docs"].fn(spark, sf_dir))
    assert all(s <= {"doc_id", "text"} for s in schemas), schemas
    # journeys need only the three journey columns + type
    schemas = read_schema_columns(
        REGISTRY["match_pattern_user_journeys"].fn(spark, sf_dir)
    )
    assert all(
        s <= {"user_id", "ts", "event_id", "event_type"} for s in schemas
    ), schemas


def test_pattern_overlap_semantics(spark):
    # 'vcvcp' contains ONE non-overlapping 'vc*p' hit starting at the
    # first v? No: regex scan finds the LEFTMOST match 'vc*p' = 'vcvcp'?
    # 'v' then 'c*' greedily eats 'cvc'? 'c*' matches only 'c's, so the
    # leftmost match anchors at index 0: 'vc' then needs 'p' but sees
    # 'v' -> backtrack -> 'vc?p' fails at 0; next anchor index 2 'vcp'
    # matches. Exactly one hit. Pin it in both engines.
    import duckdb

    con = duckdb.connect()
    d = con.execute(
        "SELECT len(regexp_extract_all('vcvcp', 'vc*p'))"
    ).fetchone()[0]
    s = spark.sql(
        "SELECT size(regexp_extract_all('vcvcp', 'vc*p', 0))"
    ).collect()[0][0]
    assert d == s == 1


def test_bloom_no_false_negatives_and_low_fp(spark):
    from etl_utils_spark.operators.bloom import build_bitmap, might_contain

    members = spark.range(0, 2000).withColumnRenamed("id", "k")
    bitmap = build_bitmap(members, "k")
    # no false negatives: every member passes
    hits = members.where(might_contain(F.col("k"), bitmap)).count()
    assert hits == 2000
    # false-positive rate on 10k disjoint keys stays tiny
    probes = spark.range(1_000_000, 1_010_000).withColumnRenamed("id", "k")
    fp = probes.where(might_contain(F.col("k"), bitmap)).count()
    assert fp < 50, fp  # ~5e-5 expected at this load


def test_bloom_prefilter_prunes_before_join(spark, sf_dir):
    df = REGISTRY["join_bloom_prefilter"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the literal-bitmap predicate (xxhash64 probes) must sit in a
    # Filter, and the exact semi join must still be present
    assert "xxhash64" in plan, plan[:1200]
    assert "LeftSemi" in plan or "left_semi" in plan, plan[:1200]


def test_corr_matrix_diagonal_free_and_bounded(spark, sf_dir):
    rows = REGISTRY["stats_corr_matrix_lineitem"].fn(spark, sf_dir).collect()
    assert len(rows) == 6
    order = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    for r in rows:
        assert order.index(r["col_a"]) < order.index(r["col_b"])
        assert -1.0 <= r["r"] <= 1.0
