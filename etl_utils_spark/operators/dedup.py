"""Deduplication operators (north star C8): exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale design (the whole point of these shapes at 100 TB):
- exact: group by a 128-bit content hash — the shuffle carries 16-byte
  keys, never document bodies.
- n-gram Jaccard: inverted-index self-join on shingles (candidate pairs
  share ≥1 shingle) — the exact-similarity join that avoids the O(n²)
  cross product entirely.
- MinHash+LSH: fixed-size signatures (k hashes) + banding → candidate
  buckets; only bucket-mates are pair-verified. Signature size is
  constant per doc regardless of doc length.
- SimHash: one 64-bit signature per doc computed with 64 aggregate
  expressions over (doc, token, count) — no bit-explosion shuffle; byte
  bands give Hamming-candidate buckets.

All pure DataFrame/Catalyst; deterministic hash functions (xxhash64
with literal seeds) so results are stable across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# ----------------------------------------------------------------- exact

def exact_dedup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per distinct content hash: the kept (minimum) id and the
    duplicate count. Hash-groupBy, never text-groupBy."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(df: DataFrame, subset: list[str]) -> DataFrame:
    """Keep one arbitrary row per key — Spark's native dropDuplicates
    (hash shuffle on the subset columns only)."""
    return df.dropDuplicates(subset)


# -------------------------------------------------------------- shingles

def shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    The input is spread across the session's full parallelism first:
    document tables often arrive as few large files, and the
    shingle-explode is the CPU-heavy step — it must never run on a
    handful of input-split-shaped partitions.  The repartition is
    UNCONDITIONAL: probing df.rdd.getNumPartitions() compiles the
    physical plan twice for a number AQE coalescing makes moot, and
    the pre-explode rows are the smallest this pipeline will ever be —
    one cheap shuffle before a 10-100× amplification step."""
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    # Materialize the token array in its own Project BEFORE the gram
    # transform (r12, guide §1.2.2): written inline, split(text) is
    # substituted into EVERY element_at of the generator — n re-splits
    # per gram = O(n·len²) work per document, and the resulting
    # generated method is large enough that the JIT sometimes leaves it
    # interpreted (measured: the same sf0.1 shingle count() swinging
    # 13→250 JVM-CPU-seconds run-to-run).  With `w` projected once,
    # grams are row-local array slices: 4-6× less CPU, linear in len,
    # stable.
    toks = df.select(
        F.col(id_col).alias("sid"), F.split(F.col(text_col), " ").alias("w")
    )
    # guard: sequence(0, negative) would generate a DESCENDING range
    grams = F.when(
        F.size("w") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("w") - n),
            lambda i: F.array_join(F.slice("w", i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks.select(
        "sid", F.explode(F.array_distinct(grams)).alias("shingle")
    )


def md5_60(c: Column) -> Column:
    """Cross-engine-deterministic 60-bit hash: the first 15 hex chars
    of md5 parsed to a BIGINT (always positive, so signed shifts match
    unsigned ones).  Slower than xxhash64 — it exists so the dedup
    pipelines can run a bit-replayable flavor against engines that lack
    xxhash64 (DuckDB: ``('0x'||substr(md5(x),1,15))::BIGINT``, verified
    bit-identical to this expression)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _hash60(c: Column, hash_family: str) -> Column:
    """Dispatch the pipeline hash primitive: production runs xxhash64
    (JVM-native, fastest); ``md5_60`` is the oracle-replayable flavor.
    Both return BIGINT, so every downstream band/bucket/verify stage is
    byte-for-byte the same plan either way."""
    if hash_family == "xxh64":
        return F.xxhash64(c)
    if hash_family == "md5_60":
        return md5_60(c)
    raise ValueError(f"unknown hash_family: {hash_family}")


def hashed_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 2,
    hash_family: str = "xxh64",
) -> DataFrame:
    """(sid, sh) with sh = hash(shingle): the join/groupBy currency
    of every dedup pipeline here. Long keys make exchanges and hash
    tables several times cheaper than strings; at corpus scale the
    64-bit space keeps collision noise negligible."""
    return shingles(df, id_col, text_col, n).select(
        "sid", _hash60(F.col("shingle"), hash_family).alias("sh")
    )


def _posting_pair_counts(sh: DataFrame) -> DataFrame:
    """(id_a < id_b, n_inter = shared-shingle count) from a (sid, sh)
    frame via per-shingle posting lists (r12, guide §2.4): ONE exchange
    builds sorted posting arrays per shingle, all ordered pairs expand
    ROW-LOCALLY with nested Catalyst ``transform`` (sorted order makes
    a < b structural), and one more exchange counts pairs.  Replaces
    the inverted-index SELF-JOIN, which shuffled the shingle frame
    twice more and hash-joined it against itself.

    The pair fan-out of a hot shingle is identical to the join's
    (candidate-pair count is a property of EXACT pairwise semantics,
    not of the plan); the posting array additionally materializes the
    hot doc-list per row, so truly corpus-scale dedup belongs to the
    prefix-filter / MinHash / SimHash operators — this is the exact
    face."""
    posting = sh.groupBy("sh").agg(F.sort_array(F.collect_list("sid")).alias("ids"))
    pair_arr = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size("ids") - i - F.lit(1)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        posting.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.2,
) -> DataFrame:
    """EXACT n-gram Jaccard similarity pairs via per-shingle posting
    lists (:func:`_posting_pair_counts` — one exchange + row-local pair
    expansion instead of the former inverted-index self-join).

    candidate pairs = docs sharing ≥1 shingle (an exact superset of any
    pair with J>0); per pair, |A∩B| falls out of the pair count and
    |A|,|B| from per-doc shingle counts. Output: (id_a, id_b, jaccard)
    with id_a < id_b, jaccard ≥ threshold."""
    sh = hashed_shingles(df, id_col, text_col, n).cache()
    sizes = sh.groupBy("sid").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = _posting_pair_counts(sh)
    sa = sizes.select(F.col("sid").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("sid").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def overlap_coefficient_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT overlap-coefficient pairs: |A∩B| / min(|A|,|B|) ≥ threshold.

    The containment measure Jaccard misses: a short document quoted
    verbatim inside a long one scores overlap ≈ 1 but Jaccard ≈
    |A|/|B| → 0, so near-containment dedup (boilerplate, embedded
    quotes, subset pages) needs this join. Same posting-list shape as
    :func:`ngram_jaccard_pairs` — candidates share ≥1 shingle, which is
    exact for any threshold > 0."""
    sh = hashed_shingles(df, id_col, text_col, n).cache()
    sizes = sh.groupBy("sid").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = _posting_pair_counts(sh)
    sa = sizes.select(F.col("sid").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("sid").alias("id_b"), F.col("n_sh").alias("n_b"))
    ovl = F.col("n_inter").cast("double") / F.least(F.col("n_a"), F.col("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", ovl.alias("overlap"))
        .filter(F.col("overlap") >= threshold)
    )


def jaccard_prefix_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """EXACT Jaccard ≥ threshold pairs via PREFIX FILTERING (Chaudhuri
    et al. SSJoin / Bayardo et al. All-Pairs — public algorithms).

    The plain inverted-index join indexes EVERY shingle, so candidate
    volume is driven by the most frequent shingle (Zipf head — at 100 TB
    the hot-shingle bucket alone is quadratic). Prefix filtering indexes
    only each document's p = |d| − ceil(t·|d|) + 1 RAREST shingles
    (global document-frequency order): for any pair with J ≥ t the
    smallest common shingle in that order provably lands in BOTH
    prefixes (if it didn't, the ≥ t·|d| common shingles would have to
    fit in a suffix of size < t·|d|). High thresholds shrink prefixes
    toward a handful of rare shingles — candidate volume collapses while
    recall stays exactly 1. A size filter (t·|a| ≤ |b| ≤ |a|/t, another
    J ≥ t implication) prunes cross-size candidates before the verify.

    Verification computes true Jaccard on full shingle sets, so output
    equals the brute inverted-index join at the same threshold."""
    sh = hashed_shingles(df, id_col, text_col, n)

    # r12 (guide §2.4): dfreq is a count window over the shingle
    # partition — exactly the old groupBy(sh)+join-back count, but the
    # explode+hash pipeline now feeds ONE plan branch (the sh cache and
    # the join's second sh-keyed exchange are gone; a hot shingle lands
    # on one window task exactly as it landed on one join task).
    # ONE groupBy then materializes each doc's full (dfreq, sh) list;
    # the global-order rank is an ARRAY-SIDE sort of ~|d| elements
    # instead of a corpus-wide window sort, and the same frame serves
    # both the prefix (slice) and the verify sets (the sh projection) —
    # no second pass over the shingles.
    per_doc = (
        sh.withColumn("dfreq", F.count(F.lit(1)).over(Window.partitionBy("sh")))
        .groupBy("sid")
        .agg(F.array_sort(F.collect_list(F.struct("dfreq", "sh"))).alias("items"))
        .withColumn("n_sh", F.size("items"))
        .withColumn("sh_set", F.col("items.sh"))
        .cache()
    )
    prefix_len = F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    prefix = per_doc.select(
        "sid",
        "n_sh",
        F.explode(F.slice(F.col("items.sh"), F.lit(1), prefix_len)).alias("sh"),
    )
    # r12 (guide §2.4): per-prefix-shingle posting arrays replace the
    # prefix self-join — one exchange instead of two + ShuffledHashJoin,
    # with pairs (and the size filter) expanded row-locally.  Prefix
    # postings are short BY CONSTRUCTION (prefix filtering indexes only
    # each doc's rarest shingles — that is the algorithm's point), so
    # the per-row array is bounded in practice where a raw
    # inverted-index posting would not be.  Verified result-identical
    # to the join formulation at sf0.1 before the switch.
    post = prefix.groupBy("sh").agg(
        F.array_sort(F.collect_list(F.struct("sid", "n_sh"))).alias("ps")
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + F.lit(2), F.size("ps") - i - F.lit(1)),
                lambda y: F.struct(
                    x.sid.alias("id_a"),
                    x.n_sh.alias("n_a"),
                    y.sid.alias("id_b"),
                    y.n_sh.alias("n_b"),
                ),
            ),
        )
    )
    # cached for the same two-reader reason as minhash_lsh_pairs
    cands = (
        post.select(F.explode(pair_arr).alias("p"))
        .select("p.*")
        .filter(
            (F.col("n_b") >= F.lit(threshold) * F.col("n_a"))
            & (F.col("n_a") >= F.lit(threshold) * F.col("n_b"))
        )
        .select("id_a", "id_b")
        .distinct()
        .cache()
    )
    cand_ids = (
        cands.select(F.col("id_a").alias("sid"))
        .union(cands.select(F.col("id_b").alias("sid")))
        .distinct()
    )
    # sets only for docs in some candidate pair — gathering the whole
    # corpus would dominate at scale (see minhash_lsh_pairs)
    sets = per_doc.join(cand_ids, "sid", "left_semi").select("sid", "sh_set")
    sa = sets.select(F.col("sid").alias("id_a"), F.col("sh_set").alias("set_a"))
    sb = sets.select(F.col("sid").alias("id_b"), F.col("sh_set").alias("set_b"))
    n_inter = F.size(F.array_intersect("set_a", "set_b"))
    jac = n_inter.cast("double") / (F.size("set_a") + F.size("set_b") - n_inter)
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------- minhash

def _seeded_hash(i: int, c: Column, hash_family: str) -> Column:
    """Seeded per-permutation hash for MinHash.  xxh64 takes the seed
    as a leading hashed value (long-typed, no string concat on the hot
    path); md5_60 folds the seed into the digested string — the concat
    is what makes the same value reproducible in plain SQL."""
    if hash_family == "xxh64":
        return F.xxhash64(F.lit(i), c)
    return md5_60(F.concat_ws(":", F.lit(str(i)), c.cast("string")))


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 32, hash_family: str = "xxh64"
) -> DataFrame:
    """MinHash signature per doc from a (sid, sh) hashed-shingle
    DataFrame: h_i = min over shingles of hash(i, sh). One groupBy
    with num_hashes min-aggregates — constant-size state per doc,
    long-typed hashing throughout (no per-hash string concat)."""
    aggs = [
        F.min(_seeded_hash(i, F.col("sh"), hash_family)).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("sid").agg(*aggs)
    return sig.select(
        "sid", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    hash_family: str = "xxh64",
) -> DataFrame:
    """MinHash + LSH banding near-dup candidates, verified with exact
    Jaccard. bands=8 × rows=4 over 32 hashes → catches J≳0.3 pairs with
    high probability; every candidate is then exactly verified, so the
    output has no false positives (only possible false negatives, the
    standard LSH trade)."""
    rows_per_band = num_hashes // bands
    sh = hashed_shingles(df, id_col, text_col, n, hash_family).cache()
    sig = minhash_signatures(sh, num_hashes, hash_family)

    band_arr = F.array(
        *[
            _hash60(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at("signature", b * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ],
                ),
                hash_family,
            )
            for b in range(bands)
        ]
    )
    banded = sig.select("sid", F.posexplode(band_arr).alias("band", "band_hash"))

    la = banded.select(F.col("sid").alias("id_a"), "band", "band_hash")
    lb = banded.select(F.col("sid").alias("id_b"), "band", "band_hash")
    # cached: the verify stage reads candidates twice (once to bound
    # the set-gather, once for the pair join) — without the cache the
    # whole banding pipeline re-executes per branch
    cands = (
        la.join(lb, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .cache()
    )

    # exact verification: candidates are FEW (that is LSH's point), so
    # join each pair to the two docs' shingle-hash SETS and intersect —
    # never re-running the full inverted-index join. Sets are gathered
    # ONLY for docs that appear in some candidate pair (semi join
    # first): at corpus scale collect_set over every document would
    # dwarf the verify itself.
    cand_ids = (
        cands.select(F.col("id_a").alias("sid"))
        .union(cands.select(F.col("id_b").alias("sid")))
        .distinct()
    )
    sets = (
        sh.join(cand_ids, "sid", "left_semi")
        .groupBy("sid")
        .agg(F.collect_set("sh").alias("sh_set"))
    )
    sa = sets.select(F.col("sid").alias("id_a"), F.col("sh_set").alias("set_a"))
    sb = sets.select(F.col("sid").alias("id_b"), F.col("sh_set").alias("set_b"))
    n_inter = F.size(F.array_intersect("set_a", "set_b"))
    jac = n_inter.cast("double") / (
        F.size("set_a") + F.size("set_b") - n_inter
    )
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------- simhash

def simhash_bits(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash as a bit array per doc — a view over
    :func:`simhash_sig`'s packed long (single source of truth for the
    per-bit aggregates), unpacked with 64 shift-and-mask projections."""
    sg = simhash_sig(df, id_col, text_col)
    # one F.expr call, not 64 Column chains (see simhash_sig note 2)
    bits_sql = "array({})".format(
        ", ".join(
            f"CAST(shiftrightunsigned(sig, {j}) & 1 AS INT)" for j in range(64)
        )
    )
    return sg.select("sid", F.expr(bits_sql).alias("bits"))


def simhash_sig(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    hash_family: str = "xxh64", bits: int = 64,
) -> DataFrame:
    """Packed ``bits``-bit SimHash signature per doc: (sid, sig bigint).

    Same per-bit aggregates as :func:`simhash_bits`, but the sign
    bits are OR-packed into ONE long — every downstream exchange then
    carries 8 bytes per doc instead of a 64-element array, and Hamming
    distance is a single ``bit_count(sig_a ^ sig_b)`` instead of a
    64-step ``zip_with`` fold.  The md5_60 flavor uses bits=60 (the
    hash is 60 bits wide and always positive, so signed ``>>`` in plain
    SQL reproduces every shift exactly).

    Shape (r12, guide §2.3-2.4): ONE exchange.  The per-bit ±1 sums run
    directly over exploded token instances with map-side partial
    aggregation on ``sid`` — arithmetically identical to the previous
    per-(sid, token) pre-count (an integer sum commutes over collapsing
    duplicate tokens: Σ_instances sign_j = Σ_tokens cnt·sign_j), but
    the (sid, token-string) pre-count exchange is gone and the hash is
    a projected column computed once per instance pre-shuffle instead
    of a string-keyed group plus 60-64 hash-expression references.
    Verified bit-identical on both hash families before the switch."""
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    tok = df.select(
        F.col(id_col).alias("sid"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).select("sid", _hash60(F.col("token"), hash_family).alias("h"))
    # r13 (guide §1.2.2 + §5-driver): two changes, same values.
    #
    # 1. LANE-PACKED bit counting: the previous shape was one
    #    conditional ±1 sum PER BIT (60-64 CASE aggregates per token
    #    instance).  Lane k's plain integer sum
    #        s_k = Σ ((h >>> k) & 0x0000000100000001)
    #    accumulates cnt(bit k) in the low 32-bit lane and cnt(bit
    #    k+32) in the high lane of ONE long (no lane carry while a doc
    #    has < 2³² token instances; sums stay < 2⁶³).  32 branch-free
    #    aggregates + one count replace 60-64 CASE aggregates; the
    #    per-bit majority b_j = 2·cnt_j − n > 0 is evaluated once per
    #    GROUP in the projection, reproducing the old ±1-sum sign
    #    bit-identically (b_j = cnt_j − (n − cnt_j)).
    # 2. The aggregate list and the packed-signature projection are
    #    built as SQL STRINGS (one F.expr py4j call each), not as
    #    64-deep Column-method chains: measured 1.6-3.5s of pure
    #    DRIVER-side plan construction per query build (hundreds of
    #    py4j round-trips) for the old chain, ~50ms this way.  The
    #    parsed expression tree — and therefore the physical plan and
    #    every value — is the same.
    lane_mask = (1 << 32) | 1
    agg = tok.groupBy("sid").agg(
        *[
            F.expr(f"sum(shiftrightunsigned(h, {k}) & {lane_mask}L)").alias(f"s{k}")
            for k in range(min(32, bits))
        ],
        F.count(F.lit(1)).alias("_n"),
    )

    def _cnt_sql(j: int) -> str:
        return (
            f"(s{j} & {(1 << 32) - 1}L)"
            if j < 32
            else f"shiftrightunsigned(s{j - 32}, 32)"
        )

    sig_sql = " | ".join(
        f"IF(2 * {_cnt_sql(j)} - _n > 0, shiftleft(1L, {j}), 0L)"
        for j in range(bits)
    )
    return agg.select("sid", F.expr(sig_sql).alias("sig"))


def _chunk_expr(b: int, chunk_bits: int) -> Column:
    """Band b's chunk of the packed signature.  A 64-bit chunk (bands=1,
    the max_hamming=0 exact-duplicate configuration) skips the mask —
    (1<<64)-1 does not fit a Spark long literal and the shifted value
    already IS the whole signature."""
    e = F.shiftrightunsigned("sig", b * chunk_bits)
    if chunk_bits >= 64:
        return e
    return e.bitwiseAND(F.lit((1 << chunk_bits) - 1))


def _simhash_banded(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int,
    bands: int | None,
    hash_family: str,
    bits: int,
) -> DataFrame:
    """Banded signature frame (sid, sig, band, chunk) — the shared
    input of the candidate stage and the bucket-size audit, built ONCE
    so :func:`simhash_bucket_stats` never pays the signature pipeline
    twice (code-review r10)."""
    bands = bands or (max_hamming + 1)
    chunk_bits = bits // bands
    sg = simhash_sig(df, id_col, text_col, hash_family, bits)
    chunks = F.array(*[_chunk_expr(b, chunk_bits) for b in range(bands)])
    return sg.select("sid", "sig", F.posexplode(chunks).alias("band", "chunk"))


def _candidates_from_banded(banded: DataFrame, bucket_cap: int | None) -> DataFrame:
    """Pre-verify candidate pairs: (band, chunk, id_a, sig_a, id_b,
    sig_b) with id_a < id_b — the fan-out stage that
    :func:`simhash_bucket_stats` audits and :func:`simhash_pairs`
    Hamming-filters.

    With ``bucket_cap=None`` every bucket self-joins fully (exact
    pigeonhole candidates, C(n,2) per bucket).  With a cap, buckets
    whose membership exceeds it switch to STAR pairing: each member is
    verified only against the bucket's minimum-id representative, so
    per-bucket fan-out is n-1 instead of C(n,2).  Star pairing keeps
    cluster RECOVERY (every member links to the representative, so
    connected components still merge the clique) while bounding the
    one quadratic face of the pipeline — a pathological duplicate
    cluster (mirror sites) can no longer explode a band bucket.  Pair
    RECALL inside an over-cap bucket is reduced to the star by design;
    pairs reachable through any other (small) band bucket are still
    emitted, and the final distinct dedups across paths."""
    if bucket_cap is None:
        la = banded.select(
            F.col("sid").alias("id_a"), F.col("sig").alias("sig_a"), "band", "chunk"
        )
        lb = banded.select(
            F.col("sid").alias("id_b"), F.col("sig").alias("sig_b"), "band", "chunk"
        )
        return la.join(lb.hint("shuffle_hash"), ["band", "chunk"]).filter(
            F.col("id_a") < F.col("id_b")
        )
    from pyspark.sql.window import Window

    # One shuffle on the bucket key (the same key the join would
    # shuffle on) computes membership count and the min-id
    # representative's (sid, sig) — lexicographic struct-min is
    # min-by-sid because sid leads the struct.  The windowed frame has
    # three consumers (small side a, small side b, star), so
    # localCheckpoint it: without this each consumer rebuilds the
    # whole signature pipeline (the semdedup.py:156 idiom; persist()
    # on a real cluster).  LAZY (eager=False, advice r10): merely
    # CONSTRUCTING the registered query (plan inspection, dry
    # registration) must not run a Spark job — the blocks materialize
    # at the first action and are shared by every later consumer.
    w = Window.partitionBy("band", "chunk")
    sized = (
        banded.withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("rep", F.min(F.struct("sid", "sig")).over(w))
        .localCheckpoint(eager=False)
    )
    small = sized.filter(F.col("n") <= bucket_cap)
    sa = small.select(
        F.col("sid").alias("id_a"), F.col("sig").alias("sig_a"), "band", "chunk"
    )
    sb = small.select(
        F.col("sid").alias("id_b"), F.col("sig").alias("sig_b"), "band", "chunk"
    )
    small_pairs = sa.join(sb.hint("shuffle_hash"), ["band", "chunk"]).filter(
        F.col("id_a") < F.col("id_b")
    )
    star_pairs = (
        sized.filter(F.col("n") > bucket_cap)
        .filter(F.col("sid") != F.col("rep.sid"))
        .select(
            "band",
            "chunk",
            F.col("rep.sid").alias("id_a"),
            F.col("rep.sig").alias("sig_a"),
            F.col("sid").alias("id_b"),
            F.col("sig").alias("sig_b"),
        )
    )
    return small_pairs.select(
        "band", "chunk", "id_a", "sig_a", "id_b", "sig_b"
    ).unionByName(star_pairs)


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int | None = None,
    hash_family: str = "xxh64",
    bits: int = 64,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Candidate generation: split the packed 64-bit signature into
    ``max_hamming + 1`` chunks; by pigeonhole, any pair with Hamming ≤
    max_hamming shares at least one identical chunk → bucket-join on
    (band, chunk). Right-sizing the band count to the Hamming budget
    matters for skew: 4 bands of 16 bits give a 65536-value chunk space
    versus 256 for byte-chunks, so correlated-bit corpora (natural
    language is one — common tokens drag many docs to the same byte
    patterns) produce quadratically smaller buckets. The exact Hamming
    filter runs as ``bit_count(sig_a ^ sig_b)`` directly on the bucket
    join output — 8-byte signatures ride along the join, the ≤ filter
    prunes before the distinct's shuffle ever materializes the
    candidate blowup.

    ``bucket_cap`` bounds the residual quadratic face: buckets larger
    than the cap are star-paired against their min-id representative
    (see :func:`_candidates_from_banded`) so per-bucket fan-out is linear.
    ``None`` (the default) keeps the exact full-pairwise candidates."""
    banded = _simhash_banded(df, id_col, text_col, max_hamming, bands, hash_family, bits)
    cand = _candidates_from_banded(banded, bucket_cap)
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_bucket_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int | None = None,
    hash_family: str = "xxh64",
    bits: int = 64,
    bucket_cap: int = 512,
) -> DataFrame:
    """One-row audit of the bounded candidate stage: counts the ACTUAL
    per-bucket candidate fan-out that :func:`_candidates_from_banded`
    generates under ``bucket_cap`` and checks it against the analytic
    bound (n-1 for over-cap buckets, C(n,2) otherwise).  Cross-engine
    equality with an oracle that derives the same numbers purely from
    bucket sizes proves the implementation honors the cap — the
    driver-visible gate VERDICT r9 asked for (weak item 1)."""
    # ONE banded frame feeds both the size audit and the candidate
    # stage — localCheckpointed so the signature pipeline (the
    # heaviest linear stage) runs once, not twice (code-review r10).
    # Lazy (advice r10): no job at construction time; the downstream
    # sized-frame checkpoint then reads these blocks instead of
    # re-deriving the pipeline, so nothing materializes twice.
    banded = _simhash_banded(
        df, id_col, text_col, max_hamming, bands, hash_family, bits
    ).localCheckpoint(eager=False)
    sizes = banded.groupBy("band", "chunk").agg(F.count(F.lit(1)).alias("n")).filter(
        F.col("n") >= 2
    )
    cand = _candidates_from_banded(banded, bucket_cap)
    actual = cand.groupBy("band", "chunk").agg(F.count(F.lit(1)).alias("n_cand"))
    per_bucket = sizes.join(actual, ["band", "chunk"], "left").select(
        "n", F.coalesce("n_cand", F.lit(0)).alias("n_cand")
    )
    cap = F.lit(bucket_cap).cast("long")
    linear_bound = F.lit(bucket_cap * (bucket_cap - 1) // 2).cast("long")
    return per_bucket.agg(
        F.lit(hash_family).alias("variant"),
        F.lit(bucket_cap).cast("long").alias("cap"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum((F.col("n") > cap).cast("long")).alias("n_buckets_capped"),
        F.max("n").alias("max_bucket_n"),
        F.max("n_cand").alias("max_cand_per_bucket"),
        # coalesce(True): on a corpus with NO bucket of size >= 2 the
        # aggregates are NULL — the cap is trivially honored, and the
        # oracle must agree (code-review r10)
        F.coalesce(
            F.sum(
                F.abs(
                    F.col("n_cand")
                    - F.when(F.col("n") > cap, F.col("n") - 1).otherwise(
                        F.expr("(n*(n-1)) div 2")
                    )
                )
            )
            == 0,
            F.lit(True),
        ).alias("matches_analytic"),
        F.coalesce(
            F.max(F.when(F.col("n") > cap, F.lit(0)).otherwise(F.col("n_cand")))
            <= linear_bound,
            F.lit(True),
        ).alias("bound_ok"),
    )


# ------------------------------------------------- embedding near-dup

def dvec(c: str | Column) -> Column:
    """Cast a float vector to double elementwise — both engines then
    compute bit-identical sequential dot products."""
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs with hash blocking.

    ``block_col`` bounds the pair space (same-block pairs only) — the
    blocking key at 100 TB would be an LSH bucket (see similarity.py);
    here the fixture's label column plays that role. Exact cosine on
    double-cast vectors."""
    cols = [F.col(id_col), dvec(vec_col).alias("v")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    base = df.select(*cols)
    a = base.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"), *( [F.col("blk")] if block_col else []))
    b = base.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"), *( [F.col("blk")] if block_col else []))
    # a plain block join would leave ≤ n_blocks busy partitions (block
    # keys are few); instead spread the probe side uniformly and
    # broadcast the build side — the (CPU-bound) cosine evaluation then
    # runs map-side at full parallelism with no wide pair shuffle. At a
    # scale where the build side outgrows broadcast, the block key
    # becomes an LSH bucket and both sides repartition on it.
    a = a.repartition(df.sparkSession.sparkContext.defaultParallelism)
    joined = a.join(F.broadcast(b), ["blk"]) if block_col else a.crossJoin(F.broadcast(b))
    pairs = joined.filter(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)


def cdc_chunk_digests(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    mod: int = 61,
) -> DataFrame:
    """Content-defined chunking: split each document at positions where
    the trailing ``window``-byte sum ≡ 0 (mod ``mod``) — boundaries
    depend ONLY on local content, so an insertion early in a document
    shifts at most one chunk (the property fixed-size chunking lacks),
    and identical passages in different documents produce identical
    chunk digests.  Expected chunk length ≈ ``mod`` bytes.

    Sub-document dedup is what doc-level fingerprints miss: shared
    boilerplate/quotes surface as duplicate chunk digests across
    otherwise-distinct documents.

    Each byte is mixed first (Knuth multiplicative hash mod a prime)
    — a raw byte-sum boundary almost never fires on natural-language
    alphabets (residues cluster); mixing restores ~1/mod boundary
    density while staying position-independent.

    Implementation is an Arrow-batched mapInPandas scan (numpy cumsum
    for the sliding sums, md5 per chunk) — narrow, no shuffle; one
    Python call per batch.  The arithmetic is exact integers over
    ASCII bytes, so a SQL engine computing the same window sum and
    md5(substring) reproduces the digests byte-for-byte (the DuckDB
    oracle does exactly that)."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("chunk_digest", T.StringType()),
            T.StructField("chunk_len", T.LongType()),
        ]
    )

    def _run(batches):
        for pdf in batches:
            ids, digs, lens = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                b = text.encode("utf-8")
                n = len(b)
                if n == 0:
                    continue
                codes = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                mixed = (codes * 2654435761) % 1000003
                cs = np.concatenate(([0], np.cumsum(mixed)))
                # trailing-window sums for 1-based positions i >= window
                wsum = cs[window:] - cs[:-window]
                bpos = (np.nonzero(wsum % mod == 0)[0] + window).tolist()
                starts = [1] + [p for p in bpos if p != 1]
                starts = sorted(set(starts))
                for k, s in enumerate(starts):
                    e = starts[k + 1] if k + 1 < len(starts) else n + 1
                    digs.append(hashlib.md5(b[s - 1 : e - 1]).hexdigest())
                    ids.append(int(doc_id))
                    lens.append(e - s)
            yield pd.DataFrame({id_col: ids, "chunk_digest": digs, "chunk_len": lens})

    return df.select(id_col, text_col).mapInPandas(_run, schema)


def duplicate_span_runs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    hash_family: str = "md5_60",
) -> DataFrame:
    """Maximal cross-document duplicate token spans (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): every maximal run of token positions covered by
    a ``k``-gram that also occurs in at least one OTHER document.
    Output: (doc_id, span_start, span_end, span_tokens) with 0-based
    inclusive token positions.

    The paper's suffix-array pass is a single-machine construction; the
    Spark-first shape replaces it with four linear stages:

    1-2. k-gram hash at each position, ROW-LOCALLY: the token array is
       sliced per position with a nested Catalyst ``transform`` — the
       gram text ``array_join(slice(w, i+1, k), ' ')`` equals the
       former LEAD-window ``concat_ws`` gram exactly, but no exchange
       and no per-document sort happen before the hashes exist (r12,
       guide §2.4; the explode+LEAD-window form shuffled every token
       row to build them);
    3. corpus gram frequency: groupBy(gram hash) → count(DISTINCT doc)
       — a digest-only shuffle with map-side partial aggregation, then
       a semi join back on the hash (never the text);
    4. per-document island merge: positions whose covering intervals
       [pos, pos+k-1] overlap OR touch collapse into maximal spans via
       the classic cummax/new-island/cumsum window chain (hit rows
       only, not the corpus).

    No stage is quadratic: pair explosion cannot happen because stage 3
    joins positions to a DISTINCT gram-hash set (left-semi), not
    gram-to-gram.  ``md5_60`` keeps every intermediate replayable on a
    SQL oracle; production corpora swap in xxhash64 unchanged."""
    from pyspark.sql.window import Window

    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    # Token array in its own Project (r12, guide §1.2.2): inlined, the
    # split() expression is substituted into every slice() call of the
    # generator lambda — one re-split per position = O(len²) per doc.
    toks = df.select(
        F.col(id_col).alias("sid"), F.split(F.col(text_col), " ").alias("w")
    )
    # guard: documents shorter than k tokens have NO grams — an
    # unguarded sequence(0, size-k) would count DOWN for them
    gh_arr = F.when(
        F.size("w") >= k,
        F.transform(
            F.sequence(F.lit(0), F.size("w") - k),
            lambda i: _hash60(
                F.array_join(F.slice("w", i + 1, k), " "), hash_family
            ),
        ),
    )
    # two consumers (corpus frequency + position hits): eagerly
    # localCheckpoint so the tokenize+hash pipeline — the heavy linear
    # stage — runs ONCE (the semdedup.py:156 idiom; persist() on a
    # real cluster)
    hashed = toks.select(
        "sid", F.posexplode(gh_arr).alias("pos", "gh")
    ).localCheckpoint(eager=True)
    dup_grams = (
        hashed.groupBy("gh")
        .agg(F.count_distinct("sid").alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("gh")
    )
    hits = hashed.join(dup_grams, "gh", "left_semi")
    wdoc = Window.partitionBy("sid").orderBy("pos")
    prev_end = F.max(F.col("pos") + F.lit(k - 1)).over(
        wdoc.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = hits.select(
        "sid",
        "pos",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1)
        .otherwise(0)
        .alias("new_island"),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            wdoc.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        islands.groupBy("sid", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        )
        .select(
            F.col("sid").alias(id_col),
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("span_tokens"),
        )
    )


def strip_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    hash_family: str = "md5_60",
) -> DataFrame:
    """The actionable output of :func:`duplicate_span_runs`: each
    document with its duplicated spans REMOVED (Lee et al. 2022 §4 —
    the corpus actually trained on).  Output: (doc_id, clean_text,
    n_tokens_removed, n_tokens_kept).

    Same four linear stages as the span detector up to the hit
    positions; then covered positions = hit ∪ [pos, pos+k-1] (one
    bounded explode), kept tokens = anti-join on position, and the
    cleaned text is rebuilt with an order-preserving aggregate
    (array_sort over (pos, token) structs — deterministic, no window).
    Documents with nothing removed pass through unchanged, so the
    operator is a corpus map, not a filter.

    r12 (guide §2.4): the checkpointed reusable form is the TOKEN
    ARRAY per document (narrower than the exploded frame), and both
    consumers derive from it row-locally — gram hashes by array slice
    (identical text to the former LEAD-window concat, without the
    corpus-wide window exchange + sort) and token rows by posexplode."""
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    arr = df.select(
        F.col(id_col).alias("sid"), F.split(F.col(text_col), " ").alias("w")
    ).localCheckpoint(eager=True)  # two consumers: token rows + gram hashes
    toks = arr.select("sid", F.posexplode("w").alias("pos", "token"))
    gh_arr = F.when(
        F.size("w") >= k,
        F.transform(
            F.sequence(F.lit(0), F.size("w") - k),
            lambda i: _hash60(
                F.array_join(F.slice("w", i + 1, k), " "), hash_family
            ),
        ),
    )
    hashed = arr.select("sid", F.posexplode(gh_arr).alias("pos", "gh"))
    dup_grams = (
        hashed.groupBy("gh")
        .agg(F.count_distinct("sid").alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("gh")
    )
    hits = hashed.join(dup_grams, "gh", "left_semi")
    covered = hits.select(
        "sid", F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))).alias("pos")
    ).distinct()
    kept = toks.join(covered, ["sid", "pos"], "left_anti")
    n_cov = covered.groupBy("sid").agg(F.count(F.lit(1)).alias("n_tokens_removed"))
    rebuilt = kept.groupBy("sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda s: s.token,
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_tokens_kept"),
    )
    # full outer over kept/covered: a doc may be fully removed (no kept
    # rows) or fully clean (no covered rows)
    all_docs = toks.select("sid").distinct()
    return (
        all_docs.join(rebuilt, "sid", "left")
        .join(n_cov, "sid", "left")
        .select(
            F.col("sid").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_tokens_removed", F.lit(0)).cast("long").alias("n_tokens_removed"),
            F.coalesce("n_tokens_kept", F.lit(0)).cast("long").alias("n_tokens_kept"),
        )
    )
