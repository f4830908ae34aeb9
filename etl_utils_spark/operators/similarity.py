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

import numpy as np
import pandas as pd
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


def plane_coefficients(n_planes: int, dim: int, seed: str = "lsh") -> list[list[float]]:
    """Deterministic pseudo-random hyperplane coefficients (±0.5..±3.5),
    computed ONCE driver-side from md5(seed:plane:dim-index) — no RNG
    state, identical on every run, engine, and cluster size."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:8], 16) % 8) - 3.5
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def hyperplane_bucket(
    vec_col: Column, n_planes: int = 8, seed: str = "lsh", dim: int = 64
) -> Column:
    """Random-hyperplane LSH bucket id (0..2^n_planes-1) for a vector.

    The (n_planes × dim) coefficient matrix is precomputed driver-side
    (plane_coefficients) and embedded as literal arrays, so the per-row
    work is n_planes fused multiply-adds inside whole-stage codegen —
    no per-(row × plane × dim) hashing (the r1 bottleneck: 4.4s/500
    vectors; this form is ~constant-cost per row at any corpus size).
    For transformer-scale dims (768+), swap the literal arrays for a
    broadcast numpy matrix in a pandas_udf matmul — same contract."""
    coeffs = plane_coefficients(n_planes, dim, seed)

    def plane_sign(p: int) -> Column:
        plane = F.array(*[F.lit(c) for c in coeffs[p]])
        prods = F.zip_with(vec_col, plane, lambda x, y: F.coalesce(x * y, F.lit(0.0)))
        return F.aggregate(prods, F.lit(0.0), lambda a, v: a + v)

    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        bucket = bucket + F.when(plane_sign(p) > 0, F.lit(1 << p).cast("long")).otherwise(0)
    return bucket


def hyperplane_buckets(
    vec_col: Column,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: str = "lsh",
    dim: int = 64,
) -> Column:
    """Array of ``n_tables`` independent LSH bucket ids for a vector —
    the multi-table form: a true neighbor is a candidate if it shares
    ANY table's bucket, recall = 1-(1-p^b)^L instead of the single-table
    p^b (p = per-plane agreement prob).

    Implemented as ONE Arrow-batched pandas_udf doing a numpy matmul
    against the precomputed (L·b × dim) plane matrix — (batch × dim) @
    (dim × L·b) then sign-bit packing.  The expression-tree form
    (n_tables × hyperplane_bucket literals) plans in O(L·b·dim)
    Catalyst nodes and its optimization time dominated execution
    (~4.5s flat at any corpus size in r1 profiling); the matmul plans
    in O(1) and executes vectorized."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    M = np.array(
        [
            row
            for t in range(n_tables)
            for row in plane_coefficients(n_planes, dim, seed=f"{seed}:{t}")
        ]
    )  # (L*b, dim)
    weights = (1 << np.arange(n_planes)).astype(np.int64)  # pack b sign bits

    @pandas_udf(ArrayType(LongType()))
    def _buckets(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        X = np.vstack(v.to_numpy())  # (n, dim)
        S = (X @ M.T) > 0  # (n, L*b) sign bits
        B = S.reshape(len(v), n_tables, n_planes).astype(np.int64) @ weights  # (n, L)
        return pd.Series(list(B))

    return _buckets(vec_col)


def _normalize_rows_np(X: "np.ndarray") -> "np.ndarray":
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return X / norms


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_limit: int = 100_000,
) -> "np.ndarray":
    """Deterministic spherical-k-means coarse quantizer.

    Init: the ``n_cells`` corpus vectors with the smallest
    md5(vec_id) — a seedless, order-independent pseudo-random pick
    (identical on every run and cluster size).  Then ``iters`` Lloyd
    rounds over a bounded sample: assignment is a numpy matmul on the
    driver (the sample is capped; centroids are k×dim — model-scale,
    not data-scale).  At 100 TB the same training runs on a sample,
    which is exactly how production IVF indexes are built."""
    rows = (
        corpus.select(F.col(id_col).alias("i"), dvec(vec_col).alias("v"))
        .withColumn("pick", F.md5(F.col("i").cast("string")))
        .orderBy("pick")
        .limit(sample_limit)
        .collect()
    )
    X = _normalize_rows_np(np.array([r.v for r in rows]))
    C = X[:n_cells].copy()  # md5-ordered → deterministic pseudo-random init
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize_rows_np(C)
    return C


def ivf_cell_udf(centroids: "np.ndarray", n_probe: int = 1):
    """pandas_udf mapping a vector column to its ``n_probe`` nearest
    centroid ids (normalized dot = cosine) — one Arrow-batched matmul,
    same execution shape as hyperplane_buckets."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    C = centroids

    @pandas_udf(ArrayType(IntegerType()))
    def _cells(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        X = _normalize_rows_np(np.vstack(v.to_numpy()))
        sims = X @ C.T  # (n, k)
        top = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(top))

    return _cells


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: corpus
    vectors live in their single nearest-centroid cell; each query
    probes its ``n_probe`` nearest cells and scores exactly within
    them.

    Scale shape: the corpus is partitioned by cell (NO replication,
    unlike multi-table LSH), the centroid table is model-scale and
    rides inside the UDF closure, and a query touches n_probe/n_cells
    of the data.  Recall is tuned by n_probe; gate_ivf_recall_floor
    pins it.

    ``broadcast_queries`` encodes the probe-workload assumption: the
    query side must fit in one executor's memory (roughly ≤ a few
    hundred MB of vectors — Spark hard-caps broadcasts at 8 GB).
    Corpus-vs-corpus self-joins must pass False, which degrades to a
    shuffle join co-partitioned on the cell id — same result, no
    driver-side collect of the big side."""
    C = train_ivf_centroids(corpus, n_cells=n_cells, id_col=id_col, vec_col=vec_col)
    corpus_cell = ivf_cell_udf(C, n_probe=1)
    query_cells = ivf_cell_udf(C, n_probe=n_probe)

    c = corpus.select(F.col(id_col).alias("neighbor_id"), dvec(vec_col).alias("cv"))
    c = c.withColumn("cell", F.element_at(corpus_cell(F.col("cv")), 1)).repartition(
        "cell"
    )
    q = queries.select(F.col(id_col).alias("query_id"), dvec(vec_col).alias("qv"))
    q = q.select(
        "query_id", "qv", F.explode(query_cells(F.col("qv"))).alias("cell")
    )
    qside = F.broadcast(q) if broadcast_queries else q.repartition("cell")
    scored = (
        qside.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos_sim"))
    )
    return _topk_per_query(scored, k)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 16,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: probe the query's bucket in each of
    ``n_tables`` hash tables, union the candidates, score exactly.

    Scale shape: the corpus is exploded ×L into (table, bucket) cells
    and partitioned by them — the classic multi-table LSH storage
    tradeoff (L× replication buys 1-(1-p^b)^L recall); each query
    probes L cells and scores only candidates, never the corpus.
    Candidates are deduped BEFORE the exact cosine so each pair is
    scored once regardless of how many tables it collides in.

    ``broadcast_queries``: same bound as cosine_topk_ivf — the probe
    side must be executor-memory-sized; pass False for a big query
    side to co-partition both sides on (table_id, bucket) instead."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), dvec(vec_col).alias("cv"))
    c = c.select(
        "neighbor_id",
        "cv",
        F.posexplode(hyperplane_buckets(F.col("cv"), n_planes, n_tables)).alias(
            "table_id", "bucket"
        ),
    ).repartition("table_id", "bucket")
    q = queries.select(F.col(id_col).alias("query_id"), dvec(vec_col).alias("qv"))
    q = q.select(
        "query_id",
        "qv",
        F.posexplode(hyperplane_buckets(F.col("qv"), n_planes, n_tables)).alias(
            "table_id", "bucket"
        ),
    )
    qside = F.broadcast(q) if broadcast_queries else q.repartition("table_id", "bucket")
    scored = (
        qside.join(c, ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos_sim"))
    )
    return _topk_per_query(scored, k)


# --------------------------------------------------- product quantization

def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
    sample_limit: int = 100_000,
) -> "np.ndarray":
    """Deterministic product-quantization codebooks (Jégou et al.,
    IEEE TPAMI 2011 — public algorithm): the D-dim space splits into
    ``m`` subspaces of D/m dims, each with its own ``k``-centroid
    L2 codebook. Returns shape (m, k, D/m).

    Same determinism recipe as the IVF quantizer: md5-ordered bounded
    sample, first-k init, fixed Lloyd rounds, all driver-side on
    model-scale data. Vectors are L2-normalized first so PQ's L2
    geometry ranks like cosine."""
    rows = (
        corpus.select(F.col(id_col).alias("i"), dvec(vec_col).alias("v"))
        .withColumn("pick", F.md5(F.col("i").cast("string")))
        .orderBy("pick")
        .limit(sample_limit)
        .collect()
    )
    X = _normalize_rows_np(np.array([r.v for r in rows]))
    d = X.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    # a codebook can't have more centroids than training vectors —
    # clamp (tiny corpora) instead of a numpy broadcast error
    k = min(k, X.shape[0])
    sub = d // m
    books = np.zeros((m, k, sub))
    for j in range(m):
        S = X[:, j * sub : (j + 1) * sub]
        C = S[:k].copy()
        # r12 (guide §1.2 per-task work): the ||s−c||² matrix comes
        # from the BLAS expansion ||s||²+||c||²−2s·c instead of
        # materializing the (n, k, sub) difference tensor — ~4× faster
        # on the driver.  Verified to yield bit-identical codebooks
        # (argmin assignments unchanged) on all three fixture SFs.
        s2 = (S * S).sum(axis=1)[:, None]
        for _ in range(iters):
            d2 = s2 + (C * C).sum(axis=1)[None, :] - 2.0 * (S @ C.T)
            assign = d2.argmin(axis=1)
            for c in range(k):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[j] = C
    return books


def pq_encode(
    df: DataFrame,
    codebooks: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — each vector compressed to m codebook
    indices (argmin L2 per subspace, ties to the lowest index via
    argmin's first-match). m×log2(k) bits per vector instead of D
    floats — the memory trade that lets an ANN index hold 100 TB of
    vectors in RAM. Arrow-batched numpy; codebooks ride the closure
    (model-scale)."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    B = codebooks
    m, k, sub = B.shape

    @pandas_udf(ArrayType(IntegerType()))
    def _codes(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        X = _normalize_rows_np(np.vstack(v.to_numpy()))
        out = np.zeros((X.shape[0], m), dtype=np.int32)
        for j in range(m):
            S = X[:, j * sub : (j + 1) * sub]
            # same BLAS expansion as train_pq_codebooks (r12) —
            # verified code-identical on all three fixture SFs
            d2 = (
                (S * S).sum(axis=1)[:, None]
                + (B[j] * B[j]).sum(axis=1)[None, :]
                - 2.0 * (S @ B[j].T)
            )
            out[:, j] = d2.argmin(axis=1)
        return pd.Series(list(out))

    return df.select(
        F.col(id_col), _codes(dvec(vec_col)).alias("codes")
    )


def pq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 50,
    m: int = 8,
    n_centroids: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via PQ asymmetric-distance SHORTLIST + exact
    re-rank — the production IVF-PQ refine pattern.

    Stage 1 (compressed scan): the corpus is scanned as CODES ONLY
    (m small ints/vector, ~m·log2(k) bits instead of D floats — the
    memory trade that fits 100 TB of vectors in RAM); each query
    precomputes m×k subspace distance tables driver-side (model-scale,
    rides the closure) and a vector's approx distance is m table
    lookups. Each Arrow batch pre-truncates to its own top-``shortlist``
    per query (argpartition), so the shuffle carries n_q×shortlist rows
    per batch, never the scored cross product.

    Stage 2 (refine): the global shortlist joins back to the full
    float vectors and is scored with EXACT cosine — emitted scores are
    exact (same schema/semantics as every other top-k here), and the
    only approximation left is shortlist recall, which
    gate_pq_recall_floor pins (raw ADC top-k recall is ~0.5 on this
    corpus; shortlist-50 + exact re-rank measures ≥0.9)."""
    from pyspark.sql import types as T

    B = train_pq_codebooks(
        corpus, m=m, k=n_centroids, iters=5, id_col=id_col, vec_col=vec_col
    )
    codes = pq_encode(corpus, B, id_col=id_col, vec_col=vec_col).withColumnRenamed(
        id_col, "neighbor_id"
    )

    q_rows = queries.select(F.col(id_col).alias("qid"), dvec(vec_col).alias("v")).collect()
    Q = _normalize_rows_np(np.array([r.v for r in q_rows]))
    qids = np.array([r.qid for r in q_rows])
    sub = B.shape[2]
    # tables[q][j][c] = ||Q_q[subspace j] - B[j][c]||² (n_q, m, k)
    tables = np.stack(
        [
            ((Q[:, j * sub : (j + 1) * sub][:, None, :] - B[j][None, :, :]) ** 2).sum(
                axis=2
            )
            for j in range(B.shape[0])
        ],
        axis=1,
    )

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("dist_q", T.LongType()),
        ]
    )

    def _scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.vstack(pdf["codes"].to_numpy())  # (n, m)
            d = np.zeros((len(qids), C.shape[0]))
            for j in range(tables.shape[1]):
                d += tables[:, j, :][:, C[:, j]]
            # quantize ONCE here (half-up at 1e-9, nonnegative dists)
            # and sort on the integer everywhere: mixing np.round
            # (half-even) with Spark F.round (HALF_UP) made batch and
            # global orders disagree on ties — layout-dependent cuts
            dq_all = np.floor(d * 1e9 + 0.5).astype(np.int64)
            nid = pdf["neighbor_id"].to_numpy()
            out_q, out_n, out_d = [], [], []
            for qi in range(len(qids)):
                # self-match removed BEFORE truncation (it must not
                # consume a shortlist slot); the batch-local cut uses
                # the SAME (dist_q, id) integer order as the global
                # window: the global top-`shortlist` under a total
                # order is always within the union of batch
                # top-`shortlist`s, so the final shortlist is identical
                # under any partition layout.
                mask = nid != qids[qi]
                bn, bdq = nid[mask], dq_all[qi][mask]
                take = min(shortlist, bn.size)
                if not take:
                    continue
                order = np.lexsort((bn, bdq))[:take]
                out_q.append(np.full(take, qids[qi]))
                out_n.append(bn[order])
                out_d.append(bdq[order])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "dist_q": np.concatenate(out_d),
                }
            )

    w_sl = Window.partitionBy("query_id").orderBy(
        F.asc("dist_q"), F.asc("neighbor_id")
    )
    short = (
        codes.mapInPandas(_scan, schema)
        .withColumn("_r", F.row_number().over(w_sl))
        .filter(F.col("_r") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), dvec(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), dvec(vec_col).alias("qv"))
    scored = (
        short.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos_sim"))
    )
    return _topk_per_query(scored, k)
