"""Registered queries for the UDF surface (C7) and multimodal
plumbing — oracle-checked where the arithmetic is engine-stable,
rows-only where the computation is Python-side by design."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.operators import multimodal, udfs
from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "udf_embedding_norm",
    oracle="""
        SELECT vec_id,
               ROUND(sqrt(list_aggregate(
                   list_transform(embedding::DOUBLE[], x -> x * x), 'sum')), 6)
                   AS l2_norm
        FROM embeddings
    """,
)
def udf_embedding_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7a: Arrow-vectorized scalar pandas UDF computing L2 norms —
    hash-checked against DuckDB's sequential list reduction (round-6
    absorbs numpy pairwise-summation vs sequential-sum ulps)."""
    return udfs.embedding_norms(_t(spark, sf_dir, "embeddings"))


@query(
    "udf_grouped_mean_value",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
                   / (CAST(count(*) AS DOUBLE) * 100.0) AS mean_value
        FROM events
        GROUP BY event_type
    """,
)
def udf_grouped_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7b: grouped-aggregate pandas UDF (mean per event_type) — the
    kernel sums exact integer cents and divides once, so the hash
    match against the SQL oracle is bit-exact (operators/udfs.py
    mean_value)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        udfs.mean_value("value").alias("mean_value")
    )


@query(
    "udf_grouped_zscore",
    oracle="""
        WITH b AS (
            SELECT event_id, event_type, value,
                   CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cv
            FROM events
        ),
        m AS (
            SELECT event_type, count(*) AS n,
                   SUM(cv) AS s, SUM(cv * cv) AS sxx
            FROM b GROUP BY event_type
        )
        SELECT b.event_id, b.event_type, b.value,
               CASE WHEN m.n * m.sxx - m.s * m.s > 0
                    THEN CAST(m.n * b.cv - m.s AS DOUBLE)
                         / sqrt(CAST(m.n * m.sxx - m.s * m.s AS DOUBLE))
                    ELSE 0.0 END AS zscore
        FROM b JOIN m USING (event_type)
    """,
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7c: applyInPandas grouped-map — per-event-type population
    z-scores.  The kernel (operators/udfs.py zscore_per_group) builds
    exact integer cent moments and evaluates the same IEEE expression
    the oracle does, so the hash match is bit-exact and UNROUNDED —
    np.mean/np.std pairwise summation vs SQL accumulation differ at
    the ulp level, which a ROUND cannot reliably absorb (the r5
    rolling-corr red class)."""
    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return udfs.zscore_per_group(e, "event_type", "value")


@query("multimodal_image_features", oracle=None)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: binary payload + metadata → mapInPandas feature
    extraction (deterministic byte-level fake decode; real decode is
    env-gated — operators/multimodal.py)."""
    media = multimodal.attach_fake_payload(_t(spark, sf_dir, "documents"))
    return multimodal.extract_features(media)


@query(
    "multimodal_byte_stats",
    oracle="""
        WITH pos AS (
            SELECT doc_id, text,
                   unnest(generate_series(1, length(text))) AS i
            FROM documents
        ),
        chars AS (
            SELECT doc_id, i, ascii(substring(text, i, 1)) AS code FROM pos
        )
        SELECT doc_id,
               count(*)::BIGINT AS n_bytes,
               min(code)::INT   AS byte_min,
               max(code)::INT   AS byte_max,
               SUM(CASE WHEN i <= 16 THEN code ELSE 0 END)::BIGINT AS head_crc
        FROM chars GROUP BY doc_id
    """,
)
def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked slice of the multimodal decode path: the exact
    integer features (byte count / min / max / 16-byte head checksum)
    from the SAME mapInPandas fake-decode as multimodal_image_features,
    recomputed char-by-char in SQL (the fixture text is pure ASCII, so
    utf-8 bytes == ascii codes).  This pins the Arrow batch plumbing
    end-to-end with a value hash, not just a row count; byte_mean stays
    in the rows-only query (float summation-order differs by design)."""
    media = multimodal.attach_fake_payload(_t(spark, sf_dir, "documents"))
    return multimodal.extract_features(media).select(
        "doc_id", "n_bytes", "byte_min", "byte_max", "head_crc"
    )


@query("multimodal_audio_features", oracle=None)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio modality: payload as PCM samples → RMS / zero-crossings
    via mapInPandas (deterministic fake decode; same Arrow-batch
    contract as a real librosa path)."""
    media = multimodal.attach_fake_payload(_t(spark, sf_dir, "documents"))
    return multimodal.extract_audio_features(media)


@query(
    "multimodal_frame_sample",
    oracle="""
        WITH m AS (
            SELECT doc_id, ((n_chars % 640) + 32)::INT AS width FROM documents
        ),
        t AS (
            SELECT doc_id,
                   greatest((24.0 * (width / 8.0))::BIGINT, 1) AS total
            FROM m
        ),
        k AS (SELECT doc_id, total, unnest(generate_series(0, 3)) AS k FROM t)
        SELECT doc_id, 'video/fake' AS kind,
               floor(k * total / 4)::BIGINT AS frame_index
        FROM k
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: metadata-only frame-sampling plan (pure Catalyst
    arithmetic — no payload access), hash-checked by recomputing the
    synthetic metadata and index formula in SQL.  floor() in the
    oracle mirrors Spark's truncating cast-to-long (DuckDB's bare
    double→BIGINT cast rounds; all values here are non-negative so
    floor == truncate)."""
    media = multimodal.attach_fake_payload(_t(spark, sf_dir, "documents"))
    media = media.withColumn(
        "media_meta",
        F.struct(
            F.lit("video/fake").alias("kind"),
            F.col("media_meta.width").alias("width"),
            F.col("media_meta.height").alias("height"),
            F.lit(24.0).alias("fps"),
            (F.col("media_meta.width") / 8.0).alias("duration_s"),
        ),
    )
    return multimodal.frame_sample_plan(media, n_frames=4)


# ONE oracle for BOTH conversion-lag implementations below: the C7c
# cogrouped-map API surface and its scale-safe relational twin must
# hash-match the identical SQL — a two-sided equivalence certificate.
_CONVERSION_LAG_ORACLE = """
        WITH p AS (
            SELECT user_id, ts FROM events WHERE event_type = 'purchase'
        ),
        c AS (
            SELECT user_id, ts FROM events WHERE event_type = 'click'
        ),
        -- Row-preserving as-of (carry the latest click ts forward over
        -- a union, keep only purchase rows): two purchases by one user
        -- at the SAME timestamp stay two rows, unlike a join + GROUP BY
        -- p.user_id, p.ts which would collapse them.  'c' < 'p' sorts
        -- same-instant clicks before purchases, so c.ts <= p.ts ties
        -- count — identical to both Spark implementations.
        lagt AS (
            SELECT user_id, ts, cts FROM (
                SELECT user_id, ts, kind,
                       max(CASE WHEN kind = 'c' THEN ts END) OVER (
                           PARTITION BY user_id ORDER BY ts, kind
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS cts
                FROM (
                    SELECT user_id, ts, 'c' AS kind FROM c
                    UNION ALL
                    SELECT user_id, ts, 'p' AS kind FROM p
                )
            ) WHERE kind = 'p'
        ),
        pu AS (
            SELECT user_id, count(*) AS n_purchases,
                   CASE WHEN COUNT(cts) > 0 THEN
                       CAST(SUM(epoch_us(ts) - epoch_us(cts)) AS DOUBLE)
                       / (COUNT(cts) * 1000000.0)
                   END AS avg_lag_s
            FROM lagt GROUP BY user_id
        ),
        cu AS (SELECT user_id, count(*) AS n_clicks FROM c GROUP BY user_id)
        SELECT coalesce(pu.user_id, cu.user_id) AS user_id,
               coalesce(n_purchases, 0) AS n_purchases,
               coalesce(n_clicks, 0) AS n_clicks,
               avg_lag_s
        FROM pu FULL OUTER JOIN cu ON pu.user_id = cu.user_id
"""


@query("udf_cogrouped_conversion_lag", oracle=_CONVERSION_LAG_ORACLE)
def udf_cogrouped_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 cogrouped-map surface: per-user purchase/click frames arrive
    as an Arrow table pair (operators/udfs.py:cogrouped_conversion_lag,
    applyInArrow — r12: the pandas cogroup serializer's per-key concat
    dominated the query; Arrow tables cross the boundary ~7× faster); the
    vectorized searchsorted computes each purchase's latest preceding
    click lag without materializing the touch×purchase candidate set
    the oracle's join+argmax builds.  One co-shuffle on user_id."""
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    from etl_utils_spark.operators.udfs import cogrouped_conversion_lag

    return cogrouped_conversion_lag(purchases, clicks)


@query(
    "multimodal_decode_bmp",
    oracle="""
        SELECT doc_id,
               10 AS width, 8 AS height,
               CAST(doc_id % 200 + 8.0 AS DOUBLE) AS mean_r,
               CAST(doc_id % 100 + 4.5 AS DOUBLE) AS mean_g,
               CAST(doc_id % 50 + 3.5 AS DOUBLE) AS mean_b
        FROM documents
    """,
)
def multimodal_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, no libraries: a genuine 24-bit BMP per doc
    (synthesized deterministically) is parsed back by a real decoder —
    BM magic, header fields, 4-byte row stride, bottom-up order — and
    per-channel means are hash-checked against the synthesis closed
    form, certifying the encode→decode round-trip end-to-end
    (operators/multimodal.py:synth_bmp/decode_bmp_features). The means
    are exact dyadic rationals, so the double compare is safe."""
    from etl_utils_spark.operators.multimodal import decode_bmp_features, synth_bmp

    docs = _t(spark, sf_dir, "documents")
    return decode_bmp_features(synth_bmp(docs))


@query(
    "multimodal_decode_wav",
    oracle="""
        SELECT doc_id,
               8000 AS sample_rate,
               CAST(64 + doc_id % 64 AS BIGINT) AS n_samples,
               CAST(1000 + doc_id % 1000 AS DOUBLE) AS rms,
               CAST(63 + doc_id % 64 AS BIGINT) AS zero_crossings
        FROM documents
    """,
)
def multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, no libraries: a genuine RIFF/WAVE (PCM s16le
    mono @8kHz square wave) per doc, parsed back by chunk-walking —
    RIFF/WAVE magic, fmt rate/width, data payload — with RMS and
    zero-crossing counts hash-checked against the synthesis closed form
    (square wave of amplitude a: RMS = a exactly — a² is an exact
    double and IEEE sqrt is correctly rounded; n−1 sign flips)
    (operators/multimodal.py:synth_wav/decode_wav_features)."""
    from etl_utils_spark.operators.multimodal import decode_wav_features, synth_wav

    docs = _t(spark, sf_dir, "documents")
    return decode_wav_features(synth_wav(docs))


@query(
    "multimodal_decode_png",
    oracle="""
        SELECT doc_id,
               10 AS width, 8 AS height,
               CAST(doc_id % 200 + 8.0 AS DOUBLE) AS mean_r,
               CAST(doc_id % 100 + 4.5 AS DOUBLE) AS mean_g,
               CAST(doc_id % 50 + 3.5 AS DOUBLE) AS mean_b
        FROM documents
    """,
)
def multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED-image decode, no libraries: a genuine PNG per
    doc (zlib IDAT, CRC-correct chunks) parsed back by a real reader —
    signature, chunk walk with CRC verification, IHDR fields, inflate,
    scanline-filter strip — with per-channel means hash-checked
    against the synthesis closed form.  Complements the uncompressed
    BMP round-trip: here the pixel bytes are opaque until inflate, so
    the hash match certifies the compression layer too
    (operators/multimodal.py:synth_png/decode_png_features).  The
    means are exact dyadic rationals, so the double compare is safe."""
    from etl_utils_spark.operators.multimodal import decode_png_features, synth_png

    docs = _t(spark, sf_dir, "documents")
    return decode_png_features(synth_png(docs))


@query(
    "udf_grouped_arrow_stats",
    oracle="""
        SELECT event_type,
               count(*)::BIGINT AS n,
               CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS sum_cents,
               min(value) AS v_min,
               max(value) AS v_max
        FROM events GROUP BY event_type
    """,
)
def udf_grouped_arrow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fourth Arrow UDF face (C7): grouped-map ``applyInArrow`` —
    the whole group arrives as ONE pyarrow.Table and the kernels run
    in Arrow compute (no pandas materialization, unlike applyInPandas).
    Per event type: count, exact integer cent sum (floor(v·100+0.5) →
    int64 — associative, order-independent, and the SAME IEEE
    expression the oracle computes: Arrow's pc.round is half-to-even
    on the raw binary product while DuckDB's double→DECIMAL cast is
    half-up on the shortest decimal repr, so neither builtin rounding
    can match the other on 3-decimal or dyadic inputs; a shared
    floor(x+0.5) is engine-exact for any input), and min/max (carried
    doubles, no arithmetic) — every output is engine-exact, so the
    Arrow path is hash-certified, not just row-counted."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _stats(table: "pa.Table") -> "pa.Table":
        v = table.column("value")
        cents = pc.cast(pc.floor(pc.add(pc.multiply(v, 100.0), 0.5)), pa.int64())
        return pa.table(
            {
                "event_type": pa.array(
                    [table.column("event_type")[0].as_py()], pa.string()
                ),
                "n": pa.array([table.num_rows], pa.int64()),
                "sum_cents": pa.array([pc.sum(cents).as_py()], pa.int64()),
                "v_min": pa.array([pc.min(v).as_py()], pa.float64()),
                "v_max": pa.array([pc.max(v).as_py()], pa.float64()),
            }
        )

    e = _t(spark, sf_dir, "events").select("event_type", "value")
    return e.groupBy("event_type").applyInArrow(
        _stats,
        schema="event_type string, n long, sum_cents long, v_min double, v_max double",
    )


@query("conversion_lag_relational", oracle=_CONVERSION_LAG_ORACLE)
def conversion_lag_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB plan for the SAME computation as
    udf_cogrouped_conversion_lag (identical oracle — the hash match on
    both queries is a machine-checked equivalence certificate): the
    per-purchase latest-preceding click comes from the union-and-carry
    as-of join (operators/sessionize.py — ONE shuffle on user_id, no
    candidate pairs, no per-key Python round-trips), then two hash
    aggregates and a full outer join.  Where the cogrouped version
    invokes Python once per user, this stays entirely in
    whole-stage-codegen JVM operators — the alternative the cogrouped
    docstring points to, here as a first-class query."""
    from etl_utils_spark.operators.sessionize import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    m = asof_join(purchases, clicks, on="user_id", right_cols=[])
    lag_us = F.unix_micros("ts") - F.unix_micros("right_ts")
    pu = m.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(lag_us).alias("lag_sum_us"),  # nulls (no match) skipped
        F.count("right_ts").alias("n_match"),
    ).select(
        "user_id",
        "n_purchases",
        F.when(
            F.col("n_match") > 0,
            F.col("lag_sum_us").cast("double")
            / (F.col("n_match") * F.lit(1_000_000.0)),
        ).alias("avg_lag_s"),
    )
    cu = clicks.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_clicks"))
    j = pu.join(cu, "user_id", "full_outer")
    return j.select(
        "user_id",
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        "avg_lag_s",
    )
