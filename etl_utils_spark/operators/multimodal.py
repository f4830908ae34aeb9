"""Multimodal column plumbing (north star): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by
Arrow-batched pandas functions over ``mapInPandas``.

The image/audio decode libraries are NOT present in this container, so
the decode step is STUBBED two ways (clearly marked):
- ``decode_media_real`` raises NotImplementedError unless Pillow is
  importable — the hook where a real deployment plugs in decoding;
- ``_fake_decode_features`` computes deterministic byte-level features
  (length, mean, min/max, head checksum) standing in for pixel stats.

Everything AROUND the stub is real and tested: the binary+metadata
schema, the mapInPandas batch contract (iterator of pandas DataFrames,
Arrow transfer), partition-preserving execution, and the output schema.
At 100 TB this shape is the right one: decode runs data-local in
executor Python workers on Arrow batches; no driver involvement, no
shuffle (narrow transformation).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real decoder gate — absent in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_min", T.IntegerType()),
        T.StructField("byte_max", T.IntegerType()),
        T.StructField("head_crc", T.LongType()),
    ]
)


def attach_fake_payload(docs: DataFrame) -> DataFrame:
    """Give the documents table a multimodal shape: the text bytes act
    as an opaque media payload plus typed metadata (deterministic
    pseudo-dimensions derived from content length)."""
    n = F.col("n_chars")
    meta = F.struct(
        F.lit("image/fake").alias("kind"),
        (n % 640 + 32).cast("int").alias("width"),
        (n % 480 + 32).cast("int").alias("height"),
        F.lit(0.0).alias("fps"),
        F.lit(0.0).alias("duration_s"),
    )
    return docs.select(
        "doc_id", F.encode("text", "utf-8").alias("payload"), meta.alias("media_meta")
    )


def decode_media_real(payload: bytes):  # pragma: no cover - env-gated
    """REAL decode hook — NotImplemented in this container (no Pillow);
    a deployment with imaging libs installed implements this."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "real image decode requires Pillow, which is not installed in "
            "this environment; use the deterministic fake-feature path"
        )
    raise NotImplementedError("real decode intentionally not wired in this build")


def extract_features(media: DataFrame) -> DataFrame:
    """Byte-level feature extraction over mapInPandas (Arrow batches).

    The pandas function is the exact signature a real decoder would
    use — swap ``_fake_decode_features`` for a Pillow/ffmpeg call and
    nothing else changes."""

    def _fake_decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(payload, dtype=np.uint8)
                head = a[:16]
                feats.append(
                    (
                        int(doc_id),
                        int(a.size),
                        float(a.mean()) if a.size else 0.0,
                        int(a.min()) if a.size else 0,
                        int(a.max()) if a.size else 0,
                        int(head.astype("int64").sum()),
                    )
                )
            yield pd.DataFrame(
                feats, columns=["doc_id", "n_bytes", "byte_mean", "byte_min", "byte_max", "head_crc"]
            )

    return media.select("doc_id", "payload").mapInPandas(_fake_decode_features, FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio-shaped sibling of extract_features: interpret the payload
    as int8 PCM samples and compute RMS + zero-crossing count — the
    deterministic stand-in for a librosa/ffmpeg decode (same
    mapInPandas contract, swap the body on a deployment with audio
    libs)."""

    def _fake_audio(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(payload, dtype=np.int8).astype(np.float64)
                n = a.size
                rms = float(np.sqrt(np.mean(a * a))) if n else 0.0
                zc = int(np.sum(np.signbit(a[:-1]) != np.signbit(a[1:]))) if n > 1 else 0
                rows.append((int(doc_id), n, rms, zc))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "rms", "zero_crossings"]
            )

    return media.select("doc_id", "payload").mapInPandas(_fake_audio, AUDIO_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame-sampling PLAN: which frame indices to decode, from
    metadata only (no payload access — pure Catalyst arithmetic). The
    decode of chosen frames would go through the mapInPandas hook."""
    total = (F.col("media_meta.fps") * F.col("media_meta.duration_s")).cast("long")
    total = F.greatest(total, F.lit(1))
    idx = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda k: (k * total / n_frames).cast("long"),
    )
    return media.select(
        "doc_id",
        F.col("media_meta.kind").alias("kind"),
        F.explode(F.array_distinct(idx)).alias("frame_index"),
    )
