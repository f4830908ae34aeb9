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


# ------------------------------------------------- real format decode
#
# BMP and RIFF/WAV are fully public, library-free formats: a correct
# decoder is ~30 lines of header parsing + numpy. The payloads below
# are REAL files (any image/audio tool opens them), synthesized
# deterministically from doc_id, and the decoders genuinely parse
# them — magic bytes, header fields, row padding, chunk walking —
# rather than trusting the synthesis. The oracle recomputes the
# expected features from the synthesis CLOSED FORM, so a decode bug
# (wrong offset, padding, stride, sample width) breaks the hash match.

BMP_W, BMP_H = 10, 8  # 30-byte rows force 2 bytes of row padding


def synth_bmp(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload) — a real 24-bit bottom-up BMP per doc.

    Pixel (x, y): B = doc_id%50 + y, G = doc_id%100 + x,
    R = doc_id%200 + x + y (all < 256 by construction — no mod
    wraparound, so channel means have exact closed forms)."""
    import struct

    import numpy as np

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        row_stride = (BMP_W * 3 + 3) // 4 * 4
        img_size = row_stride * BMP_H
        for pdf in batches:
            rows = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                px = np.zeros((BMP_H, row_stride), dtype=np.uint8)
                for y in range(BMP_H):
                    for x in range(BMP_W):
                        px[y, 3 * x] = d % 50 + y
                        px[y, 3 * x + 1] = d % 100 + x
                        px[y, 3 * x + 2] = d % 200 + x + y
                header = struct.pack(
                    "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
                ) + struct.pack(
                    "<IiiHHIIiiII", 40, BMP_W, BMP_H, 1, 24, 0, img_size, 2835, 2835, 0, 0
                )
                # bottom-up row order, as the spec requires
                rows.append((d, header + px[::-1].tobytes()))
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    return docs.select(id_col).mapInPandas(_make, schema)


BMP_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def decode_bmp_features(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL BMP decode over mapInPandas: validates the BM magic, reads
    the pixel-array offset / dimensions / bpp from the headers, honors
    the 4-byte row stride and bottom-up order, and averages each
    channel over the true pixels (padding excluded)."""
    import struct

    import numpy as np

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                magic, _, _, _, off = struct.unpack_from("<2sIHHI", b, 0)
                if magic != b"BM":
                    raise ValueError("not a BMP payload")
                _, w, h, _, bpp = struct.unpack_from("<IiiHH", b, 14)
                if bpp != 24:
                    raise ValueError(f"unsupported bpp {bpp}")
                stride = (w * 3 + 3) // 4 * 4
                arr = np.frombuffer(b, np.uint8, count=stride * abs(h), offset=off)
                px = arr.reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
                if h > 0:  # bottom-up
                    px = px[::-1]
                means = px.astype(np.float64).mean(axis=(0, 1))
                out.append(
                    (int(doc_id), int(w), int(abs(h)),
                     float(means[2]), float(means[1]), float(means[0]))
                )
            yield pd.DataFrame(
                out, columns=[id_col, "width", "height", "mean_r", "mean_g", "mean_b"]
            )

    return media.mapInPandas(_decode, BMP_FEATURES_SCHEMA)


WAV_RATE = 8000


def synth_wav(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload) — a real RIFF/WAVE file per doc: PCM s16le
    mono @8kHz, a square wave of amplitude 1000 + doc_id%1000 over
    64 + doc_id%64 samples (RMS = amplitude exactly; n−1 sign flips)."""
    import struct

    import numpy as np

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                n = 64 + d % 64
                amp = 1000 + d % 1000
                samples = np.full(n, amp, dtype=np.int16)
                samples[1::2] *= -1
                data = samples.tobytes()
                fmt = struct.pack("<HHIIHH", 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16)
                payload = (
                    struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
                    + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
                    + struct.pack("<4sI", b"data", len(data)) + data
                )
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    return docs.select(id_col).mapInPandas(_make, schema)


WAV_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def decode_wav_features(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL RIFF/WAVE decode over mapInPandas: validates RIFF/WAVE
    magic, WALKS the chunk list (no fixed offsets — a real reader must
    tolerate extra chunks), reads rate/width/channels from fmt, and
    computes RMS + zero-crossing count over the PCM samples."""
    import struct

    import numpy as np

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                riff, _, wave = struct.unpack_from("<4sI4s", b, 0)
                if riff != b"RIFF" or wave != b"WAVE":
                    raise ValueError("not a RIFF/WAVE payload")
                pos, rate, bits, data = 12, None, None, None
                while pos + 8 <= len(b):
                    cid, size = struct.unpack_from("<4sI", b, pos)
                    body = b[pos + 8 : pos + 8 + size]
                    if cid == b"fmt ":
                        _, _, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
                    elif cid == b"data":
                        data = body
                    pos += 8 + size + (size & 1)  # chunks are word-aligned
                if rate is None or data is None or bits != 16:
                    raise ValueError("missing fmt/data chunk or unsupported width")
                s = np.frombuffer(data, dtype="<i2").astype(np.float64)
                n = s.size
                rms = float(np.sqrt(np.mean(s * s))) if n else 0.0
                zc = int(np.sum(np.signbit(s[:-1]) != np.signbit(s[1:]))) if n > 1 else 0
                out.append((int(doc_id), int(rate), n, rms, zc))
            yield pd.DataFrame(
                out,
                columns=[id_col, "sample_rate", "n_samples", "rms", "zero_crossings"],
            )

    return media.mapInPandas(_decode, WAV_FEATURES_SCHEMA)


# ------------------------------------------------------------------ PNG

PNG_W, PNG_H = 10, 8  # same closed-form pixel pattern as the BMP pair


def synth_png(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload) — a REAL PNG per doc: 8-bit truecolor RGB
    (color type 2), zlib-compressed IDAT with per-row filter byte 0,
    CRC-correct chunks.  Unlike the uncompressed BMP, this round-trip
    exercises a COMPRESSED container: the byte stream is opaque until
    inflate.  Pixel (x, y): R = doc_id%200 + x + y, G = doc_id%100 + x,
    B = doc_id%50 + y (all < 256 — the identical closed-form channel
    means as synth_bmp)."""
    import struct
    import zlib

    def _chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                raw = bytearray()
                for y in range(PNG_H):
                    raw.append(0)  # filter type None for this scanline
                    for x in range(PNG_W):
                        raw += bytes(
                            (d % 200 + x + y, d % 100 + x, d % 50 + y)
                        )
                ihdr = struct.pack(">IIBBBBB", PNG_W, PNG_H, 8, 2, 0, 0, 0)
                payload = (
                    b"\x89PNG\r\n\x1a\n"
                    + _chunk(b"IHDR", ihdr)
                    + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
                    + _chunk(b"IEND", b"")
                )
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    return docs.select(id_col).mapInPandas(_make, schema)


def decode_png_features(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL PNG decode over mapInPandas, no imaging libraries: verify
    the 8-byte signature, walk the chunk stream CHECKING EVERY CRC32,
    read dimensions/bit-depth/color-type from IHDR (8-bit truecolor
    only), concatenate IDATs, zlib-inflate, strip the per-scanline
    filter byte (type 0 only), and average each RGB channel — a
    corrupted byte anywhere fails loudly at the CRC, exactly like a
    real reader."""
    import struct
    import zlib

    import numpy as np

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                if b[:8] != b"\x89PNG\r\n\x1a\n":
                    raise ValueError("not a PNG payload")
                pos, w = 8, None
                idat = bytearray()
                while pos < len(b):
                    (size,) = struct.unpack_from(">I", b, pos)
                    tag = b[pos + 4 : pos + 8]
                    body = b[pos + 8 : pos + 8 + size]
                    (crc,) = struct.unpack_from(">I", b, pos + 8 + size)
                    if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
                        raise ValueError(f"CRC mismatch in {tag!r} chunk")
                    if tag == b"IHDR":
                        w, h, depth, ctype, _, _, _ = struct.unpack(">IIBBBBB", body)
                        if depth != 8 or ctype != 2:
                            raise ValueError("only 8-bit truecolor supported")
                    elif tag == b"IDAT":
                        idat += body
                    elif tag == b"IEND":
                        break
                    pos += 12 + size
                if w is None:
                    raise ValueError("missing IHDR")
                raw = zlib.decompress(bytes(idat))
                stride = 1 + w * 3
                px = np.frombuffer(raw, np.uint8).reshape(h, stride)
                if (px[:, 0] != 0).any():
                    raise ValueError("unsupported scanline filter")
                rgb = px[:, 1:].reshape(h, w, 3).astype(np.float64)
                means = rgb.mean(axis=(0, 1))
                out.append(
                    (int(doc_id), int(w), int(h),
                     float(means[0]), float(means[1]), float(means[2]))
                )
            yield pd.DataFrame(
                out, columns=[id_col, "width", "height", "mean_r", "mean_g", "mean_b"]
            )

    return media.mapInPandas(_decode, BMP_FEATURES_SCHEMA)
