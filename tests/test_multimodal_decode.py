"""Real BMP/RIFF-WAV decode: the payloads are genuine files and the
decoders genuinely parse them. Beyond the oracle closed-form match
(test_oracle_parity), these tests pin the decoder behaviors a hash
match can't isolate: magic validation, chunk-walking past foreign
chunks, and structural header consistency.
"""

from __future__ import annotations

import struct

import pytest

from etl_utils_spark.operators.multimodal import (
    BMP_H,
    BMP_W,
    decode_bmp_features,
    decode_wav_features,
    synth_bmp,
    synth_wav,
)
from etl_utils_spark.sources.tables import load_table


def _payloads(spark, sf_dir, synth, n=3):
    docs = load_table(spark, sf_dir, "documents").limit(n)
    return {r.doc_id: bytes(r.payload) for r in synth(docs).collect()}


def test_bmp_payloads_are_structurally_valid_files(spark, sf_dir):
    for _, b in _payloads(spark, sf_dir, synth_bmp).items():
        magic, file_size, _, _, off = struct.unpack_from("<2sIHHI", b, 0)
        assert magic == b"BM"
        assert file_size == len(b)  # declared size matches actual
        hdr_size, w, h, planes, bpp = struct.unpack_from("<IiiHH", b, 14)
        assert (hdr_size, w, h, planes, bpp) == (40, BMP_W, BMP_H, 1, 24)
        stride = (w * 3 + 3) // 4 * 4
        assert len(b) == off + stride * h  # padded rows fully present


def test_wav_payloads_are_structurally_valid_files(spark, sf_dir):
    import numpy as np

    for doc_id, b in _payloads(spark, sf_dir, synth_wav).items():
        riff, riff_size, wave = struct.unpack_from("<4sI4s", b, 0)
        assert (riff, wave) == (b"RIFF", b"WAVE")
        assert riff_size == len(b) - 8
        # the data chunk's PCM tail must be the exact expected square
        # wave: amplitude 1000 + id%1000, alternating sign, n samples
        n = 64 + doc_id % 64
        amp = 1000 + doc_id % 1000
        expected = np.full(n, amp, dtype=np.int16)
        expected[1::2] *= -1
        assert b[-2 * n :] == expected.tobytes()


def test_bmp_decoder_rejects_corrupt_magic(spark, sf_dir):
    payloads = _payloads(spark, sf_dir, synth_bmp, n=1)
    doc_id, b = next(iter(payloads.items()))
    bad = b"XX" + b[2:]
    df = spark.createDataFrame([(doc_id, bytearray(bad))], "doc_id long, payload binary")
    with pytest.raises(Exception, match="not a BMP"):
        decode_bmp_features(df).collect()


def test_wav_decoder_walks_past_foreign_chunks(spark, sf_dir):
    # a real reader must tolerate chunks it doesn't know; splice a LIST
    # chunk between fmt and data and expect identical decode output
    payloads = _payloads(spark, sf_dir, synth_wav, n=1)
    doc_id, b = next(iter(payloads.items()))
    fmt_end = 12 + 8 + 16
    foreign = struct.pack("<4sI", b"LIST", 6) + b"INFOab"
    spliced = b[:fmt_end] + foreign + b[fmt_end:]
    spliced = (
        struct.pack("<4sI4s", b"RIFF", len(spliced) - 8, b"WAVE") + spliced[12:]
    )
    df = spark.createDataFrame(
        [(doc_id, bytearray(spliced))], "doc_id long, payload binary"
    )
    row = decode_wav_features(df).collect()[0]
    assert row.sample_rate == 8000
    assert row.n_samples == 64 + doc_id % 64
    assert row.rms == float(1000 + doc_id % 1000)


def test_png_payloads_are_real_files_and_crc_guarded(spark, sf_dir):
    """The synthesized PNGs must be genuine: correct signature,
    CRC-valid chunks, and a decode that matches the closed form; a
    single flipped pixel byte inside the compressed IDAT must fail
    the CRC check like any real reader."""
    from etl_utils_spark.operators.multimodal import (
        decode_png_features,
        synth_png,
    )

    payloads = _payloads(spark, sf_dir, synth_png, n=1)
    doc_id, b = next(iter(payloads.items()))
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    row = (
        decode_png_features(
            spark.createDataFrame(
                [(doc_id, bytearray(b))], "doc_id long, payload binary"
            )
        )
        .collect()[0]
    )
    assert (row.width, row.height) == (10, 8)
    assert row.mean_r == doc_id % 200 + 8.0
    assert row.mean_g == doc_id % 100 + 4.5
    assert row.mean_b == doc_id % 50 + 3.5
    # flip one byte inside the IDAT body -> CRC must catch it
    idat_at = b.index(b"IDAT")
    bad = bytearray(b)
    bad[idat_at + 6] ^= 0xFF
    df = spark.createDataFrame([(doc_id, bad)], "doc_id long, payload binary")
    with pytest.raises(Exception, match="CRC mismatch"):
        decode_png_features(df).collect()
