"""Unit tests for the pure-Python multimodal codecs (round 6: the
decode lane computes from actual bytes — VERDICT r5 item 2).

The oracle hash compare pins the decode END VALUES; these tests pin
the parser DISCIPLINE: decoders see only bytes, reject malformed
input, and survive the format's corner geometry (stride padding at
every width mod 4, single-pixel images, RIFF word alignment).
"""

from __future__ import annotations

import struct

import pytest

from shared_solar_data_warehouse_spark.operators.multimodal import (
    _bmp_geometry,
    _bmp_pixel_byte,
    _decode_bmp,
    _decode_wav,
    _encode_bmp,
    _encode_wav,
    _wav_n_samples,
    _wav_sample,
)


@pytest.mark.parametrize("doc_id", [0, 1, 6, 7, 41])
@pytest.mark.parametrize("n_chars", [0, 1, 3, 12, 25, 100])
def test_bmp_roundtrip_all_stride_classes(doc_id, n_chars):
    w, h = _bmp_geometry(doc_id, n_chars)
    payload = _encode_bmp(doc_id, n_chars)
    feats = _decode_bmp(payload)
    stride = ((3 * w + 3) // 4) * 4
    assert feats["width"] == w and feats["height"] == h
    assert feats["bpp"] == 24
    assert feats["file_size"] == 54 + stride * h == len(payload)
    assert feats["pix_sum"] == sum(
        _bmp_pixel_byte(q, doc_id) for q in range(3 * w * h)
    )


def test_bmp_decoder_uses_header_offset_not_convention():
    """Splice extra bytes between header and pixel array, bump the
    recorded offset — a parser hard-coding offset 54 gets a different
    pix_sum; a real one follows the header."""
    doc_id, n_chars = 3, 10
    payload = bytearray(_encode_bmp(doc_id, n_chars))
    pad = b"\xff" * 8
    spliced = payload[:54] + pad + payload[54:]
    spliced[10:14] = struct.pack("<I", 54 + 8)
    spliced[2:6] = struct.pack("<I", len(spliced))
    base = _decode_bmp(bytes(_encode_bmp(doc_id, n_chars)))
    moved = _decode_bmp(bytes(spliced))
    assert moved["pix_sum"] == base["pix_sum"]


def test_bmp_rejects_malformed():
    with pytest.raises(ValueError):
        _decode_bmp(b"PNG garbage that is long enough to unpack maybe....")
    good = bytearray(_encode_bmp(1, 5))
    good[28:30] = struct.pack("<H", 8)  # bpp=8: unsupported variant
    with pytest.raises(ValueError):
        _decode_bmp(bytes(good))


@pytest.mark.parametrize("doc_id", [0, 2, 9])
@pytest.mark.parametrize("n_chars", [0, 17, 63, 64, 200])
def test_wav_roundtrip(doc_id, n_chars):
    payload = _encode_wav(doc_id, n_chars)
    fmt, data = _decode_wav(payload)
    n = _wav_n_samples(n_chars)
    assert fmt == {"codec": 1, "channels": 1, "rate": 8000, "bits": 16}
    assert len(data) == 2 * n
    for s in (0, n // 2, n - 1):
        assert struct.unpack_from("<h", data, s * 2)[0] == _wav_sample(s, doc_id)


def test_wav_chunk_walker_skips_unknown_chunks():
    """Insert a LIST chunk (odd length — exercises RIFF word
    alignment) before fmt/data; a walker that assumes fmt-first or
    miscounts alignment breaks."""
    doc_id, n_chars = 5, 20
    base = _encode_wav(doc_id, n_chars)
    chunks = base[12:]  # fmt + data chunks, WAVE tag stripped
    junk_body = b"INFOxyz"  # 7 bytes -> needs a pad byte
    junk = b"LIST" + struct.pack("<I", len(junk_body)) + junk_body + b"\x00"
    body = b"WAVE" + junk + chunks
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    fmt, data = _decode_wav(payload)
    _, base_data = _decode_wav(base)
    assert fmt["codec"] == 1 and data == base_data


def test_wav_rejects_malformed():
    with pytest.raises(ValueError):
        _decode_wav(b"RIFXnope" + b"\x00" * 32)
    with pytest.raises(ValueError):
        _decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")  # no chunks
