"""Pure-stdlib PNG/BMP codecs: roundtrips, filter coverage, and the
decode_media dispatch (the real-decode half of the multimodal surface —
these tests run unconditionally, no importorskip)."""

from __future__ import annotations

import numpy as np
import pytest

from aind_exaspim_data_transformation_spark.operators.media_codecs import (
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
)
from aind_exaspim_data_transformation_spark.operators.multimodal import (
    decode_media,
)


def _img(h, w, seed=0):
    return (
        np.random.default_rng(seed)
        .integers(0, 256, (h, w, 3))
        .astype(np.uint8)
    )


@pytest.mark.parametrize("h,w", [(8, 8), (5, 7), (1, 1), (16, 3), (3, 16)])
def test_png_roundtrip_all_filters(h, w):
    img = _img(h, w, seed=h * 100 + w)
    # filter_cycle=5 cycles None/Sub/Up/Average/Paeth across rows, so a
    # multi-row image exercises every decoder filter path.
    assert np.array_equal(decode_png(encode_png(img, filter_cycle=5)), img)
    assert np.array_equal(decode_png(encode_png(img, filter_cycle=1)), img)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_single_filter(ft):
    img = _img(9, 6, seed=ft)
    assert np.array_equal(
        decode_png(encode_png(img, fixed_filter=ft)), img
    )


@pytest.mark.parametrize("h,w", [(8, 8), (5, 7), (2, 10), (1, 1), (7, 2)])
def test_bmp_roundtrip_padding(h, w):
    # w=7 -> 21-byte rows (3 pad), w=10 -> 30-byte rows (2 pad).
    img = _img(h, w, seed=h * 10 + w)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_topdown():
    img = _img(4, 5)
    blob = bytearray(encode_bmp(img))
    # Flip to top-down: negate height, reverse row order in the body.
    import struct

    (offset,) = struct.unpack("<I", bytes(blob[10:14]))
    _, w, h = struct.unpack("<Iii", bytes(blob[14:26]))
    blob[14:26] = struct.pack("<Iii", 40, w, -h)
    stride = (w * 3 + 3) // 4 * 4
    body = bytes(blob[offset:])
    rows = [body[i * stride : (i + 1) * stride] for i in range(h)]
    blob[offset:] = b"".join(reversed(rows))
    assert np.array_equal(decode_bmp(bytes(blob)), img)


def test_png_greyscale_expands():
    import struct
    import zlib

    # Hand-build a 2x3 greyscale PNG (color type 0, filter 0).
    grey = np.array([[0, 128, 255], [1, 2, 3]], dtype=np.uint8)
    raw = b"".join(b"\x00" + r.tobytes() for r in grey)

    def chunk(tag, body):
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", crc)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out[..., 0], grey)
    assert np.array_equal(out[..., 1], grey)


def test_decode_media_dispatch():
    img = _img(6, 6)
    assert np.array_equal(decode_media(encode_png(img), "png"), img)
    assert np.array_equal(decode_media(encode_bmp(img), "bmp"), img)
    # jpeg decodes for real since round 7 (lossy in general; flat blocks
    # with even values are exact — see tests/test_jpeg.py)
    from aind_exaspim_data_transformation_spark.operators.jpeg import (
        encode_jpeg,
    )

    flat = np.full((8, 8, 3), 100, dtype=np.uint8)
    assert np.array_equal(
        decode_media(encode_jpeg(flat, quality=50), "jpeg"), flat
    )
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x00\x00\x20ftypisom", "mp4")


def test_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    with pytest.raises(ValueError):
        decode_bmp(b"XX bogus")


# ---------------------------------------------------------------------------
# WAV (RIFF 16-bit PCM)
# ---------------------------------------------------------------------------
import struct

from aind_exaspim_data_transformation_spark.operators.media_codecs import (
    decode_wav,
    encode_wav,
    wav_info,
)


def _wave(n, ch=None, seed=0):
    rng = np.random.default_rng(seed)
    shape = (n,) if ch is None else (n, ch)
    return rng.integers(-32768, 32768, shape).astype(np.int16)


@pytest.mark.parametrize("n", [1, 7, 64, 1001])
def test_wav_roundtrip_mono(n):
    w = _wave(n, seed=n)
    assert np.array_equal(decode_wav(encode_wav(w)), w)


@pytest.mark.parametrize("n,ch", [(5, 2), (64, 2), (9, 3), (100, 6)])
def test_wav_roundtrip_multichannel(n, ch):
    w = _wave(n, ch, seed=n * 10 + ch)
    got = decode_wav(encode_wav(w, sample_rate=44100))
    assert got.shape == (n, ch)
    assert np.array_equal(got, w)


def test_wav_info_and_header_fields():
    w = _wave(32, 2, seed=3)
    payload = encode_wav(w, sample_rate=22050)
    info = wav_info(payload)
    assert info == {
        "format_code": 1,
        "channels": 2,
        "sample_rate": 22050,
        "bits": 16,
    }
    # RIFF size field covers everything after the first 8 bytes.
    (riff_size,) = struct.unpack("<I", payload[4:8])
    assert riff_size == len(payload) - 8


def test_wav_skips_unknown_chunks_with_odd_size_padding():
    w = _wave(21, seed=9)
    payload = encode_wav(w)
    # Splice an odd-sized LIST chunk (body 5 -> 1 pad byte) between fmt
    # and data, and fix the RIFF size.
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = payload[:36] + extra + payload[36:]
    spliced = (
        spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    )
    assert np.array_equal(decode_wav(spliced), w)
    assert wav_info(spliced)["channels"] == 1


def test_wav_decode_media_dispatch():
    w = _wave(17, seed=4)
    got = decode_media(encode_wav(w), "wav")
    assert got.dtype == np.int16
    assert np.array_equal(got, w)


def test_wav_rejects_bad_inputs():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not a wav at all")
    w = _wave(8, seed=1)
    payload = bytearray(encode_wav(w))
    # Flip the format code to 3 (IEEE float): unsupported.
    payload[20:22] = struct.pack("<H", 3)
    with pytest.raises(ValueError, match="format code 3"):
        decode_wav(bytes(payload))
    payload = bytearray(encode_wav(w))
    # Flip bits/sample to 8: unsupported depth.
    payload[34:36] = struct.pack("<H", 8)
    with pytest.raises(ValueError, match="8-bit"):
        decode_wav(bytes(payload))
    with pytest.raises(ValueError, match="expects"):
        encode_wav(w.astype(np.int32))


def test_wav_truncated_data_chunk_clamps():
    # A data chunk whose declared size exceeds the file decodes the
    # samples that exist (defensive read path).
    w = _wave(10, seed=2)
    payload = encode_wav(w)
    assert np.array_equal(decode_wav(payload[:-4]), w[:-2])
