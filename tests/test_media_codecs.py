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
    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff", "jpeg")


def test_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    with pytest.raises(ValueError):
        decode_bmp(b"XX bogus")
