"""Full-coverage PNG decode tests: paletted, sub-8-bit and 16-bit
depths, grey+alpha / RGBA, and Adam7 interlacing — the color-type /
depth / interlace matrix that used to raise ValueError. Fixtures are
hand-built per the spec (so each path is exercised independently of our
encoder) plus JDK-ImageIO-produced paletted and 16-bit files."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from aind_exaspim_data_transformation_spark.operators.media_codecs import (
    _ADAM7,
    decode_png,
    encode_png,
)

SIG = b"\x89PNG\r\n\x1a\n"


def chunk(tag: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(tag + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)


def build_png(w, h, depth, color, scanlines: bytes, plte: bytes = b"",
              interlace: int = 0) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = SIG + chunk(b"IHDR", ihdr)
    if plte:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(scanlines)) + chunk(b"IEND", b"")


def pack_bits(values, depth):
    """Pack sample values MSB-first at the given bit depth into bytes."""
    bits = []
    for v in values:
        for i in range(depth - 1, -1, -1):
            bits.append((v >> i) & 1)
    while len(bits) % 8:
        bits.append(0)
    by = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for bit in bits[i : i + 8]:
            b = (b << 1) | bit
        by.append(b)
    return bytes(by)


# --------------------------------------------------------------------------
# Paletted (color type 3), depths 1/2/4/8
# --------------------------------------------------------------------------
@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_paletted_depths(depth):
    n_colors = min(1 << depth, 16)
    rng = np.random.default_rng(depth)
    pal = rng.integers(0, 256, (n_colors, 3)).astype(np.uint8)
    w, h = 7, 5
    idx = rng.integers(0, n_colors, (h, w))
    scan = b"".join(
        b"\x00" + pack_bits(idx[r].tolist(), depth) for r in range(h)
    )
    png = build_png(w, h, depth, 3, scan, plte=pal.tobytes())
    assert np.array_equal(decode_png(png), pal[idx])


def test_paletted_missing_plte_raises():
    scan = b"\x00" + bytes([0, 1, 0])
    png = build_png(3, 1, 8, 3, scan)
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(png)


def test_paletted_index_out_of_range_raises():
    pal = bytes([10, 20, 30] * 2)  # 2 entries
    scan = b"\x00" + bytes([0, 5, 1])
    png = build_png(3, 1, 8, 3, scan, plte=pal)
    with pytest.raises(ValueError, match="palette index"):
        decode_png(png)


# --------------------------------------------------------------------------
# Greyscale depths 1/2/4/16, grey+alpha, RGBA, 16-bit RGB
# --------------------------------------------------------------------------
@pytest.mark.parametrize("depth,scale", [(1, 255), (2, 85), (4, 17)])
def test_grey_sub_byte_depths(depth, scale):
    w, h = 9, 3
    rng = np.random.default_rng(depth)
    v = rng.integers(0, 1 << depth, (h, w))
    scan = b"".join(
        b"\x00" + pack_bits(v[r].tolist(), depth) for r in range(h)
    )
    png = build_png(w, h, depth, 0, scan)
    expected = np.repeat(
        (v * scale).astype(np.uint8)[:, :, None], 3, axis=2
    )
    assert np.array_equal(decode_png(png), expected)


def test_grey_16bit_takes_high_byte():
    w, h = 4, 2
    v16 = np.array(
        [[0x0102, 0xFFEE, 0x8001, 0x00FF], [0x1234, 0x0001, 0xABCD, 0x7F80]],
        dtype=np.uint16,
    )
    scan = b"".join(
        b"\x00" + v16[r].astype(">u2").tobytes() for r in range(h)
    )
    png = build_png(w, h, 16, 0, scan)
    expected = np.repeat(
        (v16 >> 8).astype(np.uint8)[:, :, None], 3, axis=2
    )
    assert np.array_equal(decode_png(png), expected)


def test_rgb_16bit():
    w, h = 3, 2
    rng = np.random.default_rng(16)
    v16 = rng.integers(0, 1 << 16, (h, w, 3)).astype(np.uint16)
    scan = b"".join(
        b"\x00" + v16[r].astype(">u2").tobytes() for r in range(h)
    )
    png = build_png(w, h, 16, 2, scan)
    assert np.array_equal(decode_png(png), (v16 >> 8).astype(np.uint8))


def test_grey_alpha_drops_alpha():
    w, h = 5, 2
    rng = np.random.default_rng(4)
    ga = rng.integers(0, 256, (h, w, 2)).astype(np.uint8)
    scan = b"".join(b"\x00" + ga[r].tobytes() for r in range(h))
    png = build_png(w, h, 8, 4, scan)
    expected = np.repeat(ga[:, :, :1], 3, axis=2)
    assert np.array_equal(decode_png(png), expected)


def test_rgba_drops_alpha_with_filters():
    # RGBA with Sub filter: bpp is 4, so the filter delta must skip the
    # alpha byte correctly.
    w, h = 6, 3
    rng = np.random.default_rng(6)
    rgba = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    scan = bytearray()
    for r in range(h):
        line = rgba[r].reshape(-1).astype(np.int16)
        left = np.concatenate([np.zeros(4, np.int16), line[:-4]])
        scan += b"\x01" + bytes(((line - left) % 256).astype(np.uint8))
    png = build_png(w, h, 8, 6, bytes(scan))
    assert np.array_equal(decode_png(png), rgba[:, :, :3])


# --------------------------------------------------------------------------
# Adam7 interlacing
# --------------------------------------------------------------------------
def adam7_scanlines(img: np.ndarray, depth=8) -> bytes:
    """Serialize an (H, W, C) image as Adam7 passes with filter 0."""
    h, w, ch = img.shape
    out = bytearray()
    for xs, ys, xp, yp in _ADAM7:
        sub = img[ys::yp, xs::xp]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        for r in range(ph):
            out += b"\x00" + sub[r].tobytes()
    return bytes(out)


@pytest.mark.parametrize("size", [(8, 8), (13, 11), (3, 2), (1, 1), (9, 16)])
def test_adam7_interlaced_rgb(size):
    h, w = size
    rng = np.random.default_rng(h * 100 + w)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    png = build_png(w, h, 8, 2, adam7_scanlines(img), interlace=1)
    assert np.array_equal(decode_png(png), img)


def test_adam7_interlaced_grey():
    h, w = 10, 7
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (h, w, 1)).astype(np.uint8)
    png = build_png(w, h, 8, 0, adam7_scanlines(img), interlace=1)
    assert np.array_equal(decode_png(png), np.repeat(img, 3, axis=2))


def test_noninterlaced_roundtrip_still_exact():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (6, 9, 3)).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(img, filter_cycle=5)), img)


def test_trailing_garbage_in_idat_raises():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (2, 2, 3)).astype(np.uint8)
    scan = b"".join(b"\x00" + img[r].tobytes() for r in range(2)) + b"\x00"
    png = build_png(2, 2, 8, 2, scan)
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(png)


# --------------------------------------------------------------------------
# Cross-implementation: JDK ImageIO produces paletted and 16-bit PNGs
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def jvm(spark):
    j = spark._jvm
    try:
        j.java.lang.Class.forName("javax.imageio.ImageIO")
    except Exception:
        pytest.skip("ImageIO unavailable in the JVM")
    return j


def test_we_decode_imageio_paletted_png(spark, jvm, tmp_path):
    h, w = 6, 8
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    bi = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_BYTE_INDEXED
    )
    for r in range(h):
        for c in range(w):
            rr, gg, bb = (int(v) for v in img[r, c])
            bi.setRGB(c, r, (rr << 16) | (gg << 8) | bb)
    p = str(tmp_path / "indexed.png")
    assert jvm.javax.imageio.ImageIO.write(bi, "png", jvm.java.io.File(p))
    ours = decode_png(open(p, "rb").read())
    # the indexed write quantizes to its 256-color web palette; compare
    # against what Java itself says the pixels became
    theirs = np.zeros((h, w, 3), dtype=np.uint8)
    for r in range(h):
        for c in range(w):
            rgb = bi.getRGB(c, r)
            theirs[r, c] = ((rgb >> 16) & 255, (rgb >> 8) & 255, rgb & 255)
    assert np.array_equal(ours, theirs)


def test_we_decode_imageio_16bit_grey_png(spark, jvm, tmp_path):
    h, w = 4, 5
    vals = np.arange(h * w, dtype=np.uint16).reshape(h, w) * 3001
    bi = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_USHORT_GRAY
    )
    raster = bi.getRaster()
    for r in range(h):
        for c in range(w):
            raster.setSample(c, r, 0, int(vals[r, c]))
    p = str(tmp_path / "gray16.png")
    assert jvm.javax.imageio.ImageIO.write(bi, "png", jvm.java.io.File(p))
    ours = decode_png(open(p, "rb").read())
    expected = np.repeat(
        (vals >> 8).astype(np.uint8)[:, :, None], 3, axis=2
    )
    assert np.array_equal(ours, expected)
