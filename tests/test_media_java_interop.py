"""Cross-implementation interop for the image codecs: media_codecs vs
the JDK's independent ImageIO implementation (via py4j).

Proves the from-spec PNG/BMP encoders produce files real tooling
decodes pixel-exact, and that a PNG produced by ImageIO's own encoder
(whose filter choices we don't control) decodes pixel-exact with
decode_png — external coverage of the unfilter paths beyond our own
roundtrips."""

from __future__ import annotations

import numpy as np
import pytest

from aind_exaspim_data_transformation_spark.operators.media_codecs import (
    decode_png,
    encode_bmp,
    encode_png,
)


@pytest.fixture(scope="module")
def jvm(spark):
    j = spark._jvm
    try:
        j.java.lang.Class.forName("javax.imageio.ImageIO")
    except Exception:
        pytest.skip("ImageIO unavailable in the JVM")
    return j


def _read_pixels(jvm, path, h, w):
    bi = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(path))
    assert bi is not None, f"ImageIO could not parse {path}"
    assert (bi.getWidth(), bi.getHeight()) == (w, h)
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for r in range(h):
        for c in range(w):
            rgb = bi.getRGB(c, r)
            out[r, c] = ((rgb >> 16) & 255, (rgb >> 8) & 255, rgb & 255)
    return out


@pytest.mark.parametrize("filter_cycle", [1, 5])
def test_imageio_reads_our_png(spark, jvm, tmp_path, filter_cycle):
    img = (
        np.random.default_rng(filter_cycle)
        .integers(0, 256, (6, 9, 3))
        .astype(np.uint8)
    )
    p = str(tmp_path / f"ours_{filter_cycle}.png")
    with open(p, "wb") as f:
        f.write(encode_png(img, filter_cycle=filter_cycle))
    assert np.array_equal(_read_pixels(jvm, p, 6, 9), img)


def test_imageio_reads_our_bmp(spark, jvm, tmp_path):
    img = (
        np.random.default_rng(3).integers(0, 256, (4, 7, 3)).astype(np.uint8)
    )
    p = str(tmp_path / "ours.bmp")
    with open(p, "wb") as f:
        f.write(encode_bmp(img))
    assert np.array_equal(_read_pixels(jvm, p, 4, 7), img)


def test_we_decode_imageio_png(spark, jvm, tmp_path):
    h, w = 8, 11
    img = np.random.default_rng(9).integers(0, 256, (h, w, 3)).astype(
        np.uint8
    )
    bi = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    for r in range(h):
        for c in range(w):
            rr, gg, bb = (int(v) for v in img[r, c])
            bi.setRGB(c, r, (rr << 16) | (gg << 8) | bb)
    p = str(tmp_path / "java.png")
    assert jvm.javax.imageio.ImageIO.write(bi, "png", jvm.java.io.File(p))
    assert np.array_equal(decode_png(open(p, "rb").read()), img)
