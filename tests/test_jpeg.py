"""Baseline-JPEG codec tests: exact flat-block round trips (the property
the oracle query relies on), error-bounded lossy round trips, marker
edge cases, and cross-implementation checks against the JDK's
independent ImageIO JPEG codec (via py4j), mirroring the PNG/BMP
interop strategy in test_media_java_interop.py."""

from __future__ import annotations

import numpy as np
import pytest

from aind_exaspim_data_transformation_spark.operators.jpeg import (
    JpegError,
    decode_jpeg,
    encode_jpeg,
)


def flat_block_plane(seed: int, by: int = 2, bx: int = 2) -> np.ndarray:
    """(8*by, 8*bx) uint8 plane of flat 8x8 blocks with EVEN values —
    exact through quality-50 baseline JPEG (luma DC quant step 16)."""
    rng = np.random.default_rng(seed)
    vals = (2 * rng.integers(0, 128, (by, bx))).astype(np.uint8)
    return np.kron(vals, np.ones((8, 8), dtype=np.uint8))


def gradient_rgb(h: int, w: int) -> np.ndarray:
    """Wrap-free smooth gradient (values scaled into 0..255 without mod
    discontinuities, which chroma subsampling would legitimately smear)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    ramp_y = yy / max(h - 1, 1)
    ramp_x = xx / max(w - 1, 1)
    return np.stack(
        [
            np.round(255 * (0.7 * ramp_y + 0.3 * ramp_x)),
            np.round(255 * (0.4 * ramp_y + 0.6 * ramp_x)),
            np.round(40 + 170 * (0.5 * ramp_y + 0.5 * ramp_x)),
        ],
        axis=2,
    ).astype(np.uint8)


# --------------------------------------------------------------------------
# Exact flat-block round trips (oracle-load-bearing)
# --------------------------------------------------------------------------
@pytest.mark.parametrize("mode", ["444", "420", "gray"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_flat_even_blocks_roundtrip_exact(mode, seed):
    plane = flat_block_plane(seed)
    expected = np.stack([plane] * 3, axis=2)
    if mode == "gray":
        data = encode_jpeg(plane, quality=50)
    else:
        data = encode_jpeg(expected, quality=50, subsampling=mode)
    assert np.array_equal(decode_jpeg(data), expected)


def test_flat_blocks_with_restart_interval_exact():
    plane = flat_block_plane(5, by=3, bx=4)  # 12 MCUs in gray
    expected = np.stack([plane] * 3, axis=2)
    for ri in (1, 2, 5):
        data = encode_jpeg(plane, quality=50, restart_interval=ri)
        assert np.array_equal(decode_jpeg(data), expected), f"ri={ri}"
    # 444 color: 12 MCUs as well (one block per MCU)
    data = encode_jpeg(expected, quality=50, subsampling="444",
                       restart_interval=3)
    assert np.array_equal(decode_jpeg(data), expected)


def test_flat_blocks_large_dc_swings_exact():
    # Adjacent blocks at the value extremes exercise every DC Huffman
    # size category up to the +/-1016/16-step range.
    vals = np.array([[0, 254], [254, 0]], dtype=np.uint8)
    plane = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    expected = np.stack([plane] * 3, axis=2)
    data = encode_jpeg(plane, quality=50)
    assert np.array_equal(decode_jpeg(data), expected)


# --------------------------------------------------------------------------
# Lossy general content: bounded error, odd sizes
# --------------------------------------------------------------------------
@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("size", [(8, 8), (17, 13), (24, 33)])
def test_gradient_roundtrip_bounded(sub, size):
    img = gradient_rgb(*size)
    dec = decode_jpeg(encode_jpeg(img, quality=95, subsampling=sub))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    # smooth content at q=95: luma near-exact; chroma subsampling is the
    # only big error source and this gradient is chroma-smooth too
    assert err.mean() < 4.0
    assert err.max() <= 48


def test_quality_monotone_on_smooth_content():
    img = gradient_rgb(32, 32)
    errs = []
    for q in (30, 60, 90):
        dec = decode_jpeg(encode_jpeg(img, quality=q, subsampling="444"))
        errs.append(np.abs(dec.astype(int) - img.astype(int)).mean())
    assert errs[0] >= errs[1] >= errs[2]


def test_grayscale_input_matches_channel_replication():
    rng = np.random.default_rng(11)
    plane = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(plane, quality=90))
    assert dec.shape == (16, 16, 3)
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])
    assert np.array_equal(dec[:, :, 0], dec[:, :, 2])


# --------------------------------------------------------------------------
# Marker / error handling
# --------------------------------------------------------------------------
def test_rejects_non_jpeg():
    with pytest.raises(JpegError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_rejects_lossless_sof3():
    data = bytearray(encode_jpeg(flat_block_plane(0), quality=50))
    i = data.find(b"\xff\xc0")
    assert i > 0
    data[i + 1] = 0xC3  # flip SOF0 -> SOF3 (lossless, unsupported)
    with pytest.raises(JpegError, match="SOF"):
        decode_jpeg(bytes(data))


# --------------------------------------------------------------------------
# Progressive (SOF2)
# --------------------------------------------------------------------------
@pytest.mark.parametrize("mode", ["444", "422", "420", "gray"])
def test_progressive_flat_blocks_exact(mode):
    plane = flat_block_plane(13)
    expected = np.stack([plane] * 3, axis=2)
    if mode == "gray":
        data = encode_jpeg(plane, quality=50, progressive=True)
    else:
        data = encode_jpeg(
            expected, quality=50, subsampling=mode, progressive=True
        )
    assert data[:2] == b"\xff\xd8" and b"\xff\xc2" in data  # really SOF2
    assert np.array_equal(decode_jpeg(data), expected)


@pytest.mark.parametrize("sub", ["444", "422", "420"])
@pytest.mark.parametrize("size", [(8, 8), (21, 35), (17, 13)])
def test_progressive_decode_equals_baseline_decode(sub, size):
    # The scan script reorders the SAME quantized coefficients, so the
    # reconstruction must be bit-identical to the baseline file's.
    img = gradient_rgb(*size)
    base = decode_jpeg(encode_jpeg(img, quality=80, subsampling=sub))
    prog = decode_jpeg(
        encode_jpeg(img, quality=80, subsampling=sub, progressive=True)
    )
    assert np.array_equal(base, prog)


def test_progressive_rejects_restart_interval():
    with pytest.raises(ValueError, match="baseline"):
        encode_jpeg(
            flat_block_plane(0), progressive=True, restart_interval=2
        )


def test_rejects_truncated_scan():
    data = encode_jpeg(gradient_rgb(16, 16), quality=75)
    with pytest.raises(JpegError):
        decode_jpeg(data[: len(data) // 2])


def test_skips_app_and_comment_segments():
    data = bytearray(encode_jpeg(flat_block_plane(3), quality=50))
    # splice a COM and an APP9 segment right after SOI
    extra = (
        b"\xff\xfe\x00\x07hello"  # COM, len 7
        + b"\xff\xe9\x00\x04\xab\xcd"  # APP9, len 4
    )
    spliced = bytes(data[:2]) + extra + bytes(data[2:])
    plane = flat_block_plane(3)
    assert np.array_equal(
        decode_jpeg(spliced), np.stack([plane] * 3, axis=2)
    )


# --------------------------------------------------------------------------
# Cross-implementation: JDK ImageIO (independent codec) via py4j
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def jvm(spark):
    j = spark._jvm
    try:
        j.java.lang.Class.forName("javax.imageio.ImageIO")
    except Exception:
        pytest.skip("ImageIO unavailable in the JVM")
    return j


def _imageio_read(jvm, path, h, w):
    bi = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(path))
    assert bi is not None, f"ImageIO could not parse {path}"
    assert (bi.getWidth(), bi.getHeight()) == (w, h)
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for r in range(h):
        for c in range(w):
            rgb = bi.getRGB(c, r)
            out[r, c] = ((rgb >> 16) & 255, (rgb >> 8) & 255, rgb & 255)
    return out


# gray is excluded: the JDK expands grayscale JPEG through its linear
# gray ColorSpace (gamma-mapped by getRGB), so byte equality is not the
# right oracle there — our own roundtrip + the color modes cover it.
@pytest.mark.parametrize("mode", ["444", "420"])
def test_imageio_reads_our_flat_jpeg_exact(spark, jvm, tmp_path, mode):
    plane = flat_block_plane(7)
    expected = np.stack([plane] * 3, axis=2)
    data = encode_jpeg(expected, quality=50, subsampling=mode)
    p = str(tmp_path / f"flat_{mode}.jpg")
    with open(p, "wb") as f:
        f.write(data)
    # DC-only blocks: every compliant decoder reconstructs them exactly
    assert np.array_equal(_imageio_read(jvm, p, 16, 16), expected)


def test_imageio_agrees_on_our_general_jpeg(spark, jvm, tmp_path):
    img = gradient_rgb(24, 32)
    p = str(tmp_path / "grad.jpg")
    data = encode_jpeg(img, quality=90, subsampling="444")
    with open(p, "wb") as f:
        f.write(data)
    theirs = _imageio_read(jvm, p, 24, 32)
    ours = decode_jpeg(data)
    # same coefficients, independent IDCT + color conversion: T.83-level
    # agreement (|diff| <= 1 almost everywhere; allow a couple of ulps
    # of rounding interplay at clamp boundaries)
    diff = np.abs(theirs.astype(int) - ours.astype(int))
    assert diff.max() <= 2, diff.max()


def test_we_decode_imageio_jpeg(spark, jvm, tmp_path):
    # Gray-content RGB so the JDK writer's 4:2:0 chroma planes are
    # constant — its "fancy" upsampler and our replicator then agree,
    # and the comparison isolates the entropy/DCT pipeline.
    h, w = 24, 24
    yy, xx = np.mgrid[0:h, 0:w]
    g = ((yy * 4 + xx * 3) % 200 + 20).astype(np.uint8)
    bi = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    for r in range(h):
        for c in range(w):
            v = int(g[r, c])
            bi.setRGB(c, r, (v << 16) | (v << 8) | v)
    p = str(tmp_path / "java.jpg")
    assert jvm.javax.imageio.ImageIO.write(bi, "jpeg", jvm.java.io.File(p))
    data = open(p, "rb").read()
    ours = decode_jpeg(data)
    theirs = _imageio_read(jvm, p, h, w)
    diff = np.abs(theirs.astype(int) - ours.astype(int))
    assert diff.max() <= 2, diff.max()


def test_fill_bytes_before_markers():
    # T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
    # bytes; splice some in front of SOF and EOI.
    data = encode_jpeg(flat_block_plane(2), quality=50)
    i = data.find(b"\xff\xc0")
    spliced = data[:i] + b"\xff\xff\xff" + data[i:]
    j = spliced.rfind(b"\xff\xd9")
    spliced = spliced[:j] + b"\xff" + spliced[j:]
    plane = flat_block_plane(2)
    assert np.array_equal(
        decode_jpeg(spliced), np.stack([plane] * 3, axis=2)
    )


def test_422_flat_blocks_roundtrip_exact():
    # 4:2:2 exercises the horizontal-only (fx=2, fy=1) upsampling path
    # the other modes never hit.
    plane = flat_block_plane(9)
    expected = np.stack([plane] * 3, axis=2)
    data = encode_jpeg(expected, quality=50, subsampling="422")
    assert np.array_equal(decode_jpeg(data), expected)


def test_422_gradient_bounded_and_imageio_agrees(spark, jvm, tmp_path):
    img = gradient_rgb(16, 26)  # odd chroma width after subsampling
    data = encode_jpeg(img, quality=95, subsampling="422")
    ours = decode_jpeg(data)
    err = np.abs(ours.astype(int) - img.astype(int))
    assert err.mean() < 4.0
    p = str(tmp_path / "g422.jpg")
    with open(p, "wb") as f:
        f.write(data)
    theirs = _imageio_read(jvm, p, 16, 26)
    # IJG-style decoders use fancy (triangle) chroma upsampling for
    # 4:2:2 while we replicate; luma is identical, chroma reconstruction
    # differs by a bounded interpolation delta on smooth content.
    diff = np.abs(theirs.astype(int) - ours.astype(int))
    assert diff.max() <= 16 and diff.mean() < 2.0, (diff.max(), diff.mean())


def _jdk_write_progressive(jvm, bi, path):
    it = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpeg")
    writer = it.next()
    param = writer.getDefaultWriteParam()
    param.setProgressiveMode(
        jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT
    )
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(
        jvm.java.io.File(path)
    )
    writer.setOutput(ios)
    writer.write(
        None, jvm.javax.imageio.IIOImage(bi, None, None), param
    )
    ios.close()
    writer.dispose()


def test_we_decode_jdk_progressive_jpeg(spark, jvm, tmp_path):
    # The JDK's progressive writer emits the full IJG scan script —
    # DC/AC successive approximation with refinement scans and EOB runs
    # — the hardest decode path. Gray content keeps chroma flat so the
    # comparison isolates the progressive entropy pipeline.
    h, w = 24, 24
    yy, xx = np.mgrid[0:h, 0:w]
    g = ((yy * 5 + xx * 3) % 200 + 20).astype(np.uint8)
    bi = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    for r in range(h):
        for c in range(w):
            v = int(g[r, c])
            bi.setRGB(c, r, (v << 16) | (v << 8) | v)
    p = str(tmp_path / "jdk_prog.jpg")
    _jdk_write_progressive(jvm, bi, p)
    data = open(p, "rb").read()
    assert b"\xff\xc2" in data  # really progressive
    ours = decode_jpeg(data)
    theirs = _imageio_read(jvm, p, h, w)
    diff = np.abs(theirs.astype(int) - ours.astype(int))
    assert diff.max() <= 2, diff.max()


@pytest.mark.parametrize("mode", ["444", "420"])
def test_imageio_reads_our_progressive_flat_exact(spark, jvm, tmp_path,
                                                  mode):
    plane = flat_block_plane(21)
    expected = np.stack([plane] * 3, axis=2)
    data = encode_jpeg(
        expected, quality=50, subsampling=mode, progressive=True
    )
    p = str(tmp_path / f"ours_prog_{mode}.jpg")
    with open(p, "wb") as f:
        f.write(data)
    assert np.array_equal(_imageio_read(jvm, p, 16, 16), expected)


def test_rejects_four_component_cmyk():
    # Splice a 4th component into the SOF of a 444 file: the decoder
    # must reject CMYK-style frames with a clear error instead of
    # failing on color-transform unpacking.
    import struct

    plane = flat_block_plane(4)
    data = bytearray(
        encode_jpeg(np.stack([plane] * 3, axis=2), quality=50)
    )
    i = data.find(b"\xff\xc0")
    (seglen,) = struct.unpack(">H", bytes(data[i + 2 : i + 4]))
    # bump component count 3 -> 4 and append one component spec
    assert data[i + 9] == 3
    data[i + 9] = 4
    insert_at = i + 2 + seglen
    data[insert_at:insert_at] = bytes((4, 0x11, 1))  # id=4, 1x1, tq=1
    struct.pack_into(">H", data, i + 2, seglen + 3)
    # extend SOS to reference it too
    j = data.find(b"\xff\xda")
    (soslen,) = struct.unpack(">H", bytes(data[j + 2 : j + 4]))
    assert data[j + 4] == 3
    data[j + 4] = 4
    data[j + 5 + 6 : j + 5 + 6] = bytes((4, 0x11))
    struct.pack_into(">H", data, j + 2, soslen + 2)
    with pytest.raises(JpegError):
        decode_jpeg(bytes(data))
