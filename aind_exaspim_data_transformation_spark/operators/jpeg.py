"""Baseline-DCT JPEG codec (ITU-T T.81), pure stdlib + numpy.

JPEG was the last gated image modality in ``operators.multimodal``
(png/bmp/wav already decode for real via ``operators.media_codecs``).
Everything here is from the public spec: ITU-T T.81 (marker syntax,
Huffman entropy coding in Annex C/F, the reference quantization and
"typical" Huffman tables in Annex K) and the JFIF interchange
conventions (BT.601 full-range YCbCr, centered chroma).

Scope — the two DCT profiles that cover essentially every real-world
JPEG:

- decoder: baseline/extended sequential (SOF0/SOF1) AND progressive
  (SOF2) — SOI/APPn/COM/DQT/DHT/DRI/SOS/RSTn/EOI; 8-bit precision;
  1- or 3-component frames; arbitrary integer sampling factors whose
  max is divisible by each component's (covers 4:4:4, 4:2:2, 4:2:0);
  interleaved and non-interleaved scans; the full progressive feature
  set per T.81 G.2 (spectral selection, successive approximation with
  DC/AC refinement scans, EOB runs); restart markers; byte stuffing.
  Lossless/hierarchical/arithmetic frame types raise ``JpegError``.
- encoder (for fixtures/tests, like ``encode_png``): quality-scaled
  Annex K quantization tables, Annex K typical Huffman tables, 4:4:4 /
  4:2:2 / 4:2:0 / grayscale, optional restart interval, and a
  spectral-selection progressive mode (interleaved DC scan + one AC
  scan per component) — so decoder coverage (every Huffman path,
  subsampling, restarts, multi-scan accumulation) does not depend on
  external sample files. The successive-approximation refinement path
  the encoder does not emit is cross-checked against JDK-ImageIO-
  written full-IJG-script progressive files in tests/test_jpeg.py.

Determinism: the IDCT is the exact separable float transform (an 8x8
orthonormal basis matrix applied twice), so decode is a pure function
of the bytes — no SIMD/fixed-point approximation whose output could
vary by platform. For images made of flat 8x8 blocks whose gray value
``v`` is even, quantization at quality 50 (luma DC step 16) is exact
(``(v-128)/2`` is an integer) and the full encode->decode round trip
reproduces ``v`` EXACTLY — the property the oracle-gated query
``q_multimodal_jpeg_decode_stats`` relies on; general content is
covered by cross-implementation tests against JDK ImageIO
(tests/test_jpeg.py), matching the PNG/BMP strategy.

At 100 TB the shape is identical to the other codecs: decode runs
map-only inside Arrow-batched ``mapInPandas``; payload bytes never
shuffle.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    """Malformed or unsupported (non-baseline) JPEG input."""


# Zigzag scan order: _ZZ[k] = natural (row-major) coefficient index of
# the k-th value in zigzag order (T.81 figure 5).
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1 reference quantization tables (natural row-major order).
_QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
_QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# Annex K.3 "typical" Huffman tables: (BITS[1..16], HUFFVAL).
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: C[u, x] = c(u)/2 * cos((2x+1)u*pi/16).

    Forward: F = C @ X @ C.T; inverse: X = C.T @ F @ C. For u=0 the
    cosine argument is exactly 0.0, so every C[0, x] is the identical
    double — which makes the IDCT of a DC-only block an exact flat
    plane (the property the oracle query leans on).
    """
    u = np.arange(8, dtype=np.float64)[:, None]
    x = np.arange(8, dtype=np.float64)[None, :]
    m = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    m[0, :] /= np.sqrt(2.0)
    return m


_C = _dct_matrix()


# --------------------------------------------------------------------------
# Huffman tables (T.81 Annex C generation, Annex F.2.2.3 decode procedure)
# --------------------------------------------------------------------------
def _build_decode_table(bits: list[int], vals: list[int]):
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for ln in range(1, 17):
        n = bits[ln - 1]
        if n:
            valptr[ln] = k
            mincode[ln] = code
            k += n
            code += n
            maxcode[ln] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, list(vals)


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    ehuf = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            ehuf[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return ehuf


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed value."""
    if s and v < (1 << (s - 1)):
        return v - ((1 << s) - 1)
    return v


class _BitReader:
    """MSB-first bit reader over entropy-coded data with byte
    de-stuffing (FF 00 -> FF); any other marker mid-stream is an error
    except at explicit restart points."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.p >= len(self.d):
                raise JpegError("truncated entropy-coded data")
            b = self.d[self.p]
            if b == 0xFF:
                if self.p + 1 >= len(self.d) or self.d[self.p + 1] != 0x00:
                    raise JpegError("marker inside entropy-coded data")
                self.p += 2
            else:
                self.p += 1
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, s: int) -> int:
        v = 0
        for _ in range(s):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table) -> int:
        mincode, maxcode, valptr, vals = table
        code = self.read_bit()
        ln = 1
        while code > maxcode[ln]:
            ln += 1
            if ln > 16:
                raise JpegError("invalid Huffman code")
            code = (code << 1) | self.read_bit()
        return vals[valptr[ln] + code - mincode[ln]]

    def sync_to_marker(self) -> None:
        """Discard pad bits / unread pad bytes up to the next marker."""
        self.n = 0
        while self.p + 1 < len(self.d):
            if self.d[self.p] == 0xFF and self.d[self.p + 1] != 0x00:
                return
            self.p += 1
        raise JpegError("ran off the end looking for a marker")

    def expect_restart(self, idx: int) -> None:
        self.sync_to_marker()
        m = self.d[self.p + 1]
        if m != 0xD0 + idx:
            raise JpegError(
                f"expected RST{idx}, found marker 0x{m:02x}"
            )
        self.p += 2


class _BitWriter:
    """MSB-first bit writer with byte stuffing (FF -> FF 00)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3)."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)

    def marker(self, m: int) -> None:
        self.flush()
        self.buf += bytes((0xFF, m))


# --------------------------------------------------------------------------
# Decoder — coefficient-store architecture: every scan (the single scan
# of a baseline file, or the many spectral-selection / successive-
# approximation scans of a progressive file) decodes into per-component
# zigzag coefficient arrays; dequant + IDCT + color happen once at EOI.
# The band decoders follow T.81 F.2 (sequential) and G.2 (progressive,
# incl. the EOB-run and correction-bit algorithms).
# --------------------------------------------------------------------------
def _dc_decode(br, cz, dc_t, preds, ci, ah, al):
    if ah == 0:  # first DC scan: diff of DC/2^al, stored shifted up
        s = br.decode(dc_t)
        preds[ci] += _extend(br.receive(s), s)
        cz[0] = preds[ci] << al
    else:  # refinement: one bit of the magnitude
        if br.read_bit():
            cz[0] |= 1 << al


def _ac_first(br, cz, ac_t, ss, se, al, eobrun):
    """First (or only) pass over an AC band; baseline is the al=0,
    full-band case (its EOB is the degenerate EOBRUN of length 1)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.decode(ac_t)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:  # EOBn: run of (1<<r)+bits blocks ending here
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.receive(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise JpegError("AC coefficient run past end of band")
        cz[k] = _extend(br.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine(br, cz, ac_t, ss, se, al, eobrun):
    """Successive-approximation AC refinement (T.81 G.1.2.3): nonzero-
    history coefficients get a correction bit; zero-history positions
    are counted by the run lengths and may gain a new +-2^al."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.decode(ac_t)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                # r == 15: skip 16 zero-history positions
            else:
                if s != 1:
                    raise JpegError("invalid refinement magnitude")
                val = p1 if br.read_bit() else -p1
            while k <= se:
                if cz[k] != 0:
                    if br.read_bit() and (cz[k] & p1) == 0:
                        cz[k] += p1 if cz[k] > 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                cz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if cz[k] != 0:
                if br.read_bit() and (cz[k] & p1) == 0:
                    cz[k] += p1 if cz[k] > 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_band(br, cz, dc_t, ac_t, preds, ci, spec, eobrun):
    ss, se, ah, al = spec
    if ss == 0:
        _dc_decode(br, cz, dc_t, preds, ci, ah, al)
        if se == 0:
            return eobrun  # progressive DC-only scan
        band_start = 1  # baseline: DC + full AC band in one pass
    else:
        band_start = ss
    if ah == 0:
        return _ac_first(br, cz, ac_t, band_start, se, al, eobrun)
    return _ac_refine(br, cz, ac_t, band_start, se, al, eobrun)


def _decode_scan(data, pos, scan, coefs, mx, my, hmax, vmax,
                 h_img, w_img, huff, ri, spec):
    """Decode one scan's entropy data into the coefficient store.
    ``scan`` is [(comp_index, comp, td, ta)]; interleaved scans walk
    MCUs, single-component scans walk that component's own block grid
    (T.81 A.2.2/A.2.3)."""
    tables = []
    need_dc = spec[0] == 0 and spec[2] == 0  # DC first scans decode huffman
    need_ac = spec[1] > 0  # any AC pass (first or refine) uses the AC table
    for _ci, _c, td, ta in scan:
        try:
            dc_t = huff[(0, td)] if need_dc else None
            ac_t = huff[(1, ta)] if need_ac else None
        except KeyError as e:
            raise JpegError(f"scan references missing table {e}") from e
        tables.append((dc_t, ac_t))
    br = _BitReader(data, pos)
    preds = [0] * len(scan)
    eobrun = 0
    rst = 0
    interleaved = len(scan) > 1
    if interleaved:
        units = mx * my
    else:
        _ci, c, _td, _ta = scan[0]
        cw = -(-(w_img * c["h"]) // hmax)  # component width in samples
        ch_ = -(-(h_img * c["v"]) // vmax)
        bw = -(-cw // 8)  # block-grid dims (T.81 A.2.2, non-interleaved)
        bh = -(-ch_ // 8)
        units = bw * bh
    for i in range(units):
        if ri and i and i % ri == 0:
            br.expect_restart(rst)
            rst = (rst + 1) & 7
            preds = [0] * len(scan)
            eobrun = 0
        if interleaved:
            myi, mxi = divmod(i, mx)
            for si, (ci, c, _td, _ta) in enumerate(scan):
                dc_t, ac_t = tables[si]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        cz = coefs[ci][myi * c["v"] + by, mxi * c["h"] + bx]
                        eobrun = _decode_band(
                            br, cz, dc_t, ac_t, preds, si, spec, eobrun
                        )
        else:
            ci, c, _td, _ta = scan[0]
            dc_t, ac_t = tables[0]
            cz = coefs[ci][i // bw, i % bw]
            eobrun = _decode_band(
                br, cz, dc_t, ac_t, preds, 0, spec, eobrun
            )
    br.sync_to_marker()
    return br.p


def _reconstruct(comps, coefs, qt, h_img, w_img) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for c, cf in zip(comps, coefs):
        try:
            q = qt[c["tq"]]
        except KeyError as e:
            raise JpegError(f"frame references missing quant table {e}") from e
        by, bx = cf.shape[:2]
        pl = np.zeros((by * 8, bx * 8), dtype=np.float64)
        nat = np.zeros(64, dtype=np.float64)
        for yb in range(by):
            for xb in range(bx):
                nat[_ZZ] = cf[yb, xb]
                blk = nat.reshape(8, 8) * q
                pl[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8] = (
                    _C.T @ blk @ _C + 128.0
                )
        fy, fx = vmax // c["v"], hmax // c["h"]
        if vmax % c["v"] or hmax % c["h"]:
            raise JpegError("non-integral sampling-factor ratio")
        if fy > 1:
            pl = np.repeat(pl, fy, axis=0)
        if fx > 1:
            pl = np.repeat(pl, fx, axis=1)
        full.append(pl[:h_img, :w_img])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    if len(full) != 3:
        raise JpegError(
            f"{len(full)}-component JPEG (CMYK/unknown) is not supported"
        )
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack(
        [np.clip(np.round(ch), 0, 255).astype(np.uint8) for ch in (r, g, b)],
        axis=2,
    )


_SOF_UNSUPPORTED = {
    0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF
}


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline-sequential (SOF0/SOF1) or progressive (SOF2)
    JPEG bytes to an (H, W, 3) uint8 RGB array (grayscale images are
    expanded channel-wise, like ``decode_png``)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG stream (missing SOI)")
    p = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}
    comps = None
    coefs = None
    mx = my = hmax = vmax = 0
    h_img = w_img = 0
    ri = 0
    scans_seen = False
    while p + 1 < len(data):
        if data[p] != 0xFF:
            raise JpegError(f"expected marker at byte {p}")
        m = data[p + 1]
        if m == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            p += 1
            continue
        p += 2
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:  # TEM / stray RST: no payload
            continue
        (seglen,) = struct.unpack(">H", data[p : p + 2])
        seg = data[p + 2 : p + seglen]
        p += seglen
        if m == 0xDB:  # DQT — one or more tables per segment
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 15
                o += 1
                if pq != 0:
                    raise JpegError("baseline requires 8-bit quant tables")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZZ] = np.frombuffer(
                    seg[o : o + 64], dtype=np.uint8
                ).astype(np.int64)
                qt[tq] = tbl.reshape(8, 8)
                o += 64
        elif m == 0xC4:  # DHT — one or more tables per segment
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 15
                o += 1
                bits = list(seg[o : o + 16])
                o += 16
                nv = sum(bits)
                huff[(tc, th)] = _build_decode_table(
                    bits, list(seg[o : o + nv])
                )
                o += nv
        elif m in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progressive
            if seg[0] != 8:
                raise JpegError("only 8-bit sample precision is supported")
            h_img, w_img = struct.unpack(">HH", seg[1:5])
            if not h_img or not w_img:
                raise JpegError("DNL-deferred dimensions not supported")
            comps = []
            for i in range(seg[5]):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                h, v = hv >> 4, hv & 15
                if not h or not v:
                    raise JpegError("zero sampling factor")
                comps.append({"id": cid, "h": h, "v": v, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mx = -(-w_img // (8 * hmax))
            my = -(-h_img // (8 * vmax))
            coefs = [
                np.zeros(
                    (my * c["v"], mx * c["h"], 64), dtype=np.int32
                )
                for c in comps
            ]
        elif m in _SOF_UNSUPPORTED:
            raise JpegError(
                "only baseline sequential and progressive JPEG are "
                f"supported (SOF 0x{m:02x})"
            )
        elif m == 0xDD:  # DRI
            (ri,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS
            if comps is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                match = [
                    (j, c) for j, c in enumerate(comps) if c["id"] == cs
                ]
                if not match:
                    raise JpegError(f"scan component {cs} not in frame")
                scan.append(
                    (match[0][0], match[0][1], tt >> 4, tt & 15)
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            spec = (ss, se, ahal >> 4, ahal & 15)
            if se > 63 or ss > se:
                raise JpegError(f"bad spectral selection {ss}..{se}")
            if ns > 1 and ss != 0:
                raise JpegError("interleaved AC scan is not legal")
            p = _decode_scan(
                data, p, scan, coefs, mx, my, hmax, vmax,
                h_img, w_img, huff, ri, spec,
            )
            scans_seen = True
        # else: APPn / COM / unknown-with-length — skipped
    if not scans_seen:
        raise JpegError("no image scan found")
    return _reconstruct(comps, coefs, qt, h_img, w_img)


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------
def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def sc(base):
        return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)
    return sc(_QUANT_LUMA), sc(_QUANT_CHROMA)


def _rgb_to_ycbcr(arr: np.ndarray) -> list[np.ndarray]:
    r = arr[:, :, 0].astype(np.float64)
    g = arr[:, :, 1].astype(np.float64)
    b = arr[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return [
        np.clip(np.round(ch), 0, 255).astype(np.float64)
        for ch in (y, cb, cr)
    ]


def _downsample_420(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    if h % 2 or w % 2:
        plane = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
    s = (
        plane[0::2, 0::2]
        + plane[1::2, 0::2]
        + plane[0::2, 1::2]
        + plane[1::2, 1::2]
    ) / 4.0
    return np.round(s)


def _downsample_422(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    if w % 2:
        plane = np.pad(plane, ((0, 0), (0, 1)), mode="edge")
    return np.round((plane[:, 0::2] + plane[:, 1::2]) / 2.0)


def _pad_to(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = plane.shape
    py = (-h) % mult_y
    px = (-w) % mult_x
    if py or px:
        plane = np.pad(plane, ((0, py), (0, px)), mode="edge")
    return plane


def _encode_dc(bw: _BitWriter, dc: int, pred: int, dc_t) -> int:
    diff = dc - pred
    s = abs(diff).bit_length()
    code, ln = dc_t[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    return dc


def _encode_ac(bw: _BitWriter, zz: np.ndarray, ac_t) -> None:
    """Emit the AC band 1..63 of one block. The trailing EOB doubles as
    the progressive EOB0 (an EOB run of exactly this block), so the same
    emitter serves the baseline scan and a spectral-selection AC scan."""
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_t[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_t[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_t[0x00]  # EOB / EOB0
        bw.write(code, ln)


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int, dc_t, ac_t):
    dc = _encode_dc(bw, int(zz[0]), pred, dc_t)
    _encode_ac(bw, zz, ac_t)
    return dc


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 75,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode (H, W, 3) uint8 RGB or (H, W) uint8 grayscale as JFIF
    JPEG — baseline sequential (SOF0, default) or spectral-selection
    progressive (SOF2: one interleaved DC scan, then one full AC scan
    per component). ``subsampling`` is '444', '422', or '420' (ignored
    for grayscale); ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs (baseline only)."""
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 input")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("encode_jpeg expects (H, W, 3) or (H, W)")
    if subsampling not in ("444", "422", "420"):
        raise ValueError("subsampling must be '444', '422', or '420'")
    if progressive and restart_interval:
        raise ValueError(
            "restart_interval is supported for baseline encoding only"
        )
    h_img, w_img = arr.shape[:2]
    if not h_img or not w_img:
        raise ValueError("empty image")
    ql, qc = _quality_tables(quality)

    if gray:
        comps = [
            {"id": 1, "h": 1, "v": 1, "tq": 0, "plane": arr.astype(np.float64)}
        ]
    else:
        y, cb, cr = _rgb_to_ycbcr(arr)
        if subsampling == "420":
            comps = [
                {"id": 1, "h": 2, "v": 2, "tq": 0, "plane": y},
                {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": _downsample_420(cb)},
                {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": _downsample_420(cr)},
            ]
        elif subsampling == "422":
            comps = [
                {"id": 1, "h": 2, "v": 1, "tq": 0, "plane": y},
                {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": _downsample_422(cb)},
                {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": _downsample_422(cr)},
            ]
        else:
            comps = [
                {"id": 1, "h": 1, "v": 1, "tq": 0, "plane": y},
                {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": cb},
                {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": cr},
            ]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mx = -(-w_img // (8 * hmax))
    my = -(-h_img // (8 * vmax))
    for c in comps:
        c["plane"] = _pad_to(c["plane"], my * c["v"] * 8, mx * c["h"] * 8)
        # _pad_to pads to a multiple; force the exact MCU-grid size
        c["plane"] = np.pad(
            c["plane"],
            (
                (0, my * c["v"] * 8 - c["plane"].shape[0]),
                (0, mx * c["h"] * 8 - c["plane"].shape[1]),
            ),
            mode="edge",
        )

    out = bytearray(b"\xff\xd8")  # SOI

    def segment(marker: int, body: bytes) -> None:
        out.extend(bytes((0xFF, marker)))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    segment(
        0xE0,  # APP0 / JFIF 1.1
        b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00",
    )
    dqt = bytes([0x00]) + bytes(ql.reshape(-1)[_ZZ].astype(np.uint8))
    if not gray:
        dqt += bytes([0x01]) + bytes(qc.reshape(-1)[_ZZ].astype(np.uint8))
    segment(0xDB, dqt)
    sof = struct.pack(">BHHB", 8, h_img, w_img, len(comps))
    for c in comps:
        sof += bytes((c["id"], (c["h"] << 4) | c["v"], c["tq"]))
    segment(0xC2 if progressive else 0xC0, sof)
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if not gray:
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    dht = b""
    for tid, (bits, vals) in tables:
        dht += bytes([tid]) + bytes(bits) + bytes(vals)
    segment(0xC4, dht)
    if restart_interval:
        segment(0xDD, struct.pack(">H", restart_interval))

    enc_dc_l = _build_encode_table(*_DC_LUMA)
    enc_ac_l = _build_encode_table(*_AC_LUMA)
    enc_dc_c = _build_encode_table(*_DC_CHROMA)
    enc_ac_c = _build_encode_table(*_AC_CHROMA)

    # FDCT + quantize every block once (zigzag order), shared by the
    # single baseline scan and the progressive scan script.
    for c in comps:
        q = ql if c["tq"] == 0 else qc
        by_n = c["plane"].shape[0] // 8
        bx_n = c["plane"].shape[1] // 8
        blocks = np.zeros((by_n, bx_n, 64), dtype=np.int64)
        for yb in range(by_n):
            for xb in range(bx_n):
                blk = c["plane"][
                    yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8
                ] - 128.0
                coef = _C @ blk @ _C.T
                blocks[yb, xb] = (
                    np.round(coef / q).astype(np.int64).reshape(-1)[_ZZ]
                )
        c["blocks"] = blocks

    def dc_tab(c):
        return enc_dc_l if c["tq"] == 0 else enc_dc_c

    def ac_tab(c):
        return enc_ac_l if c["tq"] == 0 else enc_ac_c

    if progressive:
        # Scan 1: interleaved DC (Ss=0, Se=0).
        sos = bytes([len(comps)])
        for c in comps:
            sos += bytes((c["id"], 0x00 if c["tq"] == 0 else 0x10))
        sos += bytes((0, 0, 0))
        segment(0xDA, sos)
        bw = _BitWriter()
        preds = [0] * len(comps)
        for i in range(mx * my):
            myi, mxi = divmod(i, mx)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        preds[ci] = _encode_dc(
                            bw,
                            int(
                                c["blocks"][
                                    myi * c["v"] + by, mxi * c["h"] + bx, 0
                                ]
                            ),
                            preds[ci],
                            dc_tab(c),
                        )
        bw.flush()
        out.extend(bw.buf)
        # One full AC scan per component (Ss=1, Se=63), walked over the
        # component's own non-interleaved block grid (T.81 A.2.2).
        for c in comps:
            sos = bytes(
                (1, c["id"], 0x00 if c["tq"] == 0 else 0x01)
            ) + bytes((1, 63, 0))
            segment(0xDA, sos)
            bw = _BitWriter()
            cw = -(-(w_img * c["h"]) // hmax)
            ch_ = -(-(h_img * c["v"]) // vmax)
            for yb in range(-(-ch_ // 8)):
                for xb in range(-(-cw // 8)):
                    _encode_ac(bw, c["blocks"][yb, xb], ac_tab(c))
            bw.flush()
            out.extend(bw.buf)
    else:
        sos = bytes([len(comps)])
        for c in comps:
            sos += bytes((c["id"], 0x00 if c["tq"] == 0 else 0x11))
        sos += bytes((0, 63, 0))  # Ss, Se, Ah/Al
        segment(0xDA, sos)
        bw = _BitWriter()
        preds = [0] * len(comps)
        rst = 0
        for i in range(mx * my):
            if restart_interval and i and i % restart_interval == 0:
                bw.marker(0xD0 + rst)
                rst = (rst + 1) & 7
                preds = [0] * len(comps)
            myi, mxi = divmod(i, mx)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        preds[ci] = _encode_block(
                            bw,
                            c["blocks"][
                                myi * c["v"] + by, mxi * c["h"] + bx
                            ],
                            preds[ci],
                            dc_tab(c),
                            ac_tab(c),
                        )
        bw.flush()
        out.extend(bw.buf)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
