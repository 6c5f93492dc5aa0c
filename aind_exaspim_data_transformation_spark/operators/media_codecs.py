"""Pure-stdlib media codecs: PNG (RGB8), BMP (24-bit BI_RGB), and WAV
(RIFF 16-bit PCM).

All three formats are public specs (PNG: RFC 2083 / ISO 15948; BMP: the
Windows BITMAPINFOHEADER layout; WAV: the RIFF multimedia format,
summarized in RFC 2361) and decode with nothing beyond
``zlib``/``struct``/numpy, which makes real media decode possible in
this container (no PIL/imageio/soundfile). They back
``operators.multimodal.decode_media`` for the ``png``/``bmp``/``wav``
formats: the north-star multimodal surface's decode step is real, not a
stub, for both the image and audio modalities.

Scope: the PNG decoder implements the full filter set
(None/Sub/Up/Average/Paeth, bytewise per the spec), multi-IDAT
streams, and — since round 7 — every baseline color-type/bit-depth
combination: greyscale 1/2/4/8/16 (scaled to 8-bit), truecolor 8/16,
paletted 1/2/4/8 (PLTE), grey+alpha / RGBA (alpha dropped), and Adam7
interlacing. Output is always (H, W, 3) uint8 RGB. The encoders exist
for fixtures/tests: the PNG encoder can emit any filter type per row,
so decoder coverage does not depend on external sample files.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(tag + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)


def encode_png(
    arr: np.ndarray,
    filter_cycle: int = 5,
    fixed_filter: int | None = None,
) -> bytes:
    """Encode (H, W, 3) uint8 as PNG. ``filter_cycle`` > 1 cycles the
    row filter through types 0..filter_cycle-1 so every decoder filter
    path is exercised; 1 means filter 0 (None) everywhere;
    ``fixed_filter`` pins one type for every row."""
    h, w, c = arr.shape
    if c != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_png expects (H, W, 3) uint8")
    bpp = 3
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for r in range(h):
        line = arr[r].reshape(-1)
        if fixed_filter is not None:
            ft = fixed_filter
        else:
            ft = r % filter_cycle if filter_cycle > 1 else 0
        if ft == 0:
            filt = line
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.uint8), line[:-bpp]])
            filt = (line.astype(np.int16) - left) % 256
        elif ft == 2:  # Up
            filt = (line.astype(np.int16) - prev) % 256
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.uint8), line[:-bpp]])
            avg = (left.astype(np.int16) + prev.astype(np.int16)) // 2
            filt = (line.astype(np.int16) - avg) % 256
        else:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.uint8), line[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
            filt = (
                line.astype(np.int16)
                - _paeth(
                    left.astype(np.int16),
                    prev.astype(np.int16),
                    ul.astype(np.int16),
                )
            ) % 256
        raw.append(ft)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (PNG spec 6.6)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where(pc < np.minimum(pa, pb), c, np.where(pb < pa, b, a))
    return np.where((pa <= pb) & (pa <= pc), a, out)


# PNG color types (spec 11.2.2): type -> raw channel count.
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}
# Adam7 interlace passes (spec 8.2): (xstart, ystart, xstep, ystep).
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, off: int, h: int, stride: int, bpp: int):
    """Reverse the per-scanline filters over one (sub-)image of ``h``
    rows of ``stride`` bytes starting at ``off``; ``bpp`` is the filter
    delta in BYTES (max(1, channels*depth//8), spec 9.2). Returns the
    (h, stride) recovered bytes and the new offset."""
    need = h * (stride + 1)
    if off + need > len(raw):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for r in range(h):
        base = off + r * (stride + 1)
        ft = raw[base]
        line = np.frombuffer(raw, np.uint8, stride, base + 1).astype(
            np.int16
        )
        if ft == 0:
            rec = line
        elif ft == 2:  # Up
            rec = (line + prev) % 256
        elif ft in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            rec = np.zeros(stride, dtype=np.int16)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                up = prev[i]
                ul = prev[i - bpp] if i >= bpp else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - ul
                    pa = abs(p - left)
                    pb = abs(p - up)
                    pc = abs(p - ul)
                    if pa <= pb and pa <= pc:
                        pred = left
                    elif pb <= pc:
                        pred = up
                    else:
                        pred = ul
                rec[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[r] = rec.astype(np.uint8)
        prev = rec
    return out, off + need


def _png_samples(rows: np.ndarray, npix: int, ch: int, depth: int):
    """Split unfiltered scanline bytes into per-pixel raw sample values:
    (h, npix, ch) uint16 (16-bit kept whole; sub-byte depths unpacked
    MSB-first per spec 7.2)."""
    h = rows.shape[0]
    if depth == 8:
        return (
            rows[:, : npix * ch]
            .reshape(h, npix, ch)
            .astype(np.uint16)
        )
    if depth == 16:
        v = rows[:, : npix * ch * 2].reshape(h, npix * ch, 2).astype(
            np.uint16
        )
        return ((v[:, :, 0] << 8) | v[:, :, 1]).reshape(h, npix, ch)
    bits = np.unpackbits(rows, axis=1)
    per = bits[:, : npix * ch * depth].reshape(h, npix * ch, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    return (per * weights).sum(axis=2, dtype=np.uint16).reshape(
        h, npix, ch
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG into (H, W, 3) uint8 RGB. Supports every baseline
    color type / bit depth / interlace combination the spec defines:
    greyscale (depths 1/2/4/8/16, scaled to 8-bit), truecolor (8/16 —
    16-bit takes the high byte), paletted (depths 1/2/4/8 via PLTE),
    grey+alpha and RGBA (alpha dropped), and Adam7 interlacing."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat = bytearray()
    ihdr = None
    plte = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"PLTE":
            plte = bytes(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if (
        comp != 0
        or filt != 0
        or color not in _PNG_CHANNELS
        or depth not in _PNG_DEPTHS[color]
        or interlace not in (0, 1)
    ):
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color} "
            f"interlace={interlace} comp={comp} filter={filt})"
        )
    ch = _PNG_CHANNELS[color]
    bpp = max(1, ch * depth // 8)
    raw = zlib.decompress(bytes(idat))

    def sub_image(pw: int, ph: int, off: int):
        stride = (pw * ch * depth + 7) // 8
        rows, off = _png_unfilter(raw, off, ph, stride, bpp)
        return _png_samples(rows, pw, ch, depth), off

    if interlace == 0:
        img, off = sub_image(w, h, 0)
    else:
        img = np.zeros((h, w, ch), dtype=np.uint16)
        off = 0
        for xs, ys, xp, yp in _ADAM7:
            pw = (w - xs + xp - 1) // xp
            ph = (h - ys + yp - 1) // yp
            if pw <= 0 or ph <= 0:
                continue
            sub, off = sub_image(pw, ph, off)
            img[ys::yp, xs::xp] = sub
    if off != len(raw):
        raise ValueError("PNG data length mismatch")

    if color == 3:
        if plte is None:
            raise ValueError("paletted PNG missing PLTE")
        pal = np.frombuffer(plte, np.uint8)
        if len(pal) % 3:
            raise ValueError("PLTE length not a multiple of 3")
        pal = pal.reshape(-1, 3)
        idx = img[:, :, 0].astype(np.int64)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("palette index out of range")
        return pal[idx]
    if depth == 16:
        v8 = (img >> 8).astype(np.uint8)
    elif depth == 8:
        v8 = img.astype(np.uint8)
    else:  # 1/2/4-bit grey: scale to full 8-bit range (255/max exact)
        v8 = (img * (255 // ((1 << depth) - 1))).astype(np.uint8)
    if color == 0:
        return np.repeat(v8, 3, axis=2)
    if color == 4:  # grey + alpha: drop alpha
        return np.repeat(v8[:, :, :1], 3, axis=2)
    if color == 6:  # RGBA: drop alpha
        return v8[:, :, :3]
    return v8  # color type 2 (RGB)


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 RGB as a bottom-up 24-bit BI_RGB BMP."""
    h, w, c = arr.shape
    if c != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        body.extend(arr[r, :, ::-1].tobytes())  # RGB -> BGR
        body.extend(b"\x00" * pad)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    file_header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40
    )
    return file_header + info + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into (H, W, 3) uint8 RGB.
    Handles bottom-up (positive height) and top-down (negative) rows
    and the 4-byte row padding."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP (bad magic)")
    (offset,) = struct.unpack("<I", payload[10:14])
    header_size, w, h = struct.unpack("<Iii", payload[14:26])
    planes, bitcount = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if header_size < 40 or bitcount != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP (header={header_size} bits={bitcount} "
            f"compression={compression}); only 24-bit BI_RGB supported"
        )
    top_down = h < 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for i in range(h):
        row = np.frombuffer(
            payload, np.uint8, row_bytes, offset + i * stride
        ).reshape(w, 3)
        r = i if top_down else h - 1 - i
        out[r] = row[:, ::-1]  # BGR -> RGB
    return out


# ---------------------------------------------------------------------------
# WAV (RIFF + 16-bit PCM) — the audio analog of the PNG/BMP codecs above.
# RIFF is a public spec (Microsoft/IBM 1991 multimedia file format;
# summarized in RFC 2361): little-endian chunks, each word-aligned with a
# pad byte after odd-sized bodies. Scope: format code 1 (integer PCM),
# 16 bits/sample, any channel count / sample rate; other format codes and
# bit depths raise ValueError.
# ---------------------------------------------------------------------------


def encode_wav(arr: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 samples — (n,) mono or (n, channels) — as a WAV
    (RIFF) file with a standard 16-byte PCM fmt chunk."""
    if arr.dtype != np.int16 or arr.ndim not in (1, 2):
        raise ValueError("encode_wav expects (n,) or (n, ch) int16")
    ch = 1 if arr.ndim == 1 else arr.shape[1]
    data = np.ascontiguousarray(arr.astype("<i2")).tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _wav_chunks(payload: bytes):
    """Walk RIFF sub-chunks: yields (tag, start, size) honoring the
    word-alignment pad after odd-sized chunks."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE magic)")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    end = min(8 + riff_size, len(payload))
    pos = 12
    while pos + 8 <= end:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        yield tag, pos + 8, size
        pos += 8 + size + (size % 2)


def decode_wav(payload: bytes) -> np.ndarray:
    """Decode a 16-bit PCM WAV into int16 samples: (n,) for mono,
    (n_frames, channels) otherwise. Unknown chunks (LIST, fact, cue…)
    are skipped per the RIFF walking rules; a data chunk before fmt,
    a non-PCM format code, or a non-16 bit depth raise ValueError."""
    fmt = None
    for tag, start, size in _wav_chunks(payload):
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("WAV fmt chunk shorter than 16 bytes")
            fmt = struct.unpack("<HHIIHH", payload[start : start + 16])
        elif tag == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt chunk")
            code, ch, _rate, _bps, _align, bits = fmt
            if code != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (format code {code}, {bits}-bit); "
                    "only 16-bit integer PCM supported"
                )
            n = min(size, len(payload) - start) // 2
            samples = np.frombuffer(payload, "<i2", n, start)
            if ch > 1:
                samples = samples[: (n // ch) * ch].reshape(-1, ch)
            return samples.astype(np.int16, copy=False)
    raise ValueError("WAV has no data chunk")


def wav_info(payload: bytes) -> dict:
    """fmt-chunk metadata (channels / sample_rate / bits) without
    touching sample data — the cheap metadata-probe path."""
    for tag, start, size in _wav_chunks(payload):
        if tag == b"fmt " and size >= 16:
            code, ch, rate, _bps, _align, bits = struct.unpack(
                "<HHIIHH", payload[start : start + 16]
            )
            return {
                "format_code": code,
                "channels": ch,
                "sample_rate": rate,
                "bits": bits,
            }
    raise ValueError("WAV has no fmt chunk")
