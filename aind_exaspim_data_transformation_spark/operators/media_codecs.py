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

Scope: 8-bit/channel truecolor. The PNG decoder implements the full
filter set (None/Sub/Up/Average/Paeth, bytewise per the spec) and
multi-IDAT streams; greyscale (color type 0) is expanded to RGB.
Interlaced (Adam7), paletted, and 16-bit images raise ValueError.
The encoders exist for fixtures/tests: the PNG encoder can emit any
filter type per row, so decoder coverage does not depend on external
sample files.
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


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG into (H, W, 3) uint8. Supports color types 2 (RGB)
    and 0 (greyscale, expanded), bit depth 8, no interlace."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat = bytearray()
    ihdr = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or color not in (0, 2) or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color} "
            f"interlace={interlace}); only 8-bit grey/RGB supported"
        )
    bpp = 3 if color == 2 else 1
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, r * (stride + 1) + 1
        ).astype(np.int16)
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
    img = out.reshape(h, w, bpp)
    if bpp == 1:
        img = np.repeat(img, 3, axis=2)
    return img


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
