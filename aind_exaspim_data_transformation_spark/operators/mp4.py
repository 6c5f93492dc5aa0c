"""ISO BMFF (MP4) box-structure codec: metadata parse + skeleton writer.

The MP4 container layout is a public spec (ISO/IEC 14496-12, the
QuickTime-derived "box"/"atom" structure): length-prefixed nested boxes,
full-box version/flags, fixed layouts for the movie/track/media headers
and the sample tables. Parsing the container needs nothing beyond
``struct`` — what requires external codec libraries is decoding the
video/audio *bitstreams inside* ``mdat`` (H.264/AAC/etc.), which stays
an honest ``NotImplementedError`` in ``operators.multimodal``.

This module makes the video modality's metadata path real, the same way
PNG/BMP/WAV/JPEG made image/audio decode real:

- ``parse_mp4``: walk the box tree and extract the movie header
  (timescale, duration), per-track headers (track id, handler type,
  width/height, media timescale/duration), and sample-table summary
  (sample-entry fourcc, sample count) — the fields a 100 TB video
  pipeline filters and routes on before ever touching frame bytes.
- ``encode_mp4_skeleton``: build a deterministic, structurally valid
  minimal MP4 (ftyp + moov with full header/track/sample-table chain +
  mdat) so parser coverage does not depend on external sample files,
  mirroring the encoder-for-fixtures pattern of the other codecs.
- ``demux_samples`` (round 8): expand the sample tables — stts decode
  deltas, stsc chunk runs, stsz fixed/variable sizes, stco/co64 chunk
  offsets — into per-sample ``(track, sample_idx, chunk_idx, offset,
  size, dts)`` rows, i.e. the byte ranges a demuxer hands to a frame
  decoder. This is the step that splits an mp4 into per-frame payload
  rows; only the frame *bitstream* decode past it stays stubbed.
- ``encode_mp4_media``: like the skeleton writer but with real sample
  payloads laid out in ``mdat`` (multi-chunk stsc runs, variable or
  constant stsz, stco or co64). ``mdat`` precedes ``moov`` so every
  chunk offset is a closed-form function of the sample sizes alone —
  which is what lets the DuckDB oracle recompute offsets exactly.

The oracle-gated query ``q_multimodal_mp4_meta`` encodes a skeleton per
document from closed-form parameters, parses it back, and DuckDB
recomputes the same fields from the formulas — a bug in either the box
writer or the parser breaks the cross-engine hash. Map-only; payloads
never shuffle.
"""

from __future__ import annotations

import struct


class Mp4Error(ValueError):
    """Malformed or unsupported ISO BMFF input."""


def _fourcc(tag: bytes) -> str:
    return tag.decode("latin-1")


def _walk(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise Mp4Error("truncated largesize box header")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing container
            size = end - pos
        if size < body - pos or pos + size > end:
            raise Mp4Error(f"box '{_fourcc(tag)}' overruns its container")
        yield _fourcc(tag), body, pos + size
        pos += size
    if pos != end:
        raise Mp4Error("trailing bytes that do not form a box")


def _find(data: bytes, start: int, end: int, tag: str):
    for t, b, e in _walk(data, start, end):
        if t == tag:
            return b, e
    return None


def _fullbox(data: bytes, body: int):
    version = data[body]
    flags = int.from_bytes(data[body + 1 : body + 4], "big")
    return version, flags, body + 4


def _parse_mvhd(data: bytes, body: int, end: int) -> dict:
    v, _flags, p = _fullbox(data, body)
    if v == 1:
        _c, _m, timescale, duration = struct.unpack(
            ">QQIQ", data[p : p + 28]
        )
    elif v == 0:
        _c, _m, timescale, duration = struct.unpack(
            ">IIII", data[p : p + 16]
        )
    else:
        raise Mp4Error(f"mvhd version {v}")
    return {"timescale": timescale, "duration": duration}


def _parse_tkhd(data: bytes, body: int, end: int) -> dict:
    v, _flags, p = _fullbox(data, body)
    if v == 1:
        track_id = struct.unpack(">I", data[p + 16 : p + 20])[0]
        p2 = p + 32  # through duration
    elif v == 0:
        track_id = struct.unpack(">I", data[p + 8 : p + 12])[0]
        p2 = p + 20
    else:
        raise Mp4Error(f"tkhd version {v}")
    # reserved(8) layer(2) altgroup(2) volume(2) reserved(2) matrix(36)
    q = p2 + 8 + 2 + 2 + 2 + 2 + 36
    w_fp, h_fp = struct.unpack(">II", data[q : q + 8])
    return {"track_id": track_id, "width": w_fp >> 16, "height": h_fp >> 16}


def _parse_mdhd(data: bytes, body: int, end: int) -> dict:
    v, _flags, p = _fullbox(data, body)
    if v == 1:
        _c, _m, timescale, duration = struct.unpack(
            ">QQIQ", data[p : p + 28]
        )
    elif v == 0:
        _c, _m, timescale, duration = struct.unpack(
            ">IIII", data[p : p + 16]
        )
    else:
        raise Mp4Error(f"mdhd version {v}")
    return {"media_timescale": timescale, "media_duration": duration}


def parse_mp4(data: bytes) -> dict:
    """Parse the box structure of an MP4/ISO-BMFF byte string into
    movie + per-track metadata. Raises Mp4Error on malformed input or
    if no moov box is present."""
    if len(data) < 8:
        raise Mp4Error("too short to be an MP4")
    out: dict = {"major_brand": None, "tracks": []}
    moov = None
    for tag, b, e in _walk(data, 0, len(data)):
        if tag == "ftyp":
            out["major_brand"] = _fourcc(data[b : b + 4])
        elif tag == "moov":
            moov = (b, e)
    if moov is None:
        raise Mp4Error("no moov box")
    mb, me = moov
    mvhd = _find(data, mb, me, "mvhd")
    if mvhd is None:
        raise Mp4Error("moov missing mvhd")
    out.update(_parse_mvhd(data, *mvhd))
    for tag, b, e in _walk(data, mb, me):
        if tag != "trak":
            continue
        track: dict = {}
        tkhd = _find(data, b, e, "tkhd")
        if tkhd is None:
            raise Mp4Error("trak missing tkhd")
        track.update(_parse_tkhd(data, *tkhd))
        mdia = _find(data, b, e, "mdia")
        if mdia is None:
            raise Mp4Error("trak missing mdia")
        db, de = mdia
        mdhd = _find(data, db, de, "mdhd")
        if mdhd is None:
            raise Mp4Error("mdia missing mdhd")
        track.update(_parse_mdhd(data, *mdhd))
        hdlr = _find(data, db, de, "hdlr")
        if hdlr is None:
            raise Mp4Error("mdia missing hdlr")
        hb, _he = hdlr
        track["handler"] = _fourcc(data[hb + 8 : hb + 12])
        minf = _find(data, db, de, "minf")
        track["codec"] = None
        track["n_samples"] = 0
        if minf is not None:
            fb, fe = minf
            stbl = _find(data, fb, fe, "stbl")
            if stbl is not None:
                sb, se = stbl
                stsd = _find(data, sb, se, "stsd")
                if stsd is not None:
                    _v, _f, p = _fullbox(data, stsd[0])
                    (entry_count,) = struct.unpack(">I", data[p : p + 4])
                    if entry_count:
                        track["codec"] = _fourcc(data[p + 8 : p + 12])
                stsz = _find(data, sb, se, "stsz")
                if stsz is not None:
                    _v, _f, p = _fullbox(data, stsz[0])
                    _fixed, count = struct.unpack(">II", data[p : p + 8])
                    track["n_samples"] = count
        out["tracks"].append(track)
    return out


# --------------------------------------------------------------------------
# Sample-table demux: per-sample byte ranges + decode timestamps.
# --------------------------------------------------------------------------
def _table_u32(data: bytes, p: int, n: int) -> list[int]:
    return list(struct.unpack(f">{n}I", data[p : p + 4 * n]))


def _need(p: int, nbytes: int, end: int, what: str) -> None:
    """Declared entry counts are untrusted: bound every table read by its
    box's body end so an oversized count raises Mp4Error (the parser's
    error contract) instead of bare struct.error or a silent read into
    adjacent boxes."""
    if p + nbytes > end:
        raise Mp4Error(
            f"{what}: declared table overruns box body"
            f" (needs {p + nbytes}, body ends at {end})"
        )


def demux_samples(data: bytes) -> list[dict]:
    """Expand every track's sample tables into per-sample rows.

    Returns a flat list of dicts ``{"track_id", "handler", "codec",
    "sample_idx" (1-based), "chunk_idx" (1-based), "offset" (absolute
    file offset), "size", "dts" (media-timescale units from stts)}``,
    in (track, sample) order. This is the ISO/IEC 14496-12 §8.7
    chunk-walk: stsc maps chunks to sample counts, stco/co64 gives each
    chunk's file offset, samples within a chunk are contiguous in
    stsz order, and stts runs accumulate into decode timestamps.
    Raises Mp4Error when the tables disagree (sample counts, chunk
    counts) or a required table is missing.
    """
    meta_rows: list[dict] = []
    moov = _find(data, 0, len(data), "moov")
    if moov is None:
        raise Mp4Error("no moov box")
    for tag, b, e in _walk(data, *moov):
        if tag != "trak":
            continue
        tkhd = _find(data, b, e, "tkhd")
        if tkhd is None:
            raise Mp4Error("trak missing tkhd")
        track_id = _parse_tkhd(data, *tkhd)["track_id"]
        mdia = _find(data, b, e, "mdia")
        if mdia is None:
            raise Mp4Error("trak missing mdia")
        hdlr = _find(data, *mdia, "hdlr")
        handler = (
            _fourcc(data[hdlr[0] + 8 : hdlr[0] + 12]) if hdlr else None
        )
        minf = _find(data, *mdia, "minf")
        stbl = _find(data, *minf, "stbl") if minf else None
        if stbl is None:
            raise Mp4Error(f"track {track_id} has no sample table")
        sb, se = stbl

        codec = None
        stsd = _find(data, sb, se, "stsd")
        if stsd is not None:
            _v, _f, p = _fullbox(data, stsd[0])
            (entry_count,) = struct.unpack(">I", data[p : p + 4])
            if entry_count:
                codec = _fourcc(data[p + 8 : p + 12])

        stsz = _find(data, sb, se, "stsz")
        if stsz is None:
            raise Mp4Error(f"track {track_id} missing stsz")
        _v, _f, p = _fullbox(data, stsz[0])
        _need(p, 8, stsz[1], f"track {track_id} stsz header")
        fixed_size, n_samples = struct.unpack(">II", data[p : p + 8])
        if fixed_size:
            # n_samples is untrusted 32-bit: the variable-size path is
            # bounded by _need (4*n_samples must fit the box body) but
            # this path allocates [fixed_size]*n_samples directly — cap
            # it at len(data): every sample occupies at least one mdat
            # byte, so a plausible table can't declare more samples than
            # the file holds.
            if n_samples > len(data):
                raise Mp4Error(
                    f"track {track_id} stsz: declared {n_samples} samples"
                    f" exceeds file size {len(data)}"
                )
            sizes = [fixed_size] * n_samples
        else:
            _need(p + 8, 4 * n_samples, stsz[1], f"track {track_id} stsz")
            sizes = _table_u32(data, p + 8, n_samples)

        stts = _find(data, sb, se, "stts")
        if stts is None:
            raise Mp4Error(f"track {track_id} missing stts")
        _v, _f, p = _fullbox(data, stts[0])
        _need(p, 4, stts[1], f"track {track_id} stts header")
        (n_runs,) = struct.unpack(">I", data[p : p + 4])
        _need(p + 4, 8 * n_runs, stts[1], f"track {track_id} stts")
        dts: list[int] = []
        t = 0
        for r in range(n_runs):
            cnt, delta = struct.unpack(
                ">II", data[p + 4 + 8 * r : p + 12 + 8 * r]
            )
            # Per-run counts are untrusted too: one 8-byte run declaring
            # cnt=0xFFFFFFFF would expand 4 billion entries before the
            # post-loop consistency check — fail as soon as the running
            # total passes stsz's sample count instead.
            if len(dts) + cnt > n_samples:
                raise Mp4Error(
                    f"track {track_id}: stts runs cover more than the"
                    f" {n_samples} samples stsz declares"
                )
            for _ in range(cnt):
                dts.append(t)
                t += delta
        if len(dts) != n_samples:
            raise Mp4Error(
                f"track {track_id}: stts covers {len(dts)} samples,"
                f" stsz declares {n_samples}"
            )

        co = _find(data, sb, se, "stco")
        if co is not None:
            _v, _f, p = _fullbox(data, co[0])
            _need(p, 4, co[1], f"track {track_id} stco header")
            (n_chunks,) = struct.unpack(">I", data[p : p + 4])
            _need(p + 4, 4 * n_chunks, co[1], f"track {track_id} stco")
            chunk_offsets = _table_u32(data, p + 4, n_chunks)
        else:
            co = _find(data, sb, se, "co64")
            if co is None:
                raise Mp4Error(f"track {track_id} missing stco/co64")
            _v, _f, p = _fullbox(data, co[0])
            _need(p, 4, co[1], f"track {track_id} co64 header")
            (n_chunks,) = struct.unpack(">I", data[p : p + 4])
            _need(p + 4, 8 * n_chunks, co[1], f"track {track_id} co64")
            chunk_offsets = list(
                struct.unpack(f">{n_chunks}Q", data[p + 4 : p + 4 + 8 * n_chunks])
            )

        stsc = _find(data, sb, se, "stsc")
        if stsc is None:
            raise Mp4Error(f"track {track_id} missing stsc")
        _v, _f, p = _fullbox(data, stsc[0])
        _need(p, 4, stsc[1], f"track {track_id} stsc header")
        (n_entries,) = struct.unpack(">I", data[p : p + 4])
        _need(p + 4, 12 * n_entries, stsc[1], f"track {track_id} stsc")
        runs = [
            struct.unpack(">III", data[p + 4 + 12 * r : p + 16 + 12 * r])
            for r in range(n_entries)
        ]
        # first_chunk values are 1-based and must be strictly increasing:
        # first_chunk=0 would hit Python negative indexing on
        # chunk_offsets[c - 1] and silently reuse the LAST chunk's offset.
        prev_first = 0
        for first_chunk, _spc, _desc in runs:
            if first_chunk < 1:
                raise Mp4Error(
                    f"track {track_id}: stsc first_chunk"
                    f" {first_chunk} < 1"
                )
            if first_chunk <= prev_first:
                raise Mp4Error(
                    f"track {track_id}: stsc first_chunk values not"
                    f" strictly increasing ({prev_first} ->"
                    f" {first_chunk})"
                )
            prev_first = first_chunk

        # Walk chunks in order; each stsc run applies from its
        # first_chunk until the next run's first_chunk (exclusive).
        si = 0
        for ri, (first_chunk, spc, _desc) in enumerate(runs):
            last_chunk = (
                runs[ri + 1][0] - 1 if ri + 1 < len(runs) else n_chunks
            )
            for c in range(first_chunk, last_chunk + 1):
                if c > n_chunks:
                    raise Mp4Error(
                        f"track {track_id}: stsc chunk {c} beyond"
                        f" stco's {n_chunks}"
                    )
                off = chunk_offsets[c - 1]
                for _ in range(spc):
                    if si >= n_samples:
                        raise Mp4Error(
                            f"track {track_id}: stsc yields more"
                            f" samples than stsz's {n_samples}"
                        )
                    meta_rows.append(
                        {
                            "track_id": track_id,
                            "handler": handler,
                            "codec": codec,
                            "sample_idx": si + 1,
                            "chunk_idx": c,
                            "offset": off,
                            "size": sizes[si],
                            "dts": dts[si],
                        }
                    )
                    off += sizes[si]
                    si += 1
        if si != n_samples:
            raise Mp4Error(
                f"track {track_id}: chunk walk covered {si} of"
                f" {n_samples} samples"
            )
    return meta_rows


# --------------------------------------------------------------------------
# Skeleton writer (fixtures/tests)
# --------------------------------------------------------------------------
def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + tag + body


def _full(tag: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(tag, bytes([version]) + flags.to_bytes(3, "big") + body)


_UNITY_MATRIX = struct.pack(
    ">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
)


def encode_mp4_skeleton(
    timescale: int,
    duration: int,
    tracks: list[dict],
    version: int = 0,
    mdat_bytes: bytes = b"",
) -> bytes:
    """Build a structurally valid minimal MP4. Each track dict:
    ``{"track_id", "handler" ('vide'|'soun'), "codec" (fourcc str),
    "width", "height", "media_timescale", "media_duration",
    "n_samples"}``. ``version`` 0/1 selects 32/64-bit header times
    (both parse paths). Sample tables are the degenerate-but-valid
    forms: one chunk, constant sample size."""
    if version == 1:
        mvhd_body = struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        mvhd_body = struct.pack(">IIII", 0, 0, timescale, duration)
    mvhd_body += struct.pack(">i", 0x10000)  # rate 1.0
    mvhd_body += struct.pack(">h", 0x0100)  # volume 1.0
    mvhd_body += b"\x00" * 10  # reserved
    mvhd_body += _UNITY_MATRIX
    mvhd_body += b"\x00" * 24  # pre_defined
    mvhd_body += struct.pack(">I", max(t["track_id"] for t in tracks) + 1)
    moov = _full(b"mvhd", version, 0, mvhd_body)

    for t in tracks:
        if version == 1:
            tkhd_body = struct.pack(
                ">QQIIQ", 0, 0, t["track_id"], 0, duration
            )
        else:
            tkhd_body = struct.pack(
                ">IIIII", 0, 0, t["track_id"], 0, duration
            )
        tkhd_body += b"\x00" * 8  # reserved
        tkhd_body += struct.pack(">hhhh", 0, 0, 0, 0)  # layer/group/vol/res
        tkhd_body += _UNITY_MATRIX
        tkhd_body += struct.pack(
            ">II", t["width"] << 16, t["height"] << 16
        )
        tkhd = _full(b"tkhd", version, 7, tkhd_body)

        if version == 1:
            mdhd_body = struct.pack(
                ">QQIQ", 0, 0, t["media_timescale"], t["media_duration"]
            )
        else:
            mdhd_body = struct.pack(
                ">IIII", 0, 0, t["media_timescale"], t["media_duration"]
            )
        mdhd_body += struct.pack(">HH", 0x55C4, 0)  # language 'und', predef
        mdhd = _full(b"mdhd", version, 0, mdhd_body)

        hdlr = _full(
            b"hdlr",
            0,
            0,
            b"\x00" * 4
            + t["handler"].encode("latin-1")
            + b"\x00" * 12
            + b"engine\x00",
        )

        # degenerate-but-valid sample tables: codec entry with an empty
        # 78/28-byte sample description is overkill here — the parser
        # reads only the fourcc, so an 8-byte entry header suffices.
        entry = _box(t["codec"].encode("latin-1"), b"")
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
        stts = _full(
            b"stts", 0, 0, struct.pack(">III", 1, t["n_samples"], 1)
        )
        stsc = _full(
            b"stsc", 0, 0, struct.pack(">IIII", 1, 1, t["n_samples"], 1)
        )
        stsz = _full(
            b"stsz", 0, 0, struct.pack(">III", 1, t["n_samples"], 0)
        )
        stco = _full(b"stco", 0, 0, struct.pack(">II", 1, 0))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        minf = _box(b"minf", vmhd + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        moov += _box(b"trak", tkhd + mdia)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    out = ftyp + _box(b"moov", moov)
    if mdat_bytes:
        out += _box(b"mdat", mdat_bytes)
    return out


# --------------------------------------------------------------------------
# Media writer: real per-sample payloads, multi-chunk sample tables.
# --------------------------------------------------------------------------
_FTYP = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")


def _rle(values: list[int]) -> list[tuple[int, int]]:
    runs: list[tuple[int, int]] = []
    for v in values:
        if runs and runs[-1][1] == v:
            runs[-1] = (runs[-1][0] + 1, v)
        else:
            runs.append((1, v))
    return runs


def encode_mp4_media(
    timescale: int,
    tracks: list[dict],
    use_co64: bool = False,
) -> bytes:
    """Build an MP4 whose ``mdat`` holds real sample payloads.

    Each track dict: ``{"track_id", "handler" ('vide'|'soun'),
    "codec" (fourcc), "width", "height", "media_timescale",
    "sample_sizes": [int, ...], "sample_deltas": [int, ...],
    "samples_per_chunk": int, "fill": callable(sample_idx_1based) ->
    byte value}``. Samples are laid out per track, per chunk, in
    order; sample *i* is ``sizes[i-1]`` copies of ``fill(i)``.

    Layout is ``ftyp + mdat + moov`` — offsets never depend on the
    (variable) moov size, so chunk offsets are a closed-form prefix
    sum of the sample sizes: the property the cross-engine demux
    oracle recomputes. stsz auto-selects its fixed-size form when all
    sizes agree (both parse paths stay covered); ``use_co64`` selects
    64-bit chunk offsets.
    """
    base = len(_FTYP) + 8  # mdat header
    mdat = bytearray()
    per_track_chunks: list[list[int]] = []
    for t in tracks:
        sizes = t["sample_sizes"]
        spc = t["samples_per_chunk"]
        offsets: list[int] = []
        for i, size in enumerate(sizes):
            if i % spc == 0:
                offsets.append(base + len(mdat))
            mdat += bytes([t["fill"](i + 1) & 0xFF]) * size
        per_track_chunks.append(offsets)

    moov_children = b""
    movie_duration = 0
    for t, chunk_offsets in zip(tracks, per_track_chunks):
        sizes = t["sample_sizes"]
        deltas = t["sample_deltas"]
        if len(sizes) != len(deltas):
            raise Mp4Error("sample_sizes and sample_deltas disagree")
        spc = t["samples_per_chunk"]
        n = len(sizes)
        media_duration = sum(deltas)
        movie_duration = max(
            movie_duration,
            media_duration * timescale // t["media_timescale"],
        )

        tkhd_body = (
            struct.pack(">IIIII", 0, 0, t["track_id"], 0, 0)
            + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0, 0)
            + _UNITY_MATRIX
            + struct.pack(">II", t["width"] << 16, t["height"] << 16)
        )
        tkhd = _full(b"tkhd", 0, 7, tkhd_body)
        mdhd = _full(
            b"mdhd",
            0,
            0,
            struct.pack(
                ">IIII", 0, 0, t["media_timescale"], media_duration
            )
            + struct.pack(">HH", 0x55C4, 0),
        )
        hdlr = _full(
            b"hdlr",
            0,
            0,
            b"\x00" * 4
            + t["handler"].encode("latin-1")
            + b"\x00" * 12
            + b"engine\x00",
        )

        entry = _box(t["codec"].encode("latin-1"), b"")
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
        runs = _rle(deltas)
        stts = _full(
            b"stts",
            0,
            0,
            struct.pack(">I", len(runs))
            + b"".join(struct.pack(">II", c, d) for c, d in runs),
        )
        # stsc runs: uniform spc, plus a short final chunk when n % spc
        # leaves a remainder (and more than one chunk exists).
        rem = n % spc
        if n <= spc:
            sc_runs = [(1, n or 0, 1)]
        elif rem:
            sc_runs = [(1, spc, 1), (len(chunk_offsets), rem, 1)]
        else:
            sc_runs = [(1, spc, 1)]
        stsc = _full(
            b"stsc",
            0,
            0,
            struct.pack(">I", len(sc_runs))
            + b"".join(struct.pack(">III", *r) for r in sc_runs),
        )
        if sizes and len(set(sizes)) == 1:
            stsz = _full(
                b"stsz", 0, 0, struct.pack(">II", sizes[0], n)
            )
        else:
            stsz = _full(
                b"stsz",
                0,
                0,
                struct.pack(">II", 0, n)
                + struct.pack(f">{n}I", *sizes),
            )
        if use_co64:
            co = _full(
                b"co64",
                0,
                0,
                struct.pack(">I", len(chunk_offsets))
                + struct.pack(
                    f">{len(chunk_offsets)}Q", *chunk_offsets
                ),
            )
        else:
            co = _full(
                b"stco",
                0,
                0,
                struct.pack(">I", len(chunk_offsets))
                + struct.pack(
                    f">{len(chunk_offsets)}I", *chunk_offsets
                ),
            )
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + co)
        if t["handler"] == "soun":
            mhd = _full(b"smhd", 0, 0, struct.pack(">hH", 0, 0))
        else:
            mhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        minf = _box(b"minf", mhd + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        moov_children += _box(b"trak", tkhd + mdia)

    mvhd_body = (
        struct.pack(">IIII", 0, 0, timescale, movie_duration)
        + struct.pack(">i", 0x10000)
        + struct.pack(">h", 0x0100)
        + b"\x00" * 10
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", max(t["track_id"] for t in tracks) + 1)
    )
    moov = _full(b"mvhd", 0, 0, mvhd_body) + moov_children
    return _FTYP + _box(b"mdat", bytes(mdat)) + _box(b"moov", moov)
