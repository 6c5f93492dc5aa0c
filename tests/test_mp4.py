"""ISO BMFF (MP4) box parser tests: skeleton round trips over both
header versions, 64-bit largesize boxes, size-0 terminal boxes, and
malformed-input errors."""

from __future__ import annotations

import struct

import pytest

from aind_exaspim_data_transformation_spark.operators.mp4 import (
    Mp4Error,
    encode_mp4_skeleton,
    parse_mp4,
)

TRACKS = [
    {
        "track_id": 1, "handler": "vide", "codec": "avc1",
        "width": 640, "height": 360,
        "media_timescale": 30000, "media_duration": 90090,
        "n_samples": 90,
    },
    {
        "track_id": 2, "handler": "soun", "codec": "mp4a",
        "width": 0, "height": 0,
        "media_timescale": 48000, "media_duration": 144000,
        "n_samples": 141,
    },
]


@pytest.mark.parametrize("version", [0, 1])
def test_skeleton_roundtrip(version):
    data = encode_mp4_skeleton(
        600, 1800, TRACKS, version=version, mdat_bytes=b"\x00" * 32
    )
    meta = parse_mp4(data)
    assert meta["major_brand"] == "isom"
    assert meta["timescale"] == 600
    assert meta["duration"] == 1800
    assert len(meta["tracks"]) == 2
    v, a = meta["tracks"]
    assert (v["track_id"], v["handler"], v["codec"]) == (1, "vide", "avc1")
    assert (v["width"], v["height"]) == (640, 360)
    assert (v["media_timescale"], v["media_duration"]) == (30000, 90090)
    assert v["n_samples"] == 90
    assert (a["track_id"], a["handler"], a["codec"]) == (2, "soun", "mp4a")
    assert a["n_samples"] == 141


def test_largesize_box_header():
    data = encode_mp4_skeleton(1000, 5000, TRACKS[:1])
    # rewrap the whole stream's ftyp as a size=1 largesize box
    (size,) = struct.unpack(">I", data[0:4])
    body = data[8:size]
    large = (
        struct.pack(">I", 1)
        + b"ftyp"
        + struct.pack(">Q", 16 + len(body))
        + body
    )
    meta = parse_mp4(large + data[size:])
    assert meta["major_brand"] == "isom"
    assert meta["timescale"] == 1000


def test_size_zero_terminal_box():
    data = encode_mp4_skeleton(600, 600, TRACKS[:1])
    # append a size-0 free box (extends to EOF per spec)
    free = struct.pack(">I", 0) + b"free" + b"junkjunk"
    meta = parse_mp4(data + free)
    assert meta["duration"] == 600


def test_no_moov_raises():
    ftyp_only = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
    with pytest.raises(Mp4Error, match="moov"):
        parse_mp4(ftyp_only)


def test_overrunning_box_raises():
    data = bytearray(encode_mp4_skeleton(600, 600, TRACKS[:1]))
    struct.pack_into(">I", data, 0, len(data) + 100)  # ftyp overruns EOF
    with pytest.raises(Mp4Error, match="overruns"):
        parse_mp4(bytes(data))


def test_garbage_raises():
    with pytest.raises(Mp4Error):
        parse_mp4(b"\x00\x01")


# --------------------------------------------------------------------------
# Sample-table demux (round 8): per-sample byte ranges + timestamps.
# --------------------------------------------------------------------------
from aind_exaspim_data_transformation_spark.operators.mp4 import (  # noqa: E402
    demux_samples,
    encode_mp4_media,
)


def _media_tracks(n_v=10, spc=4, n_a=5):
    return [
        {
            "track_id": 1, "handler": "vide", "codec": "avc1",
            "width": 320, "height": 240, "media_timescale": 30000,
            "sample_sizes": [100 + (i * 7) % 50 for i in range(n_v)],
            "sample_deltas": [1001] * (n_v // 2) + [2002] * (n_v - n_v // 2),
            "samples_per_chunk": spc,
            "fill": lambda i: (13 * i) % 256,
        },
        {
            "track_id": 2, "handler": "soun", "codec": "mp4a",
            "width": 0, "height": 0, "media_timescale": 48000,
            "sample_sizes": [64] * n_a,
            "sample_deltas": [1024] * n_a,
            "samples_per_chunk": n_a,
            "fill": lambda i: (101 * i) % 256,
        },
    ]


@pytest.mark.parametrize("use_co64", [False, True])
def test_demux_roundtrip_offsets_and_payloads(use_co64):
    tracks = _media_tracks()
    data = encode_mp4_media(600, tracks, use_co64=use_co64)
    rows = demux_samples(data)
    vid = [r for r in rows if r["handler"] == "vide"]
    aud = [r for r in rows if r["handler"] == "soun"]
    assert len(vid) == 10 and len(aud) == 5
    # Offsets are the closed-form prefix sum over mdat (base = ftyp 24
    # + mdat header 8), video first then audio; payload bytes at each
    # offset are the fill value — a wrong offset reads a wrong byte.
    base = 32
    for r in vid:
        assert r["offset"] == base
        assert (
            data[r["offset"] : r["offset"] + r["size"]]
            == bytes([(13 * r["sample_idx"]) % 256]) * r["size"]
        )
        base += r["size"]
    for r in aud:
        assert r["offset"] == base
        assert (
            data[r["offset"] : r["offset"] + r["size"]]
            == bytes([(101 * r["sample_idx"]) % 256]) * r["size"]
        )
        base += r["size"]
    # Multi-run stts: first 5 samples at delta 1001, rest at 2002.
    assert [r["dts"] for r in vid[:6]] == [0, 1001, 2002, 3003, 4004, 5005]
    assert vid[6]["dts"] == 5005 + 2002
    # stsc chunk walk: 4+4+2 samples over 3 chunks.
    assert [r["chunk_idx"] for r in vid] == [1] * 4 + [2] * 4 + [3] * 2
    # audio uses the FIXED-size stsz form (constant 64) in one chunk.
    assert all(r["size"] == 64 and r["chunk_idx"] == 1 for r in aud)


def test_demux_exact_chunk_multiple_single_stsc_run():
    tracks = _media_tracks(n_v=8, spc=4, n_a=1)
    data = encode_mp4_media(600, tracks)
    vid = [r for r in demux_samples(data) if r["handler"] == "vide"]
    assert [r["chunk_idx"] for r in vid] == [1] * 4 + [2] * 4


def test_demux_meta_agrees_with_parse():
    data = encode_mp4_media(600, _media_tracks())
    meta = parse_mp4(data)
    rows = demux_samples(data)
    assert meta["tracks"][0]["n_samples"] == sum(
        1 for r in rows if r["track_id"] == 1
    )
    assert {r["codec"] for r in rows} == {"avc1", "mp4a"}


def test_demux_inconsistent_tables_raise():
    tracks = _media_tracks(n_v=9, spc=4)
    data = bytearray(encode_mp4_media(600, tracks))
    # Corrupt stsz's declared count (9 -> 7): the stsc chunk walk then
    # yields more samples than stsz declares.
    idx = bytes(data).find(b"stsz")
    # fullbox(4) + sample_size(4) then count
    struct.pack_into(">I", data, idx + 4 + 4 + 4, 7)
    with pytest.raises(Mp4Error, match="stts covers|more"):
        demux_samples(bytes(data))


def test_demux_missing_stbl_raises():
    data = encode_mp4_skeleton(600, 600, TRACKS[:1])
    # skeleton has a stbl; strip nothing — instead check stco removal
    # by corrupting its tag so the table is "missing".
    data = bytearray(data)
    idx = bytes(data).find(b"stco")
    data[idx : idx + 4] = b"free"
    with pytest.raises(Mp4Error, match="stco"):
        demux_samples(bytes(data))


def test_demux_first_chunk_zero_raises():
    """ADVICE r8: stsc first_chunk=0 used to hit Python negative indexing
    (chunk_offsets[-1]) and silently emit the LAST chunk's offset."""
    data = bytearray(encode_mp4_media(600, _media_tracks()))
    idx = bytes(data).find(b"stsc")
    # body: fullbox(4) + entry_count(4), then runs of (first_chunk, spc,
    # desc) — zero the first run's first_chunk.
    struct.pack_into(">I", data, idx + 4 + 4 + 4, 0)
    with pytest.raises(Mp4Error, match="first_chunk"):
        demux_samples(bytes(data))


def test_demux_non_increasing_stsc_runs_raise():
    data = bytearray(encode_mp4_media(600, _media_tracks()))
    idx = bytes(data).find(b"stsc")
    # Video track has 3 chunks -> stsc runs start at chunks 1 and 3.
    # Rewrite the SECOND run's first_chunk to 1 (== first run's).
    struct.pack_into(">I", data, idx + 4 + 4 + 4 + 12, 1)
    with pytest.raises(Mp4Error, match="strictly increasing"):
        demux_samples(bytes(data))


@pytest.mark.parametrize(
    "tag,count_off",
    [
        (b"stts", 4 + 4),   # fullbox + entry_count
        (b"stsc", 4 + 4),
        (b"stco", 4 + 4),
    ],
)
def test_demux_oversized_table_count_raises_mp4error(tag, count_off):
    """ADVICE r8: a declared entry count past the box body must raise
    Mp4Error (not bare struct.error, not a silent read into the next
    box)."""
    data = bytearray(encode_mp4_media(600, _media_tracks()))
    idx = bytes(data).find(tag)
    struct.pack_into(">I", data, idx + count_off, 0x00FFFFFF)
    with pytest.raises(Mp4Error, match="overruns box body"):
        demux_samples(bytes(data))


def test_demux_oversized_stsz_count_raises_mp4error():
    data = bytearray(encode_mp4_media(600, _media_tracks()))
    idx = bytes(data).find(b"stsz")
    # body: fullbox(4) + sample_size(4) + sample_count(4): variable-size
    # table on the video track, so the per-sample table is read.
    struct.pack_into(">I", data, idx + 4 + 4 + 4, 0x00FFFFFF)
    with pytest.raises(Mp4Error, match="overruns box body"):
        demux_samples(bytes(data))


def test_demux_fixed_size_stsz_huge_count_raises_before_alloc():
    """ADVICE r9: the FIXED-size stsz path built [size]*n_samples with an
    untrusted 32-bit count — n_samples=0xFFFFFFFF would allocate a
    ~4-billion-element list before any cross-table check. Must raise
    Mp4Error immediately instead."""
    data = bytearray(encode_mp4_media(600, _media_tracks()))
    # Audio track (second stsz) uses the fixed-size form (constant 64).
    idx = bytes(data).find(b"stsz", bytes(data).find(b"stsz") + 4)
    struct.pack_into(">I", data, idx + 4 + 4 + 4, 0xFFFFFFFF)
    with pytest.raises(Mp4Error, match="exceeds file size"):
        demux_samples(bytes(data))


def test_demux_huge_stts_run_count_raises_before_expand():
    """ADVICE r9: one 8-byte stts run declaring cnt=0xFFFFFFFF used to
    expand 4 billion dts entries before the post-loop consistency check.
    Must raise as soon as the running total passes stsz's count."""
    data = bytearray(encode_mp4_media(600, _media_tracks()))
    idx = bytes(data).find(b"stts")
    # body: fullbox(4) + entry_count(4), then (count, delta) runs —
    # rewrite the first run's count to 0xFFFFFFFF.
    struct.pack_into(">I", data, idx + 4 + 4 + 4, 0xFFFFFFFF)
    with pytest.raises(Mp4Error, match="stts runs cover more"):
        demux_samples(bytes(data))
