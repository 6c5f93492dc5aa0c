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
