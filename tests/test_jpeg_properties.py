"""Property-based JPEG/MP4 invariants (hypothesis): the flat-even-block
exactness the oracle queries rely on holds for ARBITRARY block values
and grid shapes, progressive and baseline decodes agree bit-for-bit on
ARBITRARY content, and the MP4 skeleton round-trips arbitrary track
parameters."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from aind_exaspim_data_transformation_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from aind_exaspim_data_transformation_spark.operators.mp4 import (
    encode_mp4_skeleton,
    parse_mp4,
)


@settings(max_examples=25, deadline=None)
@given(
    by=st.integers(1, 3),
    bx=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
    mode=st.sampled_from(["444", "422", "420", "gray"]),
    progressive=st.booleans(),
)
def test_flat_even_blocks_always_exact(by, bx, seed, mode, progressive):
    rng = np.random.default_rng(seed)
    vals = (2 * rng.integers(0, 128, (by, bx))).astype(np.uint8)
    plane = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    expected = np.stack([plane] * 3, axis=2)
    if mode == "gray":
        data = encode_jpeg(plane, quality=50, progressive=progressive)
    else:
        data = encode_jpeg(
            expected, quality=50, subsampling=mode, progressive=progressive
        )
    assert np.array_equal(decode_jpeg(data), expected)


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    sub=st.sampled_from(["444", "422", "420"]),
    quality=st.integers(5, 98),
)
def test_progressive_equals_baseline_on_any_content(h, w, seed, sub,
                                                    quality):
    # The progressive scan script reorders the SAME quantized
    # coefficients, so for ANY image/size/quality the two files must
    # decode bit-identically.
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=sub))
    prog = decode_jpeg(
        encode_jpeg(
            img, quality=quality, subsampling=sub, progressive=True
        )
    )
    assert np.array_equal(base, prog)


@settings(max_examples=25, deadline=None)
@given(
    timescale=st.integers(1, 2**31 - 1),
    duration=st.integers(0, 2**31 - 1),
    version=st.sampled_from([0, 1]),
    n_samples=st.integers(0, 2**31 - 1),
    width=st.integers(0, 2**15 - 1),
    height=st.integers(0, 2**15 - 1),
    codec=st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
        min_size=4,
        max_size=4,
    ),
)
def test_mp4_skeleton_roundtrips_any_params(
    timescale, duration, version, n_samples, width, height, codec
):
    tracks = [
        {
            "track_id": 1, "handler": "vide", "codec": codec,
            "width": width, "height": height,
            "media_timescale": timescale, "media_duration": duration,
            "n_samples": n_samples,
        }
    ]
    meta = parse_mp4(
        encode_mp4_skeleton(timescale, duration, tracks, version=version)
    )
    assert meta["timescale"] == timescale
    assert meta["duration"] == duration
    t = meta["tracks"][0]
    assert (t["width"], t["height"]) == (width, height)
    assert t["codec"] == codec
    assert t["n_samples"] == n_samples
    assert t["media_timescale"] == timescale
    assert t["media_duration"] == duration
