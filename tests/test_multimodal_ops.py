"""Multimodal operator plumbing over fake codecs (real schemas/batching;
decode stubbed per the environment's codec availability)."""

import numpy as np
import pytest

from aind_exaspim_data_transformation_spark.operators.multimodal import (
    FAKE_PCM16,
    FAKE_RGB8,
    audio_features,
    decode_media,
    encode_fake_rgb8,
    frame_sample,
    image_features,
)


def _image_rows(n=4, h=16, w=12, seed=42):
    rng = np.random.default_rng(seed)
    rows, arrays = [], {}
    for i in range(n):
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        arrays[i] = arr
        rows.append((i, bytearray(encode_fake_rgb8(arr)), FAKE_RGB8))
    return rows, arrays


def test_decode_unknown_format_raises():
    with pytest.raises(NotImplementedError, match="no decoder"):
        decode_media(b"\x00", "mp4")


def test_image_features(spark):
    rows, arrays = _image_rows()
    df = spark.createDataFrame(
        rows, "item_id long, payload binary, media_format string"
    )
    feats = {r.item_id: r for r in image_features(df).collect()}
    assert len(feats) == 4
    for i, arr in arrays.items():
        r = feats[i]
        assert (r.height, r.width) == (16, 12)
        assert r.mean_r == pytest.approx(arr[..., 0].mean())
        thumb = np.frombuffer(r.thumb, dtype=np.uint8).reshape(8, 8, 3)
        assert thumb[0, 0, 0] == arr[0, 0, 0]  # nearest-neighbor corner


def test_audio_features(spark):
    wave = (np.sin(np.linspace(0, 20 * np.pi, 1000)) * 10000).astype("<i2")
    df = spark.createDataFrame(
        [(1, bytearray(wave.tobytes()), FAKE_PCM16)],
        "item_id long, payload binary, media_format string",
    )
    r = audio_features(df).collect()[0]
    assert r.n_samples == 1000
    assert r.peak <= 10000
    assert 15 <= r.zero_crossings <= 25  # ~10 periods -> ~20 crossings
    assert r.rms == pytest.approx(
        float(np.sqrt((wave.astype(np.float64) ** 2).mean()))
    )


def test_frame_sample(spark):
    rng = np.random.default_rng(7)
    frames = [
        rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
        for _ in range(10)
    ]
    payload = b"".join(encode_fake_rgb8(f) for f in frames)
    df = spark.createDataFrame(
        [(5, bytearray(payload))], "item_id long, payload binary"
    )
    sampled = frame_sample(df, every_n=3).collect()
    assert [r.frame_idx for r in sorted(sampled, key=lambda r: r.frame_idx)] == [
        0, 3, 6, 9,
    ]
    f3 = [r for r in sampled if r.frame_idx == 3][0]
    np.testing.assert_array_equal(
        decode_media(bytes(f3.frame), FAKE_RGB8), frames[3]
    )
