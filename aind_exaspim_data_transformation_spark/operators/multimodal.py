"""Multimodal column operators: decode / feature-extract / resize /
frame-sample over opaque binary payloads (north-star surface).

The Spark-side plumbing is real — schemas, Arrow batching via
``mapInPandas``, partition behavior — and so is media decode for PNG,
BMP, JPEG, and WAV (pure-stdlib codecs in ``operators.media_codecs``
and ``operators.jpeg``). Formats that need external libraries (mp4)
raise ``NotImplementedError``; a deterministic fake codec
(``fake-rgb8``/``fake-pcm16``) additionally exercises the full path in
tests without any codec in the loop.

Data model (SURVEY §1.4 generalized): one row per media item,
``payload BinaryType`` + typed metadata columns. Feature extraction
returns fixed-width vectors so downstream similarity operators
(`queries/similarity_q.py`) apply unchanged.

At 100 TB: payloads stay columnar in parquet; Arrow moves them to Python
in batches; nothing here shuffles payload bytes — outputs are features
and thumbnails, orders of magnitude smaller than inputs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

FAKE_RGB8 = "fake-rgb8"  # header: height uint16, width uint16, then H*W*3
FAKE_PCM16 = "fake-pcm16"  # int16 little-endian mono samples


def encode_fake_rgb8(arr: np.ndarray) -> bytes:
    """Deterministic fake image codec for tests (H, W, 3 uint8)."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    return (
        int(h).to_bytes(2, "little")
        + int(w).to_bytes(2, "little")
        + arr.tobytes(order="C")
    )


def decode_media(payload: bytes, media_format: str) -> np.ndarray:
    """Decode one payload. PNG (all baseline color types/depths,
    Adam7), BMP (24-bit), JPEG (baseline + progressive DCT), and WAV
    (16-bit PCM) decode for real via the pure-stdlib codecs in
    ``operators.media_codecs`` / ``operators.jpeg``; formats needing
    external libraries (mp4 frame bitstreams) stay stubbed — container
    metadata parses via ``operators.mp4.parse_mp4``."""
    if media_format == "png":
        from .media_codecs import decode_png

        return decode_png(payload)
    if media_format == "jpeg":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if media_format == "bmp":
        from .media_codecs import decode_bmp

        return decode_bmp(payload)
    if media_format == "wav":
        from .media_codecs import decode_wav

        return decode_wav(payload)
    if media_format == FAKE_RGB8:
        h = int.from_bytes(payload[0:2], "little")
        w = int.from_bytes(payload[2:4], "little")
        return np.frombuffer(payload[4:], dtype=np.uint8).reshape(h, w, 3)
    if media_format == FAKE_PCM16:
        return np.frombuffer(payload, dtype="<i2")
    raise NotImplementedError(
        f"no decoder for {media_format!r} in this environment; "
        "install a codec and extend decode_media (for mp4, the ISO BMFF "
        "container metadata IS parseable without one — see "
        "operators.mp4.parse_mp4; only the frame bitstreams inside mdat "
        "need an external codec)"
    )


def _resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w, _ = img.shape
    zi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[zi][:, xi]


IMAGE_FEATURES_SCHEMA = (
    "item_id long, height int, width int, "
    "mean_r double, mean_g double, mean_b double, thumb binary"
)


def image_features_pdf(
    pdf: pd.DataFrame,
    id_col: str = "item_id",
    payload_col: str = "payload",
    format_col: str = "media_format",
    thumb_size: int = 8,
) -> pd.DataFrame:
    """One batch of :func:`image_features` — the kernel is exposed
    per-batch so composite queries can FUSE build -> features -> finish
    into a single ``mapInPandas`` (one JVM<->Python Arrow crossing
    instead of three; round 15, guide §4)."""
    out = []
    for row in pdf.itertuples(index=False):
        img = decode_media(
            getattr(row, payload_col), getattr(row, format_col)
        )
        means = img.reshape(-1, 3).mean(axis=0)
        thumb = _resize_nearest(img, thumb_size, thumb_size)
        out.append(
            (
                getattr(row, id_col),
                img.shape[0],
                img.shape[1],
                float(means[0]),
                float(means[1]),
                float(means[2]),
                thumb.tobytes(order="C"),
            )
        )
    return pd.DataFrame(
        out,
        columns=[
            "item_id",
            "height",
            "width",
            "mean_r",
            "mean_g",
            "mean_b",
            "thumb",
        ],
    )


def image_features(
    df: DataFrame,
    id_col: str = "item_id",
    payload_col: str = "payload",
    format_col: str = "media_format",
    thumb_size: int = 8,
) -> DataFrame:
    """Decode images, emit per-channel means + a nearest-neighbor
    thumbnail. Arrow-batched; one decode per row, no payload shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield image_features_pdf(
                pdf, id_col, payload_col, format_col, thumb_size
            )

    return df.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "item_id long, n_samples long, rms double, peak int, zero_crossings long"
)


def audio_features(
    df: DataFrame,
    id_col: str = "item_id",
    payload_col: str = "payload",
    format_col: str = "media_format",
) -> DataFrame:
    """Waveform stats over PCM payloads (rms / peak / zero crossings)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield audio_features_pdf(pdf, id_col, payload_col, format_col)

    return df.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def audio_features_pdf(
    pdf: pd.DataFrame,
    id_col: str = "item_id",
    payload_col: str = "payload",
    format_col: str = "media_format",
) -> pd.DataFrame:
    """One batch of :func:`audio_features` (fusable kernel, see
    :func:`image_features_pdf`)."""
    out = []
    for row in pdf.itertuples(index=False):
        wave = decode_media(
            getattr(row, payload_col), getattr(row, format_col)
        ).astype(np.float64)
        zc = int(np.sum(np.signbit(wave[1:]) != np.signbit(wave[:-1])))
        out.append(
            (
                getattr(row, id_col),
                len(wave),
                float(np.sqrt(np.mean(wave**2))) if len(wave) else 0.0,
                int(np.abs(wave).max()) if len(wave) else 0,
                zc,
            )
        )
    return pd.DataFrame(
        out,
        columns=[
            "item_id",
            "n_samples",
            "rms",
            "peak",
            "zero_crossings",
        ],
    )


def frame_sample(
    df: DataFrame,
    every_n: int,
    id_col: str = "item_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling for frame-sequence payloads: payload = concatenated
    fixed-size fake-rgb8 frames; emit every n-th frame as its own row
    (the video analog of the shard grid: one input row fans out to
    frame rows, map-side)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield frame_sample_pdf(pdf, every_n, id_col, payload_col)

    return df.mapInPandas(run, "item_id long, frame_idx int, frame binary")


def frame_sample_pdf(
    pdf: pd.DataFrame,
    every_n: int,
    id_col: str = "item_id",
    payload_col: str = "payload",
) -> pd.DataFrame:
    """One batch of :func:`frame_sample` (fusable kernel, see
    :func:`image_features_pdf`)."""
    out = []
    for row in pdf.itertuples(index=False):
        payload = getattr(row, payload_col)
        h = int.from_bytes(payload[0:2], "little")
        w = int.from_bytes(payload[2:4], "little")
        frame_bytes = 4 + h * w * 3
        n_frames = len(payload) // frame_bytes
        for fi in range(0, n_frames, every_n):
            out.append(
                (
                    getattr(row, id_col),
                    fi,
                    payload[fi * frame_bytes : (fi + 1) * frame_bytes],
                )
            )
    return pd.DataFrame(out, columns=["item_id", "frame_idx", "frame"])
