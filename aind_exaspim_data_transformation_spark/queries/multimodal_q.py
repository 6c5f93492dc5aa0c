"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Mirrors the engine's tensor-block model (SURVEY §1.4): payloads are
``BinaryType`` columns, metadata travels in plain columns, and heavy decode
work happens in Arrow-batched UDFs (see ``operators/multimodal.py``). The
oracle-checked queries exercise the relational side: binary construction,
byte lengths, digests, and fixed-size chunk grids (the same ceil-div grid
math the Zarr writer uses).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ._helpers import fan_out_small_scan
from .registry import query


def _doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id-only scan for the payload-builder queries, fanned out:
    each row triggers real codec work inside mapInPandas, so the tiny
    scan must not cap parallelism at the file's row-group count (3 at
    sf1) — the textbook fan_out_small_scan case; a no-op at real scale
    where scans split naturally."""
    return fan_out_small_scan(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )

CHUNK = 64  # bytes per chunk in the chunk-grid query
IMG_H, IMG_W = 8, 10  # decode-stats image size (W=10 -> BMP row padding)


# --------------------------------------------------------------------------
# Binary payload metadata: sizes + digests of utf-8 encoded payloads.
# --------------------------------------------------------------------------
@query(
    "q_multimodal_binary_meta",
    oracle="""
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  md5(text) AS digest,
  substr(text, 1, 16) AS head_preview
FROM documents
""",
)
def q_multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("digest"),
        F.substring("text", 1, 16).alias("head_preview"),
    )


# --------------------------------------------------------------------------
# Chunk grid over payloads: ceil-div enumeration with truncated tail —
# the 1-D analog of the Zarr shard grid (SURVEY §2A E1).
# --------------------------------------------------------------------------
@query(
    "q_multimodal_chunk_grid",
    oracle=f"""
WITH g AS (
  SELECT doc_id, text, length(text) AS n,
    unnest(range(0, CAST(ceil(length(text) / {CHUNK}.0) AS BIGINT)))
      AS chunk_idx
  FROM documents)
SELECT doc_id, chunk_idx,
  CAST(least({CHUNK}, n - chunk_idx * {CHUNK}) AS BIGINT) AS chunk_len,
  md5(substr(text, CAST(chunk_idx * {CHUNK} + 1 AS INT), {CHUNK}))
    AS chunk_digest
FROM g
""",
)
def q_multimodal_chunk_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    # Guard the empty payload: for n=0, sequence(0, -1) DESCENDS as
    # [0, -1] and would emit two bogus chunk rows while the oracle's
    # range(0, 0) emits none.
    idxs = F.when(
        n > 0,
        F.sequence(
            F.lit(0).cast("long"),
            F.ceil(n / F.lit(float(CHUNK))).cast("long") - 1,
        ),
    ).otherwise(F.array().cast("array<long>"))
    grid = docs.select(
        "doc_id",
        n.alias("n"),
        F.explode(idxs).alias("chunk_idx"),
        F.col("text"),
    )
    return grid.select(
        "doc_id",
        "chunk_idx",
        F.least(F.lit(CHUNK), F.col("n") - F.col("chunk_idx") * CHUNK)
        .cast("long")
        .alias("chunk_len"),
        F.md5(
            F.expr(f"substr(text, CAST(chunk_idx * {CHUNK} + 1 AS INT), {CHUNK})")
        ).alias("chunk_digest"),
    )


# --------------------------------------------------------------------------
# Modality metadata table: struct columns + per-modality stats. The binary
# column stays opaque; stats come from typed metadata (the 100 TB pattern:
# never shuffle payload bytes to compute metadata aggregates).
# --------------------------------------------------------------------------
@query(
    "q_multimodal_modality_stats",
    oracle="""
SELECT
  CASE WHEN doc_id % 3 = 0 THEN 'image'
       WHEN doc_id % 3 = 1 THEN 'audio'
       ELSE 'text' END AS modality,
  COUNT(*) AS n_items,
  CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
  MIN(length(text)) AS min_bytes,
  MAX(length(text)) AS max_bytes
FROM documents
GROUP BY 1
""",
)
def q_multimodal_modality_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("text")
    )
    return (
        docs.select(modality.alias("modality"), F.length("text").alias("nb"))
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("nb").cast("long").alias("total_bytes"),
            F.min("nb").alias("min_bytes"),
            F.max("nb").alias("max_bytes"),
        )
    )


# --------------------------------------------------------------------------
# REAL image decode in the loop: each doc gets a deterministic 8x10 RGB
# image (pixel values are a pure function of doc_id and position),
# encoded to a real on-disk format — PNG for even doc_ids (cycling all
# five row filters), BMP for odd (exercising row padding) — then DECODED
# back via operators.media_codecs and aggregated. The DuckDB oracle
# computes the identical stats straight from the pixel formula, so a
# codec bug anywhere in encode OR decode breaks the cross-engine hash.
# At 100 TB this is the map-only decode/feature shape: payload bytes
# never shuffle; only fixed-width stats leave the partition.
# --------------------------------------------------------------------------
_DECODE_ORACLE = f"""
WITH px AS (
  SELECT doc_id,
    CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS media_format,
    (doc_id * 7 + r * 3 + c * 5) % 256 AS vr,
    (doc_id * 11 + r * 2 + c * 9 + 1) % 256 AS vg,
    (doc_id * 13 + r * 4 + c * 7 + 2) % 256 AS vb
  FROM documents, range(0, {IMG_H}) t1(r), range(0, {IMG_W}) t2(c))
SELECT doc_id, media_format,
  {IMG_H} AS height, {IMG_W} AS width,
  CAST(SUM(vr) AS BIGINT) AS sum_r,
  CAST(SUM(vg) AS BIGINT) AS sum_g,
  CAST(SUM(vb) AS BIGINT) AS sum_b,
  CAST(SUM(vr) AS DOUBLE) / {IMG_H * IMG_W} AS mean_r
FROM px GROUP BY doc_id, media_format
"""


@query("q_multimodal_image_decode_stats", oracle=_DECODE_ORACLE)
def q_multimodal_image_decode_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.media_codecs import (
        decode_bmp,
        decode_png,
        encode_bmp,
        encode_png,
    )

    docs = _doc_ids(spark, sf_dir)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rr = np.arange(IMG_H, dtype=np.int64)[:, None]
        cc = np.arange(IMG_W, dtype=np.int64)[None, :]
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                img = np.stack(
                    [
                        (d * 7 + rr * 3 + cc * 5) % 256,
                        (d * 11 + rr * 2 + cc * 9 + 1) % 256,
                        (d * 13 + rr * 4 + cc * 7 + 2) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                if d % 2 == 0:
                    decoded = decode_png(encode_png(img, filter_cycle=5))
                    fmt = "png"
                else:
                    decoded = decode_bmp(encode_bmp(img))
                    fmt = "bmp"
                sums = decoded.reshape(-1, 3).sum(
                    axis=0, dtype=np.int64
                )
                out.append(
                    (
                        d,
                        fmt,
                        decoded.shape[0],
                        decoded.shape[1],
                        int(sums[0]),
                        int(sums[1]),
                        int(sums[2]),
                        float(sums[0]) / (IMG_H * IMG_W),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "media_format",
                    "height",
                    "width",
                    "sum_r",
                    "sum_g",
                    "sum_b",
                    "mean_r",
                ],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, media_format string, height int, width int, "
        "sum_r long, sum_g long, sum_b long, mean_r double",
    )


# --------------------------------------------------------------------------
# REAL audio decode in the loop: each doc gets a deterministic int16
# waveform (a pure function of doc_id / sample index / channel), encoded
# to real WAV (RIFF 16-bit PCM) bytes — mono with an interposed LIST
# chunk for even doc_ids (exercising the chunk-walk + odd-size pad
# rules), interleaved stereo for odd — then DECODED back via
# operators.media_codecs.decode_wav and aggregated. The DuckDB oracle
# recomputes the identical stats straight from the sample formula, so a
# codec bug anywhere in encode OR decode breaks the cross-engine hash.
# Same 100 TB shape as the image twin: map-only, payloads never shuffle.
# --------------------------------------------------------------------------
WAV_BASE_N = 50  # samples per doc = WAV_BASE_N + doc_id % WAV_N_MOD
WAV_N_MOD = 23

_AUDIO_ORACLE = f"""
WITH params AS (
  SELECT doc_id, {WAV_BASE_N} + doc_id % {WAV_N_MOD} AS n,
    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS nch
  FROM documents),
s AS (
  SELECT p.doc_id, c.ch, t.i,
    ((p.doc_id * 31 + t.i * 17 + c.ch * 137) % 4001) - 2000 AS v
  FROM params p, range(0, {WAV_BASE_N + WAV_N_MOD}) t(i), range(0, 2) c(ch)
  WHERE t.i < p.n AND c.ch < p.nch),
zc AS (
  SELECT a.doc_id, COUNT(*) AS zcount
  FROM s a JOIN s b ON a.doc_id = b.doc_id AND a.ch = b.ch
    AND b.i = a.i + 1
  WHERE (a.v < 0) != (b.v < 0)
  GROUP BY a.doc_id)
SELECT p.doc_id,
  CASE WHEN p.nch = 1 THEN 'wav_mono' ELSE 'wav_stereo' END
    AS media_format,
  CAST(p.n * p.nch AS BIGINT) AS n_values,
  CAST(SUM(s.v) AS BIGINT) AS sum_v,
  CAST(SUM(ABS(s.v)) AS BIGINT) AS sum_abs,
  CAST(MAX(ABS(s.v)) AS INT) AS peak,
  CAST(COALESCE(MAX(z.zcount), 0) AS BIGINT) AS zero_cross
FROM params p
JOIN s ON s.doc_id = p.doc_id
LEFT JOIN zc z ON z.doc_id = p.doc_id
GROUP BY p.doc_id, p.nch, p.n
"""


@query("q_multimodal_audio_decode_stats", oracle=_AUDIO_ORACLE)
def q_multimodal_audio_decode_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import struct

    from ..operators.media_codecs import encode_wav
    from ..operators.multimodal import decode_media

    docs = _doc_ids(spark, sf_dir)

    def with_list_chunk(wav: bytes) -> bytes:
        # Splice an odd-sized LIST chunk between fmt and data (RIFF
        # requires the pad byte after it) and fix up the RIFF size.
        extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        out = wav[:36] + extra + wav[36:]
        return out[:4] + struct.pack("<I", len(out) - 8) + out[8:]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = WAV_BASE_N + d % WAV_N_MOD
                nch = 1 if d % 2 == 0 else 2
                ii = np.arange(n, dtype=np.int64)[:, None]
                cc = np.arange(nch, dtype=np.int64)[None, :]
                wave = (
                    ((d * 31 + ii * 17 + cc * 137) % 4001) - 2000
                ).astype(np.int16)
                if nch == 1:
                    payload = with_list_chunk(encode_wav(wave[:, 0]))
                    fmt = "wav_mono"
                else:
                    payload = encode_wav(wave)
                    fmt = "wav_stereo"
                dec = decode_media(payload, "wav")
                dec2 = dec.reshape(-1, nch)
                a = dec2.astype(np.int64)
                zc = int(
                    np.sum(
                        np.signbit(dec2[1:]) != np.signbit(dec2[:-1])
                    )
                )
                out.append(
                    (
                        d,
                        fmt,
                        int(a.size),
                        int(a.sum()),
                        int(np.abs(a).sum()),
                        int(np.abs(a).max()),
                        zc,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "media_format",
                    "n_values",
                    "sum_v",
                    "sum_abs",
                    "peak",
                    "zero_cross",
                ],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, media_format string, n_values long, sum_v long, "
        "sum_abs long, peak int, zero_cross long",
    )


# --------------------------------------------------------------------------
# REAL JPEG decode in the loop: each doc gets a deterministic 16x16
# image of flat 8x8 blocks whose gray value is EVEN — the one image
# family baseline JPEG reproduces EXACTLY (DC-only blocks; the
# quality-50 luma DC quant step 16 divides 8*(v-128); the orthonormal
# float IDCT of a DC-only block is an exact flat plane; gray pixels map
# to Y=v, Cb=Cr=128 exactly through the BT.601 transform). The payload
# is a real baseline JFIF bytestream from operators.jpeg.encode_jpeg —
# 4:4:4 color / 4:2:0 color / single-component grayscale by doc_id % 3,
# with restart markers on doc_id % 5 == 0 — decoded back through
# decode_media("jpeg") and aggregated. The DuckDB oracle recomputes the
# stats straight from the block-value formula, so a bug anywhere in the
# marker writer/parser, Huffman coder, DC prediction, zigzag, quant,
# IDCT, subsampling, or color transform breaks the cross-engine hash.
# (AC-coefficient and lossy paths are covered by tests/test_jpeg.py
# against JDK ImageIO, where exactness is not required.)
# Same 100 TB shape as the PNG/WAV twins: map-only, payloads never
# shuffle, only fixed-width stats leave the partition.
# --------------------------------------------------------------------------
JPEG_BLOCKS = 2  # image is (8*JPEG_BLOCKS)^2, one flat value per block

_JPEG_ORACLE = f"""
WITH b AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN 'jpeg_444'
         WHEN doc_id % 3 = 1 THEN 'jpeg_420'
         ELSE 'jpeg_gray' END AS media_format,
    2 * ((doc_id * 7 + bi.i * 13 + bj.i * 29) % 128) AS v
  FROM documents, range(0, {JPEG_BLOCKS}) bi(i), range(0, {JPEG_BLOCKS}) bj(i))
SELECT doc_id, media_format,
  {8 * JPEG_BLOCKS} AS height, {8 * JPEG_BLOCKS} AS width,
  CAST(SUM(v) * 64 AS BIGINT) AS sum_v,
  CAST(SUM(v) * 64 AS DOUBLE) / {(8 * JPEG_BLOCKS) ** 2} AS mean_v
FROM b GROUP BY doc_id, media_format
"""


@query("q_multimodal_jpeg_decode_stats", oracle=_JPEG_ORACLE)
def q_multimodal_jpeg_decode_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.jpeg import encode_jpeg
    from ..operators.multimodal import decode_media

    docs = _doc_ids(spark, sf_dir)
    nb = JPEG_BLOCKS
    side = 8 * nb

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bi = np.arange(nb, dtype=np.int64)[:, None]
        bj = np.arange(nb, dtype=np.int64)[None, :]
        ones = np.ones((8, 8), dtype=np.int64)
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                vals = 2 * ((d * 7 + bi * 13 + bj * 29) % 128)
                plane = np.kron(vals, ones).astype(np.uint8)
                ri = 2 if d % 5 == 0 else 0
                if d % 3 == 0:
                    rgb = np.stack([plane] * 3, axis=2)
                    payload = encode_jpeg(
                        rgb, quality=50, subsampling="444",
                        restart_interval=ri,
                    )
                    fmt = "jpeg_444"
                elif d % 3 == 1:
                    rgb = np.stack([plane] * 3, axis=2)
                    payload = encode_jpeg(
                        rgb, quality=50, subsampling="420",
                        restart_interval=ri,
                    )
                    fmt = "jpeg_420"
                else:
                    payload = encode_jpeg(
                        plane, quality=50, restart_interval=ri
                    )
                    fmt = "jpeg_gray"
                dec = decode_media(payload, "jpeg")
                s = int(dec[:, :, 0].astype(np.int64).sum())
                out.append(
                    (d, fmt, dec.shape[0], dec.shape[1], s,
                     float(s) / (side * side))
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "media_format", "height", "width",
                    "sum_v", "mean_v",
                ],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, media_format string, height int, width int, "
        "sum_v long, mean_v double",
    )


# --------------------------------------------------------------------------
# REAL MP4 container parse in the loop: each doc gets a deterministic,
# structurally valid ISO BMFF skeleton (ftyp + moov movie/track/media
# headers + sample tables; header version 0 or 1 by doc_id % 7; video
# track always, audio track when doc_id % 3 != 0) built from closed-form
# parameters by operators.mp4.encode_mp4_skeleton, then PARSED back via
# parse_mp4 and flattened. The DuckDB oracle recomputes every field from
# the same formulas, so a bug in either the box writer or the box parser
# (sizes, full-box versions, fixed-point width/height, sample-table
# walk) breaks the cross-engine hash. Frame/bitstream decode inside mdat
# is exactly what stays a gated stub in decode_media — this query gates
# the container-metadata path a video pipeline filters on first.
# Map-only, payloads never shuffle.
# --------------------------------------------------------------------------
_MP4_ORACLE = """
SELECT doc_id,
  'isom' AS major_brand,
  CAST(600 * (10 + doc_id % 50) AS DOUBLE) / 600 AS duration_s,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 2 END AS INT) AS n_tracks,
  CASE WHEN doc_id % 2 = 0 THEN 'avc1' ELSE 'hev1' END AS video_codec,
  CAST(320 + 16 * (doc_id % 8) AS INT) AS video_w,
  CAST(240 + 16 * (doc_id % 4) AS INT) AS video_h,
  CAST(24 + doc_id % 100 AS BIGINT) AS video_samples,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 0
       ELSE 100 + doc_id % 37 END AS BIGINT) AS audio_samples
FROM documents
"""


@query("q_multimodal_mp4_meta", oracle=_MP4_ORACLE)
def q_multimodal_mp4_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mp4 import encode_mp4_skeleton, parse_mp4

    docs = _doc_ids(spark, sf_dir)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n_vid = 24 + d % 100
                tracks = [
                    {
                        "track_id": 1,
                        "handler": "vide",
                        "codec": "avc1" if d % 2 == 0 else "hev1",
                        "width": 320 + 16 * (d % 8),
                        "height": 240 + 16 * (d % 4),
                        "media_timescale": 30000,
                        "media_duration": n_vid * 1001,
                        "n_samples": n_vid,
                    }
                ]
                if d % 3 != 0:
                    tracks.append(
                        {
                            "track_id": 2,
                            "handler": "soun",
                            "codec": "mp4a",
                            "width": 0,
                            "height": 0,
                            "media_timescale": 48000,
                            "media_duration": (100 + d % 37) * 1024,
                            "n_samples": 100 + d % 37,
                        }
                    )
                payload = encode_mp4_skeleton(
                    600,
                    600 * (10 + d % 50),
                    tracks,
                    version=1 if d % 7 == 0 else 0,
                    mdat_bytes=b"\x00" * 16,
                )
                meta = parse_mp4(payload)
                vid = meta["tracks"][0]
                aud = (
                    meta["tracks"][1]["n_samples"]
                    if len(meta["tracks"]) > 1
                    else 0
                )
                out.append(
                    (
                        d,
                        meta["major_brand"],
                        float(meta["duration"]) / meta["timescale"],
                        len(meta["tracks"]),
                        vid["codec"],
                        vid["width"],
                        vid["height"],
                        vid["n_samples"],
                        aud,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "major_brand", "duration_s", "n_tracks",
                    "video_codec", "video_w", "video_h", "video_samples",
                    "audio_samples",
                ],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, major_brand string, duration_s double, "
        "n_tracks int, video_codec string, video_w int, video_h int, "
        "video_samples long, audio_samples long",
    )


# --------------------------------------------------------------------------
# MP4 sample-table DEMUX (round 8): each doc gets an mp4 with REAL
# per-sample payloads laid out in mdat (operators.mp4.encode_mp4_media:
# multi-chunk stsc runs, variable-size stsz for video / fixed-size for
# audio, stco or co64 by doc_id % 7), then demux_samples expands
# stts/stsc/stsz/stco into per-sample (track, sample_idx, chunk_idx,
# offset, size, dts) rows — the byte ranges a frame decoder consumes —
# and the query reads each sample's actual bytes back from its offset
# (payload_sum). The DuckDB oracle recomputes every offset closed-form
# as a prefix sum of the fixture's size formula, so a bug anywhere in
# the chunk walk (run expansion, offset accumulation, fixed-vs-table
# stsz, 32-vs-64-bit chunk offsets, stts deltas) breaks the hash; a
# wrong offset also breaks payload_sum against the fill formula. This
# closes the container->frame-rows gap (r7 verdict, What's missing #1);
# only the frame *bitstream* decode (H.264/AAC) past this point stays
# a documented stub. Map-only, payloads never shuffle.
# --------------------------------------------------------------------------
_MP4_DEMUX_ORACLE = """
WITH vix AS (
  SELECT doc_id,
    unnest(generate_series(1, 5 + doc_id % 12)) AS sample_idx
  FROM documents),
v AS (
  SELECT doc_id, sample_idx,
    CAST(100 + ((doc_id + (sample_idx - 1) * 7) % 50) AS BIGINT)
      AS size,
    2 + doc_id % 3 AS spc
  FROM vix),
voff AS (
  SELECT doc_id, 1 AS track_id, 'vide' AS handler, sample_idx,
    1 + (sample_idx - 1) // spc AS chunk_idx,
    32 + COALESCE(SUM(size) OVER (PARTITION BY doc_id
      ORDER BY sample_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS offset,
    size,
    (sample_idx - 1) * (1000 + doc_id % 5) AS dts,
    size * ((doc_id + 13 * sample_idx) % 256) AS payload_sum
  FROM v),
vtot AS (SELECT doc_id, SUM(size) AS vbytes FROM v GROUP BY doc_id),
aix AS (
  SELECT doc_id,
    unnest(generate_series(1, 3 + doc_id % 5)) AS sample_idx
  FROM documents WHERE doc_id % 3 <> 0),
a AS (
  SELECT doc_id, sample_idx,
    CAST(64 + doc_id % 32 AS BIGINT) AS size
  FROM aix),
aoff AS (
  SELECT a.doc_id, 2 AS track_id, 'soun' AS handler, a.sample_idx,
    1 AS chunk_idx,
    32 + vtot.vbytes + (a.sample_idx - 1) * a.size AS offset,
    a.size,
    (a.sample_idx - 1) * 1024 AS dts,
    a.size * ((a.doc_id + 101 * a.sample_idx) % 256) AS payload_sum
  FROM a JOIN vtot ON a.doc_id = vtot.doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(track_id AS BIGINT) AS track_id, handler,
  CAST(sample_idx AS BIGINT) AS sample_idx,
  CAST(chunk_idx AS BIGINT) AS chunk_idx,
  CAST("offset" AS BIGINT) AS "offset",
  CAST(size AS BIGINT) AS size,
  CAST(dts AS BIGINT) AS dts,
  CAST(payload_sum AS BIGINT) AS payload_sum
FROM (SELECT * FROM voff UNION ALL SELECT * FROM aoff)
"""


@query("q_multimodal_mp4_demux", oracle=_MP4_DEMUX_ORACLE)
def q_multimodal_mp4_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mp4 import demux_samples, encode_mp4_media

    docs = _doc_ids(spark, sf_dir)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n_v = 5 + d % 12
                tracks = [
                    {
                        "track_id": 1,
                        "handler": "vide",
                        "codec": "avc1" if d % 2 == 0 else "hev1",
                        "width": 320 + 16 * (d % 8),
                        "height": 240 + 16 * (d % 4),
                        "media_timescale": 30000,
                        "sample_sizes": [
                            100 + ((d + i * 7) % 50) for i in range(n_v)
                        ],
                        "sample_deltas": [1000 + d % 5] * n_v,
                        "samples_per_chunk": 2 + d % 3,
                        "fill": lambda i, d=d: (d + 13 * i) % 256,
                    }
                ]
                if d % 3 != 0:
                    n_a = 3 + d % 5
                    tracks.append(
                        {
                            "track_id": 2,
                            "handler": "soun",
                            "codec": "mp4a",
                            "width": 0,
                            "height": 0,
                            "media_timescale": 48000,
                            "sample_sizes": [64 + d % 32] * n_a,
                            "sample_deltas": [1024] * n_a,
                            "samples_per_chunk": n_a,
                            "fill": lambda i, d=d: (d + 101 * i) % 256,
                        }
                    )
                data = encode_mp4_media(
                    600, tracks, use_co64=(d % 7 == 0)
                )
                arr = np.frombuffer(data, np.uint8)
                for r in demux_samples(data):
                    psum = int(
                        arr[r["offset"] : r["offset"] + r["size"]].sum(
                            dtype=np.int64
                        )
                    )
                    out.append(
                        (
                            d,
                            r["track_id"],
                            r["handler"],
                            r["sample_idx"],
                            r["chunk_idx"],
                            r["offset"],
                            r["size"],
                            r["dts"],
                            psum,
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "track_id", "handler", "sample_idx",
                    "chunk_idx", "offset", "size", "dts", "payload_sum",
                ],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, track_id long, handler string, sample_idx long, "
        "chunk_idx long, offset long, size long, dts long, "
        "payload_sum long",
    )


# --------------------------------------------------------------------------
# Progressive-JPEG decode in the loop: same closed-form flat-block
# construction as q_multimodal_jpeg_decode_stats, but encoded as
# PROGRESSIVE (SOF2) JFIF — one interleaved DC scan plus one AC scan
# per component — which drives the decoder's multi-scan coefficient
# accumulation, EOB-run handling, and non-interleaved block-grid walk
# instead of the baseline single-scan path. Flat even-valued blocks
# remain exact under the progressive script (the same coefficients
# arrive split across scans), so the DuckDB oracle recomputes the stats
# from the identical block-value formula. (The successive-approximation
# refinement path, which this spectral-selection script does not emit,
# is pinned against JDK-ImageIO-written full-IJG-script files in
# tests/test_jpeg.py.) Map-only; payloads never shuffle.
# --------------------------------------------------------------------------
_JPEG_PROG_ORACLE = f"""
WITH b AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN 'jpeg_prog_444'
         WHEN doc_id % 3 = 1 THEN 'jpeg_prog_420'
         ELSE 'jpeg_prog_gray' END AS media_format,
    2 * ((doc_id * 11 + bi.i * 17 + bj.i * 23) % 128) AS v
  FROM documents, range(0, {JPEG_BLOCKS}) bi(i), range(0, {JPEG_BLOCKS}) bj(i))
SELECT doc_id, media_format,
  {8 * JPEG_BLOCKS} AS height, {8 * JPEG_BLOCKS} AS width,
  CAST(SUM(v) * 64 AS BIGINT) AS sum_v,
  CAST(SUM(v) * 64 AS DOUBLE) / {(8 * JPEG_BLOCKS) ** 2} AS mean_v
FROM b GROUP BY doc_id, media_format
"""


@query("q_multimodal_jpeg_progressive_stats", oracle=_JPEG_PROG_ORACLE)
def q_multimodal_jpeg_progressive_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.jpeg import encode_jpeg
    from ..operators.multimodal import decode_media

    docs = _doc_ids(spark, sf_dir)
    nb = JPEG_BLOCKS
    side = 8 * nb

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bi = np.arange(nb, dtype=np.int64)[:, None]
        bj = np.arange(nb, dtype=np.int64)[None, :]
        ones = np.ones((8, 8), dtype=np.int64)
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                vals = 2 * ((d * 11 + bi * 17 + bj * 23) % 128)
                plane = np.kron(vals, ones).astype(np.uint8)
                if d % 3 == 0:
                    payload = encode_jpeg(
                        np.stack([plane] * 3, axis=2), quality=50,
                        subsampling="444", progressive=True,
                    )
                    fmt = "jpeg_prog_444"
                elif d % 3 == 1:
                    payload = encode_jpeg(
                        np.stack([plane] * 3, axis=2), quality=50,
                        subsampling="420", progressive=True,
                    )
                    fmt = "jpeg_prog_420"
                else:
                    payload = encode_jpeg(
                        plane, quality=50, progressive=True
                    )
                    fmt = "jpeg_prog_gray"
                dec = decode_media(payload, "jpeg")
                s = int(dec[:, :, 0].astype(np.int64).sum())
                out.append(
                    (d, fmt, dec.shape[0], dec.shape[1], s,
                     float(s) / (side * side))
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "media_format", "height", "width",
                    "sum_v", "mean_v",
                ],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, media_format string, height int, width int, "
        "sum_v long, mean_v double",
    )


# --------------------------------------------------------------------------
# Frame sampling under the oracle gate: each doc gets a deterministic
# multi-frame video payload (3 + doc_id % 5 concatenated fake-rgb8
# frames whose pixel bytes are a pure function of doc/frame/byte
# index); operators.multimodal.frame_sample fans each payload out to
# every 2nd frame row (the map-side video analog of the shard grid),
# and per-frame pixel sums are aggregated. The DuckDB oracle recomputes
# frame membership and pixel sums from the same formulas, so the
# sampling stride, frame-boundary math (4-byte header + H*W*3), and the
# fan-out row shape are all hash-gated. Map-only; payloads never
# shuffle — one input row fans out to frame rows inside the partition.
# --------------------------------------------------------------------------
FRAME_H, FRAME_W = 4, 5
_FRAME_PIX = FRAME_H * FRAME_W * 3

_FRAME_ORACLE = f"""
WITH f AS (
  SELECT doc_id, unnest(range(0, 3 + doc_id % 5)) AS frame_idx
  FROM documents),
s AS (
  SELECT doc_id, frame_idx,
    SUM((doc_id * 5 + frame_idx * 11 + t.i * 3) % 256) AS pix_sum
  FROM f, range(0, {_FRAME_PIX}) t(i)
  GROUP BY doc_id, frame_idx)
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
  CAST(pix_sum AS BIGINT) AS pix_sum
FROM s WHERE frame_idx % 2 = 0
"""


@query("q_multimodal_frame_sample", oracle=_FRAME_ORACLE)
def q_multimodal_frame_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # Round-15 fuse (guide §4): build -> frame_sample -> stats ran as
    # THREE chained mapInPandas nodes — every row crossed the
    # JVM<->Python Arrow boundary three times, and the crossings (not
    # the Python loops — measured in r14) dominated the query. The
    # three stages are row-local, so they compose per batch inside ONE
    # mapInPandas; the sampling math still runs through the real
    # operator kernel (operators.multimodal.frame_sample_pdf — the same
    # function frame_sample() wraps), so the oracle still gates the
    # operator's stride/boundary arithmetic.
    from ..operators.multimodal import frame_sample_pdf

    docs = _doc_ids(spark, sf_dir)

    def fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hdr = int(FRAME_H).to_bytes(2, "little") + int(
            FRAME_W
        ).to_bytes(2, "little")
        i_arr = np.arange(_FRAME_PIX, dtype=np.int64)
        for pdf in batches:
            built = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payload = b"".join(
                    hdr
                    + ((d * 5 + fi * 11 + i_arr * 3) % 256)
                    .astype(np.uint8)
                    .tobytes()
                    for fi in range(3 + d % 5)
                )
                built.append((d, payload))
            frames = frame_sample_pdf(
                pd.DataFrame(built, columns=["item_id", "payload"]),
                every_n=2,
            )
            out = []
            for row in frames.itertuples(index=False):
                pix = np.frombuffer(row.frame[4:], dtype=np.uint8)
                out.append(
                    (row.item_id, row.frame_idx, int(pix.sum()))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "pix_sum"]
            )

    return docs.mapInPandas(
        fused, "doc_id long, frame_idx int, pix_sum long"
    )


# --------------------------------------------------------------------------
# image_features under the oracle gate: deterministic 12x10 fake-rgb8
# payloads run through the REAL operator (decode -> per-channel means ->
# 8x8 nearest-neighbor thumbnail), and the DuckDB oracle recomputes the
# means from the pixel formula and the thumbnail byte sum from the same
# nearest-neighbor index math (zi = r*H//T, xi = c*W//T) — so the
# operator's decode plumbing, channel order, mean arithmetic, and
# resize indexing are all hash-gated. (Means are exact across engines:
# integer pixel sums are exactly representable doubles, divided once.)
# --------------------------------------------------------------------------
FEAT_H, FEAT_W, FEAT_T = 12, 10, 8

_FEAT_ORACLE = f"""
WITH px AS (
  SELECT doc_id, r.i AS r, c.i AS c,
    (doc_id * 3 + r.i * 7 + c.i * 5) % 256 AS v0,
    (doc_id * 4 + r.i * 7 + c.i * 5 + 1) % 256 AS v1,
    (doc_id * 5 + r.i * 7 + c.i * 5 + 2) % 256 AS v2
  FROM documents, range(0, {FEAT_H}) r(i), range(0, {FEAT_W}) c(i)),
thumb AS (
  SELECT d.doc_id,
    SUM((d.doc_id * 3 + (tr.i * {FEAT_H} // {FEAT_T}) * 7
         + (tc.i * {FEAT_W} // {FEAT_T}) * 5) % 256
      + (d.doc_id * 4 + (tr.i * {FEAT_H} // {FEAT_T}) * 7
         + (tc.i * {FEAT_W} // {FEAT_T}) * 5 + 1) % 256
      + (d.doc_id * 5 + (tr.i * {FEAT_H} // {FEAT_T}) * 7
         + (tc.i * {FEAT_W} // {FEAT_T}) * 5 + 2) % 256) AS tsum
  FROM documents d, range(0, {FEAT_T}) tr(i), range(0, {FEAT_T}) tc(i)
  GROUP BY d.doc_id)
SELECT px.doc_id, {FEAT_H} AS height, {FEAT_W} AS width,
  CAST(SUM(v0) AS DOUBLE) / {FEAT_H * FEAT_W} AS mean_r,
  CAST(SUM(v1) AS DOUBLE) / {FEAT_H * FEAT_W} AS mean_g,
  CAST(SUM(v2) AS DOUBLE) / {FEAT_H * FEAT_W} AS mean_b,
  CAST(MAX(t.tsum) AS BIGINT) AS thumb_sum
FROM px JOIN thumb t ON px.doc_id = t.doc_id
GROUP BY px.doc_id
"""


@query("q_multimodal_image_features", oracle=_FEAT_ORACLE)
def q_multimodal_image_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # Round-15 fuse (guide §4): three chained mapInPandas nodes -> one;
    # the feature math still runs through the real operator kernel
    # (image_features_pdf), so the oracle still gates decode plumbing,
    # channel order, mean arithmetic, and resize indexing.
    from ..operators.multimodal import (
        FAKE_RGB8,
        encode_fake_rgb8,
        image_features_pdf,
    )

    docs = _doc_ids(spark, sf_dir)

    def fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rr = np.arange(FEAT_H, dtype=np.int64)[:, None]
        cc = np.arange(FEAT_W, dtype=np.int64)[None, :]
        for pdf in batches:
            built = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                img = np.stack(
                    [
                        (d * 3 + rr * 7 + cc * 5) % 256,
                        (d * 4 + rr * 7 + cc * 5 + 1) % 256,
                        (d * 5 + rr * 7 + cc * 5 + 2) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                built.append((d, encode_fake_rgb8(img), FAKE_RGB8))
            feats = image_features_pdf(
                pd.DataFrame(
                    built, columns=["item_id", "payload", "media_format"]
                ),
                thumb_size=FEAT_T,
            )
            out = []
            for row in feats.itertuples(index=False):
                tsum = int(
                    np.frombuffer(row.thumb, dtype=np.uint8)
                    .astype(np.int64)
                    .sum()
                )
                out.append(
                    (
                        row.item_id, row.height, row.width,
                        row.mean_r, row.mean_g, row.mean_b, tsum,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "height", "width",
                    "mean_r", "mean_g", "mean_b", "thumb_sum",
                ],
            )

    return docs.mapInPandas(
        fused,
        "doc_id long, height int, width int, mean_r double, "
        "mean_g double, mean_b double, thumb_sum long",
    )


# --------------------------------------------------------------------------
# audio_features under the oracle gate: deterministic fake-pcm16
# waveforms run through the REAL operator (decode -> rms / peak / zero
# crossings); DuckDB recomputes all three from the sample formula. RMS
# is cross-engine exact because both sides compute sqrt(int_sum / n)
# where the integer sum of squares (< 2^53) is exactly representable
# and divided once. Map-only, like every feature extractor here.
# --------------------------------------------------------------------------
AUD_BASE_N, AUD_N_MOD = 40, 17

_AUD_FEAT_ORACLE = f"""
WITH params AS (
  SELECT doc_id, {AUD_BASE_N} + doc_id % {AUD_N_MOD} AS n
  FROM documents),
s AS (
  SELECT p.doc_id, t.i,
    ((p.doc_id * 13 + t.i * 29) % 2001) - 1000 AS v
  FROM params p, range(0, {AUD_BASE_N + AUD_N_MOD}) t(i)
  WHERE t.i < p.n),
zc AS (
  SELECT a.doc_id, COUNT(*) AS zcount
  FROM s a JOIN s b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  WHERE (a.v < 0) != (b.v < 0)
  GROUP BY a.doc_id)
SELECT p.doc_id,
  CAST(p.n AS BIGINT) AS n_samples,
  sqrt(CAST(CAST(SUM(s.v * s.v) AS BIGINT) AS DOUBLE) / p.n) AS rms,
  CAST(MAX(ABS(s.v)) AS INT) AS peak,
  CAST(COALESCE(MAX(z.zcount), 0) AS BIGINT) AS zero_crossings
FROM params p
JOIN s ON s.doc_id = p.doc_id
LEFT JOIN zc z ON z.doc_id = p.doc_id
GROUP BY p.doc_id, p.n
"""


@query("q_multimodal_audio_features", oracle=_AUD_FEAT_ORACLE)
def q_multimodal_audio_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # Round-15 fuse (guide §4): build -> audio_features was two chained
    # mapInPandas nodes; composed per batch through the operator kernel
    # (audio_features_pdf) they cross the Arrow boundary once.
    from ..operators.multimodal import FAKE_PCM16, audio_features_pdf

    docs = _doc_ids(spark, sf_dir)

    def fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            built = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = AUD_BASE_N + d % AUD_N_MOD
                ii = np.arange(n, dtype=np.int64)
                wave = (((d * 13 + ii * 29) % 2001) - 1000).astype(
                    "<i2"
                )
                built.append((d, wave.tobytes(), FAKE_PCM16))
            feats = audio_features_pdf(
                pd.DataFrame(
                    built, columns=["item_id", "payload", "media_format"]
                )
            )
            yield feats.rename(columns={"item_id": "doc_id"})

    return docs.mapInPandas(
        fused,
        "doc_id long, n_samples long, rms double, peak int, "
        "zero_crossings long",
    )


# --------------------------------------------------------------------------
# binaryFile SCAN end-to-end (round-9 verdict, Next #2): the one query
# shape every 100 TB media pipeline starts with — a DIRECTORY OF REAL
# FILES (not in-UDF synthesized payloads) scanned with Spark's
# ``binaryFile`` source (recursiveFileLookup + pathGlobFilter — the S1
# mapping: the reference globs a tile directory the same way,
# imaris_job.py:48-86), bytes routed through the from-spec codecs, and
# only fixed-width decode stats leaving the scan. The fixture writes 60
# real .png/.jpg/.mp4 files (+ decoy .txt/.dat files the glob must
# exclude) whose contents are pure functions of doc_id, so the DuckDB
# oracle recomputes every stat closed-form from the documents table —
# keyed by the doc_id parsed back out of each filename. Map-only:
# payload bytes never shuffle (plan pinned in
# tests/test_binaryfile_scan.py).
# --------------------------------------------------------------------------
N_BINFILES = 60  # doc_id < 60 exists at every sf (ids are 0..N-1)


def _binfile_png_image(d: int) -> np.ndarray:
    rr = np.arange(IMG_H, dtype=np.int64)[:, None]
    cc = np.arange(IMG_W, dtype=np.int64)[None, :]
    return np.stack(
        [
            (d * 7 + rr * 3 + cc * 5) % 256,
            (d * 11 + rr * 2 + cc * 9 + 1) % 256,
            (d * 13 + rr * 4 + cc * 7 + 2) % 256,
        ],
        axis=2,
    ).astype(np.uint8)


def _binfile_jpeg_plane(d: int) -> np.ndarray:
    bi = np.arange(JPEG_BLOCKS, dtype=np.int64)[:, None]
    bj = np.arange(JPEG_BLOCKS, dtype=np.int64)[None, :]
    vals = 2 * ((d * 7 + bi * 13 + bj * 29) % 128)  # even => exact round trip
    return np.kron(vals, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)


def _binfile_mp4_track(d: int) -> dict:
    n = 5 + d % 7
    return {
        "track_id": 1,
        "handler": "vide",
        "codec": "avc1",
        "width": 320,
        "height": 240,
        "media_timescale": 30000,
        "sample_sizes": [40 + (j * 9) % 30 for j in range(n)],
        "sample_deltas": [1001] * n,
        "samples_per_chunk": 4,
        "fill": lambda i: (d * 13 + i) % 256,  # i is 1-based
    }


def binaryfile_fixture_dir() -> str:
    """Write the deterministic 60-file media tree (idempotent, atomic):

    ``<tmp>/spark_graft_binfixture_v1/{png,jpg,mp4}/doc_<id>.<ext>``
    plus two decoy files the pathGlobFilter must exclude. Contents are
    pure functions of doc_id, so concurrent writers race benignly
    (same bytes, atomic rename) and re-runs are no-ops once the
    completion marker exists.
    """
    import os
    import tempfile

    root = os.path.join(tempfile.gettempdir(), "spark_graft_binfixture_v1")
    marker = os.path.join(root, ".complete")
    if os.path.exists(marker):
        return root

    put = _binfixture_putter(root)
    _write_binfixture_media(put)
    put("readme.txt", b"decoy: pathGlobFilter must exclude me")
    put("png/notes.dat", b"decoy inside a media subdir")
    put(".complete", b"")
    return root


def _binfixture_putter(root: str):
    import os

    def put(rel: str, blob: bytes) -> None:
        path = os.path.join(root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)

    return put


def _write_binfixture_media(put) -> None:
    from ..operators.jpeg import encode_jpeg
    from ..operators.media_codecs import encode_png
    from ..operators.mp4 import encode_mp4_media

    for d in range(N_BINFILES):
        if d % 3 == 0:
            put(
                f"png/doc_{d:05d}.png",
                encode_png(_binfile_png_image(d), filter_cycle=5),
            )
        elif d % 3 == 1:
            put(
                f"jpg/doc_{d:05d}.jpg",
                encode_jpeg(_binfile_jpeg_plane(d), quality=50),
            )
        else:
            put(
                f"mp4/doc_{d:05d}.mp4",
                encode_mp4_media(600, [_binfile_mp4_track(d)]),
            )


def binaryfile_corrupt_fixture_dir() -> str:
    """The 60-file media tree PLUS one corrupt file per format — the
    poison-pill fixture for the permissive decode path (round-10
    verdict, Next #2). At 100 TB some inputs are always truncated or
    garbage; a deterministic decode error fails a Spark task on every
    retry, so without quarantine one bad payload aborts the whole job.

    Corrupt members (filenames match the production glob, so a strict
    scan WILL hit them): ``png/doc_00060.png`` truncated mid-IDAT,
    ``jpg/doc_00061.jpg`` an SOI marker followed by garbage,
    ``mp4/doc_00062.mp4`` a valid file whose stsc entry count is
    smashed to 0xFFFFFFFF (table overruns the box body).
    """
    import os
    import tempfile

    from ..operators.jpeg import encode_jpeg
    from ..operators.media_codecs import encode_png
    from ..operators.mp4 import encode_mp4_media

    root = os.path.join(
        tempfile.gettempdir(), "spark_graft_binfixture_corrupt_v1"
    )
    marker = os.path.join(root, ".complete")
    if os.path.exists(marker):
        return root

    put = _binfixture_putter(root)
    _write_binfixture_media(put)
    good_png = encode_png(_binfile_png_image(60), filter_cycle=5)
    put("png/doc_00060.png", good_png[: len(good_png) // 2])
    put(
        "jpg/doc_00061.jpg",
        b"\xff\xd8" + bytes((i * 37 + 11) % 256 for i in range(500)),
    )
    good_mp4 = bytearray(encode_mp4_media(600, [_binfile_mp4_track(62)]))
    stsc = good_mp4.find(b"stsc")
    good_mp4[stsc + 8 : stsc + 12] = b"\xff\xff\xff\xff"  # entry count
    put("mp4/doc_00062.mp4", bytes(good_mp4))
    put(".complete", b"")
    return root


_BINARYFILE_ORACLE = f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < {N_BINFILES}),
png AS (
  SELECT doc_id, 'png' AS media_format,
    CAST(SUM(((doc_id * 7 + r * 3 + c * 5) % 256)
           + ((doc_id * 11 + r * 2 + c * 9 + 1) % 256)
           + ((doc_id * 13 + r * 4 + c * 7 + 2) % 256)) AS BIGINT)
      AS stat_sum,
    CAST({IMG_H * IMG_W} AS BIGINT) AS stat_n
  FROM ids, range(0, {IMG_H}) t1(r), range(0, {IMG_W}) t2(c)
  WHERE doc_id % 3 = 0 GROUP BY doc_id),
jpg AS (
  SELECT doc_id, 'jpeg' AS media_format,
    CAST(SUM(2 * ((doc_id * 7 + bi.i * 13 + bj.i * 29) % 128)) * 64
      AS BIGINT) AS stat_sum,
    CAST({(8 * JPEG_BLOCKS) ** 2} AS BIGINT) AS stat_n
  FROM ids, range(0, {JPEG_BLOCKS}) bi(i), range(0, {JPEG_BLOCKS}) bj(i)
  WHERE doc_id % 3 = 1 GROUP BY doc_id),
mp4 AS (
  SELECT doc_id, 'mp4' AS media_format,
    CAST(SUM((40 + ((i - 1) * 9) % 30) * ((doc_id * 13 + i) % 256))
      AS BIGINT) AS stat_sum,
    CAST(5 + doc_id % 7 AS BIGINT) AS stat_n
  FROM ids, range(1, 12) t(i)
  WHERE doc_id % 3 = 2 AND i <= 5 + doc_id % 7 GROUP BY doc_id)
SELECT * FROM png UNION ALL SELECT * FROM jpg UNION ALL SELECT * FROM mp4
"""


def _decode_binfile(name: str, data: bytes) -> tuple:
    """Decode one media file to its fixed-width stat row
    ``(doc_id, media_format, stat_sum, stat_n)``; raises on malformed
    payloads (the permissive wrapper turns that into an error row)."""
    from ..operators.jpeg import decode_jpeg
    from ..operators.media_codecs import decode_png
    from ..operators.mp4 import demux_samples

    d = int(name[4:9])
    if name.endswith(".png"):
        img = decode_png(data).astype(np.int64)
        return (d, "png", int(img.sum()), img.shape[0] * img.shape[1])
    if name.endswith(".jpg"):
        img = decode_jpeg(data).astype(np.int64)
        return (d, "jpeg", int(img[:, :, 0].sum()), img.shape[0] * img.shape[1])
    samples = demux_samples(data)
    s = 0
    for r in samples:
        s += int(
            np.frombuffer(
                data[r["offset"] : r["offset"] + r["size"]],
                dtype=np.uint8,
            ).astype(np.int64).sum()
        )
    return (d, "mp4", s, len(samples))


_BINFILE_EXT_FORMAT = {"png": "png", "jpg": "jpeg", "mp4": "mp4"}

_BINFILE_DECODE_SCHEMA = (
    "doc_id long, media_format string, stat_sum long, stat_n long, "
    "error_stage string, error_message string"
)


def _binfile_decode_runner(permissive: bool):
    """mapInPandas runner over binaryFile rows (path, content).

    Strict mode re-raises decode errors — one poison-pill payload
    fails the task deterministically (Spark retries can't fix a
    deterministic decode error, so the stage eventually aborts the
    job). Permissive mode quarantines instead: the bad file becomes an
    error row ``(doc_id, format-from-extension, NULL, NULL, stage,
    message)`` and every other file still decodes — the reference's
    defensive-read posture (``utils/utils.py:114-146`` returns empty on
    bad JSON rather than raising), applied to media payloads.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                name = path.rsplit("/", 1)[-1]
                data = bytes(content)
                try:
                    out.append(_decode_binfile(name, data) + (None, None))
                except Exception as exc:  # noqa: BLE001 — quarantine path
                    if not permissive:
                        raise
                    out.append(
                        (
                            int(name[4:9]),
                            _BINFILE_EXT_FORMAT[name.rsplit(".", 1)[-1]],
                            None,
                            None,
                            "decode",
                            f"{type(exc).__name__}: {exc}",
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "media_format",
                    "stat_sum",
                    "stat_n",
                    "error_stage",
                    "error_message",
                ],
            )

    return run


def _binaryfile_scan(spark: SparkSession, root: str) -> DataFrame:
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{png,jpg,mp4}")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select("path", "content")
    )


@query("q_multimodal_binaryfile_scan", oracle=_BINARYFILE_ORACLE)
def q_multimodal_binaryfile_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    files = _binaryfile_scan(spark, binaryfile_fixture_dir())
    return files.mapInPandas(
        _binfile_decode_runner(permissive=False), _BINFILE_DECODE_SCHEMA
    ).select("doc_id", "media_format", "stat_sum", "stat_n")


# Permissive scan over the poison-pill tree (round-10 verdict, Next
# #2): the corrupt fixture adds one malformed file per format; the
# permissive decoder quarantines each as an error row instead of
# failing the task, and the query folds both populations into one
# per-format summary. The oracle recomputes the good-file stats
# closed-form (same CTEs as the strict query) and pins error_files=1
# per format — hash-green means corrupt inputs were COUNTED, not
# crashed on and not silently dropped.
_BINARYFILE_PERMISSIVE_ORACLE = f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < {N_BINFILES}),
png AS (
  SELECT doc_id, 'png' AS media_format,
    CAST(SUM(((doc_id * 7 + r * 3 + c * 5) % 256)
           + ((doc_id * 11 + r * 2 + c * 9 + 1) % 256)
           + ((doc_id * 13 + r * 4 + c * 7 + 2) % 256)) AS BIGINT)
      AS stat_sum
  FROM ids, range(0, {IMG_H}) t1(r), range(0, {IMG_W}) t2(c)
  WHERE doc_id % 3 = 0 GROUP BY doc_id),
jpg AS (
  SELECT doc_id, 'jpeg' AS media_format,
    CAST(SUM(2 * ((doc_id * 7 + bi.i * 13 + bj.i * 29) % 128)) * 64
      AS BIGINT) AS stat_sum
  FROM ids, range(0, {JPEG_BLOCKS}) bi(i), range(0, {JPEG_BLOCKS}) bj(i)
  WHERE doc_id % 3 = 1 GROUP BY doc_id),
mp4 AS (
  SELECT doc_id, 'mp4' AS media_format,
    CAST(SUM((40 + ((i - 1) * 9) % 30) * ((doc_id * 13 + i) % 256))
      AS BIGINT) AS stat_sum
  FROM ids, range(1, 12) t(i)
  WHERE doc_id % 3 = 2 AND i <= 5 + doc_id % 7 GROUP BY doc_id),
good AS (
  SELECT * FROM png UNION ALL SELECT * FROM jpg UNION ALL
  SELECT * FROM mp4)
SELECT media_format,
  CAST(COUNT(*) AS BIGINT) AS ok_files,
  CAST(1 AS BIGINT) AS error_files,
  CAST(SUM(stat_sum) AS BIGINT) AS ok_stat_sum
FROM good GROUP BY media_format
"""


@query(
    "q_multimodal_binaryfile_permissive",
    oracle=_BINARYFILE_PERMISSIVE_ORACLE,
)
def q_multimodal_binaryfile_permissive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    files = _binaryfile_scan(spark, binaryfile_corrupt_fixture_dir())
    decoded = files.mapInPandas(
        _binfile_decode_runner(permissive=True), _BINFILE_DECODE_SCHEMA
    )
    return decoded.groupBy("media_format").agg(
        F.count(F.when(F.col("error_stage").isNull(), 1)).alias("ok_files"),
        F.count(
            F.when(F.col("error_stage").isNotNull(), 1)
        ).alias("error_files"),
        F.sum("stat_sum").alias("ok_stat_sum"),
    )
