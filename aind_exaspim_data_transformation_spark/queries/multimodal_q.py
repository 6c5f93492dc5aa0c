"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Mirrors the engine's tensor-block model (SURVEY §1.4): payloads are
``BinaryType`` columns, metadata travels in plain columns, and heavy decode
work happens in Arrow-batched UDFs (see ``operators/multimodal.py``). The
oracle-checked queries exercise the relational side: binary construction,
byte lengths, digests, and fixed-size chunk grids (the same ceil-div grid
math the Zarr writer uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

CHUNK = 64  # bytes per chunk in the chunk-grid query


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
    grid = docs.select(
        "doc_id",
        n.alias("n"),
        F.explode(
            F.sequence(
                F.lit(0), F.ceil(n / F.lit(float(CHUNK))).cast("long") - 1
            )
        ).alias("chunk_idx"),
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
