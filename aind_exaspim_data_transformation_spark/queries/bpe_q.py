"""BPE-tokenized training-data queries (round-10 verdict, Missing #1).

``q_text_bpe_tokens`` tokenizes every document with the pinned
byte-level BPE merges table (``functions/bpe.py``) — the faithful
token accounting a production LLM pipeline packs by, replacing the
whitespace-split proxy. ``q_docs_pack_sequences_bpe`` is the
token-faithful twin of ``q_docs_pack_sequences``: identical packing
arithmetic, but over BPE token counts.

Oracle strategy: the encode fold is rendered as a nested DuckDB
``replace()`` chain from the SAME merges table (``sql_token_count``),
so both engines compute the identical token stream closed-form — no
RNG, no precomputed answers.

Scale: encode is an Arrow-batched pandas UDF, map-only over the text
column (the merges table rides along as a ~3 KB closure constant);
packing adds the same per-source parallel-cumsum shape as the
whitespace variant — one narrow shuffle of (doc_id, source, n_tokens)
rows, text never shuffles.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.bpe import (
    sql_apply_merges,
    sql_expansion_values,
    sql_token_count,
    token_count_series,
)
from ..sources.tables import load_table
from .dataprep_q import _SEQ_LEN
from .registry import query


def _bpe_count_udf():
    @F.pandas_udf("long")
    def n_bpe_tokens(texts: pd.Series) -> pd.Series:
        return token_count_series(texts).astype("int64")

    return n_bpe_tokens


_BPE_TOKENS_ORACLE = f"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST({sql_token_count('text')} AS BIGINT) AS n_tokens
FROM documents
"""


@query("q_text_bpe_tokens", oracle=_BPE_TOKENS_ORACLE)
def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE token count vs raw byte length (the corpus is
    pure ASCII, so ``length(text)`` is the byte count): the compression
    the learned merges achieve, doc by doc."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        _bpe_count_udf()(F.col("text")).alias("n_tokens"),
    )


_PACK_BPE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source,
    CAST({sql_token_count('text')} AS BIGINT) AS n_tokens
  FROM documents),
cum AS (
  SELECT doc_id, source, n_tokens,
    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_in_src
  FROM toks),
src_tot AS (
  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS total FROM toks
  GROUP BY source),
src_off AS (
  SELECT source,
    CAST(SUM(total) OVER (ORDER BY source
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - total
      AS BIGINT) AS offset
  FROM src_tot)
SELECT c.doc_id, c.source, c.n_tokens,
  CAST(o.offset + c.cum_in_src - c.n_tokens AS BIGINT) AS global_start,
  CAST((o.offset + c.cum_in_src - c.n_tokens) // {_SEQ_LEN} AS BIGINT)
    AS first_example,
  CAST((o.offset + c.cum_in_src - 1) // {_SEQ_LEN} AS BIGINT)
    AS last_example
FROM cum c JOIN src_off o ON c.source = o.source
"""


@query("q_docs_pack_sequences_bpe", oracle=_PACK_BPE_ORACLE)
def q_docs_pack_sequences_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-faithful GPT-style sequence packing: concatenate the BPE
    token stream in (source, doc_id) order and cut every ``_SEQ_LEN``
    tokens; emit each document's global token offset and the example-id
    range it lands in. Same integer window arithmetic as the
    whitespace-token variant (``q_docs_pack_sequences``) — only the
    token counter changed."""
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        _bpe_count_udf()(F.col("text")).alias("n_tokens"),
    )
    w_src = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn("cum_in_src", F.sum("n_tokens").over(w_src))
    src_tot = toks.groupBy("source").agg(F.sum("n_tokens").alias("total"))
    w_off = Window.orderBy("source").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    src_off = src_tot.select(
        "source",
        (F.sum("total").over(w_off) - F.col("total")).alias("offset"),
    )
    gstart = F.col("offset") + F.col("cum_in_src") - F.col("n_tokens")
    gend = F.col("offset") + F.col("cum_in_src")
    return cum.join(F.broadcast(src_off), "source").select(
        "doc_id",
        "source",
        "n_tokens",
        gstart.alias("global_start"),
        F.floor(gstart / _SEQ_LEN).alias("first_example"),
        F.floor((gend - 1) / _SEQ_LEN).alias("last_example"),
    )


# Corpus vocabulary usage: which learned merges actually carry the
# corpus. Tokenize every document, explode the token stream, count by
# token STRING (the expanded source substring — grouping by the
# surface form, not the internal char, so two hypothetical merges with
# identical expansions would fold together identically in both
# engines), top-20 by (count desc, token asc). One exploded-aggregate
# shuffle + TakeOrdered; the merges expansion map joins in as a
# 256-row broadcast-sized VALUES relation on the oracle side and is a
# plain Python dict inside the UDF on the Spark side.
_BPE_VOCAB_ORACLE = f"""
WITH enc AS (
  SELECT {sql_apply_merges('text')} AS m FROM documents),
chars AS (
  SELECT unnest(list_transform(range(1, length(m) + 1),
                               i -> substr(m, i, 1))) AS tok_char
  FROM enc),
mapped AS (
  SELECT COALESCE(v.token, c.tok_char) AS token
  FROM chars c LEFT JOIN {sql_expansion_values()}
    ON c.tok_char = v.tok_char)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM mapped GROUP BY token
ORDER BY n DESC, token LIMIT 20
"""


@query("q_text_bpe_vocab_stats", oracle=_BPE_VOCAB_ORACLE)
def q_text_bpe_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 BPE tokens by corpus frequency (expanded surface form):
    the vocabulary-usage report a tokenizer owner reads to see whether
    the learned merges match the corpus. Map-only tokenize -> explode
    -> one count aggregation -> TakeOrdered(20)."""
    from ..functions.bpe import encode

    @F.pandas_udf("array<string>")
    def bpe_tokens_udf(texts: pd.Series) -> pd.Series:
        return texts.map(encode)

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(bpe_tokens_udf(F.col("text"))).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )
