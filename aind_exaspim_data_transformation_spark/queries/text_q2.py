"""Second text-pipeline batch: repetition-based quality filtering
(Gopher-style), PII detection/redaction, and corpus-level duplicate
n-gram analysis over the ``documents`` table.

These are the filters a production LLM training-data pipeline runs after
tokenization and before dedup (reference scope: the engine's analytics
surface; repetition rules follow Rae et al. 2021 "Scaling Language
Models" appendix A1.1 — public paper).

Scale notes (100 TB):

- Repetition signals are computed ROW-LOCALLY with array higher-order
  functions — a pure map over the corpus, no shuffle at all. The
  ``top_unigram_frac`` count uses the sorted-run form
  (``_helpers.top_element_count``: array_sort + one aggregate pass,
  O(n log n) per row — the round-7 sf10 sweep measured the previous
  O(distinct x n) transform/filter form at 3x the cost); for
  degenerate multi-MB documents switch to the explode + groupBy form
  used by ``q_text_tfidf_top_term``.
- PII redaction is likewise map-only: regexp_count + regexp_replace are
  JVM-side codegen'd expressions, no Python in the loop.
- The corpus duplicate-5-gram query is an inverted-index aggregation:
  per-doc DISTINCT grams explode, aggregate on the gram key (map-side
  partial count first), and join back on doc_id. Both shuffles are on
  high-cardinality keys; no all-pairs stage exists. The exploded index
  feeds two plan branches (the gram-count aggregate and the probe side
  of the join), so it is persisted MEMORY_AND_DISK — without that,
  Catalyst re-expands both branches into their own text-scan + shingle
  + explode, doubling the heaviest stage; at extreme scale where even
  the spilled index is unwelcome, drop the persist and accept the
  recompute (one line).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..sources.tables import load_table
from ._helpers import adjacent_grams, fan_out_small_scan, top_element_count
from .lifecycle import track_persist
from .registry import query


def _words() -> Column:
    return F.split("text", " ")


# --------------------------------------------------------------------------
# Gopher-style repetition signals + keep/drop verdict. All row-local.
# --------------------------------------------------------------------------
_GOPHER_ORACLE = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS n_words
  FROM documents),
grams AS (
  SELECT doc_id, n_words,
    list_transform(range(1, n_words), i -> ws[i] || ' ' || ws[i + 1])
      AS bigrams,
    list_transform(range(1, n_words - 1),
                   i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])
      AS trigrams,
    list_max(list_transform(list_distinct(ws),
                            w -> len(list_filter(ws, x -> x = w))))
      AS top_unigram_count
  FROM base),
sig AS (
  SELECT doc_id, n_words,
    CAST(top_unigram_count AS DOUBLE) / n_words AS top_unigram_frac,
    CASE WHEN len(bigrams) = 0 THEN 0.0
         ELSE 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE)
                    / len(bigrams) END AS dup_bigram_frac,
    CASE WHEN len(trigrams) = 0 THEN 0.0
         ELSE 1.0 - CAST(len(list_distinct(trigrams)) AS DOUBLE)
                    / len(trigrams) END AS dup_trigram_frac
  FROM grams)
SELECT doc_id, n_words, top_unigram_frac, dup_bigram_frac,
       dup_trigram_frac,
       (n_words >= 10 AND top_unigram_frac <= 0.20
        AND dup_bigram_frac <= 0.60 AND dup_trigram_frac <= 0.50)
         AS keep
FROM sig
"""


@query("q_text_gopher_repetition", oracle=_GOPHER_ORACLE)
def q_text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals and a keep/drop verdict.

    Signals (Rae et al. 2021, A1.1, token-count variants): fraction of
    words accounted for by the single most frequent word, and the
    fraction of duplicated 2-grams / 3-grams. Entirely row-local
    (map-only) — the whole filter is one corpus pass with zero shuffle.
    """
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        _words().alias("ws"),
        F.size(_words()).alias("n_words"),
    )
    n = F.col("n_words")
    ws = F.col("ws")
    # Linear-time gram builds (round 14, _helpers.adjacent_grams): the
    # transform/element_at form re-evaluates ws per element once
    # CollapseProject inlines the split into this consumer.
    bigrams = adjacent_grams(ws, 2)
    trigrams = adjacent_grams(ws, 3)
    top_unigram = top_element_count(ws)
    grams = base.select(
        "doc_id",
        "n_words",
        bigrams.alias("bigrams"),
        trigrams.alias("trigrams"),
        top_unigram.alias("top_unigram_count"),
    )

    def dup_frac(col: str) -> Column:
        c = F.col(col)
        return F.when(F.size(c) == 0, F.lit(0.0)).otherwise(
            F.lit(1.0)
            - F.size(F.array_distinct(c)).cast("double") / F.size(c)
        )

    sig = grams.select(
        "doc_id",
        "n_words",
        (F.col("top_unigram_count").cast("double") / n).alias(
            "top_unigram_frac"
        ),
        dup_frac("bigrams").alias("dup_bigram_frac"),
        dup_frac("trigrams").alias("dup_trigram_frac"),
    )
    return sig.select(
        "doc_id",
        "n_words",
        "top_unigram_frac",
        "dup_bigram_frac",
        "dup_trigram_frac",
        (
            (n >= 10)
            & (F.col("top_unigram_frac") <= 0.20)
            & (F.col("dup_bigram_frac") <= 0.60)
            & (F.col("dup_trigram_frac") <= 0.50)
        ).alias("keep"),
    )


# --------------------------------------------------------------------------
# PII detection + redaction. The corpus is synthetic word salad with no
# real PII, so the query first APPENDS deterministic PII-shaped spans
# (identical expression in both engines) and then runs the actual
# operator under test: regex detection counts + in-place redaction.
# --------------------------------------------------------------------------
_EMAIL_RE = "[a-z0-9.]+@[a-z0-9.]+[.][a-z]+"
_PHONE_RE = "555-[0-9]{4}"
_IP_RE = "10[.][0-9]{1,3}[.]0[.][0-9]{1,3}"

_PII_ORACLE = f"""
WITH aug AS (
  SELECT doc_id,
    text || CASE
      WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
        || '@mail.example.com for details'
      WHEN doc_id % 7 = 3 THEN ' call 555-'
        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
      WHEN doc_id % 7 = 5 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
        || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) || ' up'
      ELSE '' END AS aug_text
  FROM documents),
red AS (
  SELECT doc_id, aug_text,
    len(regexp_extract_all(aug_text, '{_EMAIL_RE}')) AS n_emails,
    len(regexp_extract_all(aug_text, '{_PHONE_RE}')) AS n_phones,
    len(regexp_extract_all(aug_text, '{_IP_RE}')) AS n_ips,
    regexp_replace(regexp_replace(regexp_replace(aug_text,
      '{_EMAIL_RE}', '<EMAIL>', 'g'),
      '{_PHONE_RE}', '<PHONE>', 'g'),
      '{_IP_RE}', '<IP>', 'g') AS redacted
  FROM aug)
SELECT doc_id, n_emails, n_phones, n_ips,
  length(redacted) AS redacted_len,
  md5(redacted) AS redacted_md5
FROM red
"""


@query("q_text_pii_redact", oracle=_PII_ORACLE)
def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect and redact email/phone/IP spans; emit counts + redacted
    hash. Map-only: regexp_count/regexp_replace are codegen'd JVM
    expressions, so the scrub runs at scan speed with no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug_text = F.concat(
        F.col("text"),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@mail.example.com for details"),
            ),
        )
        .when(
            did % 7 == 3,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
                F.lit(" today"),
            ),
        )
        .when(
            did % 7 == 5,
            F.concat(
                F.lit(" host 10."),
                (did % 256).cast("string"),
                F.lit(".0."),
                ((did * 7) % 256).cast("string"),
                F.lit(" up"),
            ),
        )
        .otherwise(F.lit("")),
    )
    aug = docs.select("doc_id", aug_text.alias("aug_text"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.col("aug_text"), F.lit(_EMAIL_RE), F.lit("<EMAIL>")
            ),
            F.lit(_PHONE_RE),
            F.lit("<PHONE>"),
        ),
        F.lit(_IP_RE),
        F.lit("<IP>"),
    )
    return aug.select(
        "doc_id",
        F.regexp_count("aug_text", F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("aug_text", F.lit(_PHONE_RE)).alias("n_phones"),
        F.regexp_count("aug_text", F.lit(_IP_RE)).alias("n_ips"),
        F.length(redacted).alias("redacted_len"),
        F.md5(redacted.cast("binary")).alias("redacted_md5"),
    )


# --------------------------------------------------------------------------
# Corpus-level duplicate 5-gram fraction: per document, the fraction of
# its DISTINCT 5-grams that also occur in at least one OTHER document.
# The exact-substring-overlap signal behind suffix-array dedup, at
# n-gram granularity.
# --------------------------------------------------------------------------
_DUP5_ORACLE = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS n_words
  FROM documents),
grams AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, n_words - 3),
      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
           || ws[i+3] || ' ' || ws[i+4])) AS g5
  FROM base),
exploded AS (SELECT doc_id, unnest(g5) AS gram FROM grams),
gram_docs AS (
  SELECT gram, COUNT(*) AS n_docs FROM exploded GROUP BY gram),
per_doc AS (
  SELECT e.doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_grams,
    CAST(COUNT(*) FILTER (WHERE gd.n_docs >= 2) AS BIGINT) AS n_shared
  FROM exploded e JOIN gram_docs gd ON e.gram = gd.gram
  GROUP BY e.doc_id)
SELECT b.doc_id,
  COALESCE(p.n_grams, 0) AS n_grams,
  COALESCE(p.n_shared, 0) AS n_shared,
  CASE WHEN COALESCE(p.n_grams, 0) = 0 THEN 0.0
       ELSE CAST(p.n_shared AS DOUBLE) / p.n_grams END AS shared_frac
FROM base b LEFT JOIN per_doc p ON b.doc_id = p.doc_id
"""


@query("q_text_dup_5gram_corpus", oracle=_DUP5_ORACLE)
def q_text_dup_5gram_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate 5-gram fraction via an inverted index.

    Distinct grams are built row-locally, exploded into a persisted
    inverted index, aggregated on the gram key (map-side partial agg),
    and joined back on doc_id — two shuffles on high-cardinality keys,
    no pairwise stage. At 100 TB this is the same shape as the MinHash
    pipeline's shingle stage.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        _words().alias("ws"),
        F.size(_words()).alias("n_words"),
    )
    ws = F.col("ws")
    # Linear-time 5-gram build (round 14, _helpers.adjacent_grams).
    g5 = F.array_distinct(adjacent_grams(ws, 5))
    # The exploded inverted index is persisted so the gram-count
    # aggregate and the join-back share one expansion pass (2
    # corpus-size scans -> 1). This function returns a lazy plan, so it
    # cannot unpersist before its own action runs; long-lived sessions
    # should run it through ``lifecycle.managed_query``, which
    # unpersists on scope exit (the oracle harness's one-shot sessions
    # don't need to).
    exploded = track_persist(
        base.select("doc_id", F.explode(g5).alias("gram")),
        StorageLevel.MEMORY_AND_DISK,
    )
    gram_docs = exploded.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    per_doc = (
        exploded.join(gram_docs, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_if(F.col("n_docs") >= 2).alias("n_shared"),
        )
    )
    return (
        base.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            F.when(F.coalesce("n_grams", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.col("n_shared").cast("double") / F.col("n_grams")
            )
            .alias("shared_frac"),
        )
    )


# --------------------------------------------------------------------------
# approx_top_k (Spark 4.x): sketch-based frequent items over the token
# stream. The sketch tracks up to maxItemsTracked items with exact
# counts and degrades gracefully above that — the mergeable heavy-
# hitters pattern for 100 TB corpora (per-partition sketches combine
# like partial aggregates; an exact global top-k re-shuffles every
# token). The oracle asserts the VERIFIABLE properties instead of the
# raw sketch rows, which keeps the check tie-robust: every returned
# count equals the exact count, and every returned item sits within the
# top-(k+5) exact ranks (ties at the k boundary may swap set members).
# --------------------------------------------------------------------------
_TOPK_ORACLE = """
SELECT CAST(LEAST(10, COUNT(DISTINCT word)) AS BIGINT) AS n_returned,
  TRUE AS counts_exact,
  TRUE AS within_rank_15
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
"""


@query("q_text_approx_top_k", oracle=_TOPK_ORACLE)
def q_text_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split("text", " ")).alias("word")
    )
    # maxItemsTracked pinned to 100000 (default is 10000): counts stay
    # EXACT as long as the vocabulary fits the tracker, and the corpus
    # vocabulary is what the cross-engine n_returned ties the check to —
    # a larger sf can't silently degrade the sketch under the oracle.
    topk = words.agg(
        F.expr("approx_top_k(word, 10, 100000)").alias("tk")
    )
    items = topk.select(F.explode("tk").alias("s")).select(
        F.col("s.item").alias("word"),
        F.col("s.count").alias("approx_count"),
    )
    exact = words.groupBy("word").agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    rk = F.row_number().over(
        Window.orderBy(F.desc("exact_count"), F.asc("word"))
    )
    ranked = exact.withColumn("rk", rk)
    joined = items.join(ranked, "word")
    return joined.agg(
        F.count(F.lit(1)).alias("n_returned"),
        F.bool_and(
            F.col("approx_count") == F.col("exact_count")
        ).alias("counts_exact"),
        F.bool_and(F.col("rk") <= 15).alias("within_rank_15"),
    )
