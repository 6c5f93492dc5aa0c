"""Modern SQL surface (Spark 4.x): recursive CTEs, LATERAL correlated
subqueries, the VARIANT semi-structured type, and Python UDTFs.

These four were the notable SQL-surface additions of Spark 4 and round
out the engine's §2B coverage:

- ``WITH RECURSIVE`` (UNION ALL form) — hierarchy traversal; Spark bounds
  runaway recursion via ``spark.sql.cteRecursionLevelLimit``.
- ``LATERAL (... ORDER BY ... LIMIT k)`` — per-row correlated top-k,
  planned by Catalyst as a rewritten join (no driver-side loop).
- ``parse_json`` / ``variant_get`` — typed extraction from the binary
  VARIANT encoding (the 100 TB-friendly way to hold ragged JSON: one
  parse at ingest, cheap typed reads after).
- ``@udtf`` table functions — arbitrary row-expanding Python logic joined
  laterally; Arrow-batched like other pandas-family UDFs.

Each query carries a DuckDB oracle computing the same result through
portable SQL (DuckDB json functions / unnest instead of variant / UDTF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


# --------------------------------------------------------------------------
# Recursive CTE: traverse a synthetic 3-ary tree over the 25 nations
# (node k's parent is (k-1)//3; node 0 is the root), emitting each
# node's depth and materialized root-to-node key path. UNION ALL is safe:
# a tree recursion produces each row exactly once.
# --------------------------------------------------------------------------
_TREE_SQL = """
WITH RECURSIVE nodes AS (
  SELECT n_nationkey AS id, n_name AS name,
    CASE WHEN n_nationkey = 0 THEN NULL
         ELSE CAST(floor((n_nationkey - 1) / 3.0) AS BIGINT) END AS parent
  FROM nation),
walk(id, name, depth, path) AS (
  SELECT id, name, 0, CAST(id AS STRING) FROM nodes WHERE parent IS NULL
  UNION ALL
  SELECT c.id, c.name, w.depth + 1, w.path || '/' || CAST(c.id AS STRING)
  FROM nodes c JOIN walk w ON c.parent = w.id)
SELECT id, name, depth, path FROM walk
"""


@query("q_recursive_nation_tree", oracle=_TREE_SQL)
def q_recursive_nation_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(_TREE_SQL)


# --------------------------------------------------------------------------
# LATERAL correlated top-k: for every nation, its two richest customers.
# Catalyst rewrites the correlated LIMIT subquery into a join + per-group
# top-k — the same physical shape as a row_number() window, but declared
# in the SQL-standard lateral form.
# --------------------------------------------------------------------------
_LATERAL_SQL = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_acctbal
  FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2) t
"""


@query("q_lateral_topk_customers", oracle=_LATERAL_SQL)
def q_lateral_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_LATERAL_SQL)


# --------------------------------------------------------------------------
# VARIANT: build a JSON payload string (identically on both engines, so
# no to_json formatting dependence), parse once into VARIANT, then do
# typed gets. DuckDB oracle extracts with its json functions.
# --------------------------------------------------------------------------
@query(
    "q_variant_json_extract",
    oracle="""
WITH payloads AS (
  SELECT event_id,
    json_object('user', user_id, 'type', event_type) AS payload
  FROM events WHERE event_id < 500)
SELECT event_id,
  CAST(json_extract(payload, '$.user') AS BIGINT) AS user_id,
  json_extract_string(payload, '$.type') AS event_type
FROM payloads
""",
)
def q_variant_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 500)
    # to_json handles quoting/escaping; each engine extracts from its own
    # properly-constructed JSON, so any event_type content is safe.
    payload = F.to_json(
        F.struct(
            F.col("user_id").alias("user"),
            F.col("event_type").alias("type"),
        )
    )
    v = F.parse_json(payload)
    return ev.select(
        "event_id",
        F.variant_get(v, "$.user", "bigint").alias("user_id"),
        F.variant_get(v, "$.type", "string").alias("event_type"),
    )


# --------------------------------------------------------------------------
# Python UDTF: expand each short document into its word 2-grams with
# positions, joined laterally. The oracle reproduces the expansion with
# unnest over an index range.
# --------------------------------------------------------------------------
@query(
    "q_udtf_word_bigrams",
    oracle="""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS words
  FROM documents WHERE doc_id < 40)
SELECT doc_id,
  CAST(i - 1 AS INT) AS pos,
  words[i] || ' ' || words[i + 1] AS bigram
FROM docs, unnest(range(1, len(words))) t(i)
""",
)
def q_udtf_word_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, bigram: string")
    class WordBigrams:
        def eval(self, text: str):
            if not text:  # NULL text: emit no rows (oracle does the same)
                return
            words = text.split(" ")
            for i in range(len(words) - 1):
                yield i, words[i] + " " + words[i + 1]

    spark.udtf.register("word_bigrams", WordBigrams)
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    docs.createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.bigram "
        "FROM docs_for_udtf d, LATERAL word_bigrams(d.text) t"
    )


# --------------------------------------------------------------------------
# SQL scripting (Spark 4.x BEGIN...END compound statements): procedural
# control flow — DECLARE'd session variables, a WHILE loop, and a
# scalar-subquery SET — executing entirely inside spark.sql(). The loop
# computes a modulus (2^5), the SET pulls an exact-decimal average
# price, and the final SELECT filters on both. DuckDB has no scripting;
# the oracle inlines the loop's closed form and the same exact-decimal
# average, so the results must agree bit-for-bit.
# --------------------------------------------------------------------------
_SCRIPT = """
BEGIN
  DECLARE i INT DEFAULT 0;
  DECLARE acc BIGINT DEFAULT 1;
  DECLARE thr DOUBLE DEFAULT 0.0;
  WHILE i < 5 DO
    SET acc = acc * 2;
    SET i = i + 1;
  END WHILE;
  SET thr = (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                         AS DOUBLE) / COUNT(*) FROM orders);
  SELECT o_orderstatus, COUNT(*) AS n_above, acc AS modulus
  FROM orders
  WHERE o_totalprice > thr AND o_orderkey % acc = 0
  GROUP BY o_orderstatus;
END
"""

_SCRIPT_ORACLE = """
WITH thr AS (
  SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
              AS DOUBLE) / COUNT(*) AS v
  FROM orders)
SELECT o_orderstatus, COUNT(*) AS n_above, CAST(32 AS BIGINT) AS modulus
FROM orders CROSS JOIN thr
WHERE o_totalprice > thr.v AND o_orderkey % 32 = 0
GROUP BY o_orderstatus
"""


@query("q_sql_scripting_compound", oracle=_SCRIPT_ORACLE)
def q_sql_scripting_compound(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..sources.tables import register_views

    spark.conf.set("spark.sql.scripting.enabled", "true")
    register_views(spark, sf_dir)
    return spark.sql(_SCRIPT)
