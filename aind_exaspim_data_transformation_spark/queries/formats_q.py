"""Columnar-format interop beyond parquet: ORC sink + source under the
oracle gate.

Spark ships an ORC reader/writer with the same Catalyst integration as
parquet (vectorized scan, predicate pushdown, column pruning), so a
100 TB deployment can ingest ORC-resident lakes without a conversion
pass. The query writes a real ORC copy of ``orders``, reads it back with
a pushed-down filter, and aggregates — DuckDB recomputes the expected
result straight from the parquet view, so any encode/decode divergence
in the ORC round trip breaks the hash.

(Avro: the external ``spark-avro`` jar is not bundled, so the round
trip goes through the ``pyavro`` Python DataSource backed by the
from-spec container codec in ``sources/avroio.py`` — same
write/read/aggregate shape, real Avro bytes on disk.)

Contract note: calling a round-trip query function performs the format
WRITE eagerly (the write is half of the operator under test); only the
read-back aggregate is returned lazily. Staging paths live under a
per-process temp root (cleaned at interpreter exit), so concurrent
harness processes never race on a shared directory.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ._helpers import dsum, sql_dsum
from .registry import query

_ORC_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
  COUNT(*) AS n_orders,
  {sql_dsum("o_totalprice", "sum_price")},
  CAST(MIN(o_orderkey) AS BIGINT) AS min_key
FROM orders
WHERE o_totalprice > 1000.0
GROUP BY o_orderstatus, o_orderpriority
"""

# Per-process staging root: unique per interpreter (no cross-process
# overwrite races), keyed by the FULL sf_dir path (no basename
# collisions), removed at exit.
_STAGING_ROOT = tempfile.mkdtemp(prefix="spark_formats_oracle_")
atexit.register(shutil.rmtree, _STAGING_ROOT, ignore_errors=True)


def _staging_dir(kind: str, sf_dir: str) -> str:
    digest = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    return os.path.join(_STAGING_ROOT, f"{kind}_{digest}")


@query("q_orc_roundtrip_agg", oracle=_ORC_ORACLE)
def q_orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> ORC files -> filtered scan -> exact decimal aggregate.

    The filter lands in the ORC scan as a pushed search argument and
    only the four referenced columns are materialized (asserted in
    tests/test_source_formats.py), so the round trip costs one
    sequential write + one pruned scan at any scale.
    """
    orc_dir = _staging_dir("orc_orders", sf_dir)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    orders.write.mode("overwrite").orc(orc_dir)
    back = spark.read.orc(orc_dir)
    return (
        back.where(F.col("o_totalprice") > 1000.0)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "sum_price"),
            F.min("o_orderkey").alias("min_key"),
        )
    )


# --------------------------------------------------------------------------
# XML round trip (Spark 4 ships the spark-xml reader/writer natively).
# Schema is supplied on read — inference is for exploration, not
# round-trip contracts. Integer/string columns only: XML carries no
# type system, so exactness is the schema's job.
# --------------------------------------------------------------------------
_XML_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
  CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM orders
GROUP BY o_orderstatus, o_orderpriority
"""


@query("q_xml_roundtrip_agg", oracle=_XML_ORACLE)
def q_xml_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders keys/status/priority -> XML rows -> schema'd scan ->
    aggregate. The XML source distributes like any file scan (one task
    per split), so ingesting XML-resident feeds needs no staging hop."""
    xml_dir = _staging_dir("xml_orders", sf_dir)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    (
        orders.write.mode("overwrite")
        .format("xml")
        .option("rowTag", "order")
        .save(xml_dir)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "order")
        .schema(
            "o_orderkey long, o_orderstatus string, o_orderpriority string"
        )
        .load(xml_dir)
    )
    return back.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


# --------------------------------------------------------------------------
# Avro round trip via the pyavro Python DataSource (sources/avroio.py:
# from-spec container codec; sources/avro_datasource.py: Catalyst
# integration). Real Avro bytes land on disk (deflate codec) and come
# back through a file-per-task scan; DuckDB recomputes the aggregate
# from the parquet view, so an encode/decode bug anywhere breaks the
# hash.
# --------------------------------------------------------------------------
_AVRO_ORACLE = """
SELECT lang,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(MIN(doc_id) AS BIGINT) AS min_doc,
  CAST(bit_xor(CAST(('0x' || substring(
    md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15)) AS UBIGINT))
    AS BIGINT) AS corpus_digest
FROM documents
GROUP BY lang
"""


@query("q_avro_roundtrip_agg", oracle=_AVRO_ORACLE)
def q_avro_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> Avro container files (deflate) -> scan -> aggregate
    incl. a per-doc-keyed corpus digest (xor of md5(doc_id:text)), so
    every byte of every string must survive the round trip — bound to
    its doc_id, so even texts swapped between rows break the hash.
    bit_xor keeps per-lang aggregation state at ONE scalar; the earlier
    sorted-collect_list-of-texts digest held a language's entire corpus
    in one group (round-8 skew audit)."""
    from ..sources.avro_datasource import AvroDataSource

    spark.dataSource.register(AvroDataSource)
    avro_dir = _staging_dir("avro_documents", sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    docs.write.format("pyavro").mode("overwrite").save(avro_dir)
    back = spark.read.format("pyavro").load(avro_dir)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("doc_id").cast("long").alias("min_doc"),
        F.expr(
            "cast(bit_xor(cast(conv(substring(md5(cast(concat("
            "cast(doc_id as string), ':', text) as binary)), 1, 15),"
            " 16, 10) as bigint)) as bigint)"
        ).alias("corpus_digest"),
    )
