"""Partitioned-table pruning: static partition filters and dynamic
partition pruning (DPP) — the file-skipping machinery 100 TB scans
depend on."""

from pyspark.sql import functions as F

from aind_exaspim_data_transformation_spark.sources.tables import load_table

from conftest import SF_SMALL


def _write_partitioned_orders(spark, path: str) -> None:
    orders = load_table(spark, SF_SMALL, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    orders.write.mode("overwrite").partitionBy("order_year").parquet(path)


def test_static_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "orders_by_year")
    _write_partitioned_orders(spark, path)
    df = spark.read.parquet(path).where(F.col("order_year") == 1997)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "order_year" in plan.split("PartitionFilters")[1][:200]
    # semantics: matches the unpartitioned filter
    expected = (
        load_table(spark, SF_SMALL, "orders")
        .where(F.year("o_orderdate") == 1997)
        .count()
    )
    assert df.count() == expected


def test_dynamic_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "orders_by_year_dpp")
    _write_partitioned_orders(spark, path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(1996, "a"), (1997, "b")], "order_year int, tag string"
    ).where(F.col("tag") == "b")
    joined = fact.join(dim, "order_year")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    expected = (
        load_table(spark, SF_SMALL, "orders")
        .where(F.year("o_orderdate") == 1997)
        .count()
    )
    assert joined.count() == expected
