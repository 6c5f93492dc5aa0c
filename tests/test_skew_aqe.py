"""AQE skew-join runtime splitting, demonstrated end to end.

COVERAGE.md scale note: extreme single-key skew is handled explicitly by
salting (tests/test_layout.py); moderate skew is left to AQE's runtime
skew-join splitting. This test proves the AQE path actually engages: a
hot key ~200x larger than the median partition is split at runtime, and
the executed plan is marked ``skew=true``.
"""

import re

import pytest
from pyspark.sql import functions as F

SKEW_CONF = {
    # make the tiny test dataset look skewed to the planner
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
    # forbid broadcast so the join must be a shuffle join (the skewed case)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture
def skew_conf(spark):
    old = {k: spark.conf.get(k, None) for k in SKEW_CONF}
    for k, v in SKEW_CONF.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(skew_conf):
    spark = skew_conf
    # key 0 carries 200k rows; every other key exactly one
    left = spark.range(300_000).select(
        F.when(F.col("id") < 200_000, 0).otherwise(F.col("id")).alias("k"),
        F.concat(F.lit("payload_"), F.col("id")).alias("v"),
    )
    right = spark.range(100_000).select(
        F.col("id").alias("k"), F.lit("r").alias("rv")
    )
    joined = left.join(right, "k")
    rows = joined.count()
    # run the same plan object so its adaptive final plan is inspectable
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # only the hot key matches the right side (left tail keys are >= 200k)
    assert rows == 200_000
    assert "skew=true" in set(re.findall(r"skew=\w+", plan)), (
        "AQE did not mark the skewed join; plan:\n" + plan[:2000]
    )


def test_aqe_coalesces_small_partitions(skew_conf):
    spark = skew_conf
    # 32 shuffle partitions configured, but the data is tiny: AQE should
    # coalesce the post-shuffle partition count well below the static
    # setting (this is the knob that keeps small reducers from dominating
    # task-scheduling overhead at the 100 TB design point's stage tails)
    df = (
        spark.range(10_000)
        .groupBy((F.col("id") % 7).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    df.collect()
    n_parts = df.rdd.getNumPartitions()
    static = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert n_parts < static
