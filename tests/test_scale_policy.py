"""Scale-sweep infeasibility policy + input-sized shuffle partitions
(round-10 verdict, Next #3 and #7)."""

from aind_exaspim_data_transformation_spark.queries.registry import (
    SCALE_LIMITS,
)
from aind_exaspim_data_transformation_spark.session import (
    BYTES_PER_SHUFFLE_PARTITION,
    shuffle_partitions_for_bytes,
)


def test_shuffle_partitions_floor_is_core_count():
    assert shuffle_partitions_for_bytes(0, cpus=32) == 32
    assert shuffle_partitions_for_bytes(10, cpus=32) == 32
    # anything at or below cpus * 32MB stays at the parallelism floor
    assert (
        shuffle_partitions_for_bytes(32 * BYTES_PER_SHUFFLE_PARTITION, 32)
        == 32
    )


def test_shuffle_partitions_scale_linearly_with_input():
    # the sf30 case: ~6 GB of parquet -> the 128-256 band the q09
    # measurement (18.9 s @ 32 -> 13.8 s @ 128) identified
    n = shuffle_partitions_for_bytes(6_000_000_000, cpus=32)
    assert 128 <= n <= 256
    # exact ceil semantics
    assert shuffle_partitions_for_bytes(
        BYTES_PER_SHUFFLE_PARTITION * 100 + 1, cpus=32
    ) == 101


def test_get_spark_applies_target_input_bytes(spark):
    from aind_exaspim_data_transformation_spark.session import get_spark

    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        s = get_spark(target_input_bytes=6_000_000_000, cpus=32)
        assert s.conf.get("spark.sql.shuffle.partitions") == str(
            shuffle_partitions_for_bytes(6_000_000_000, 32)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_uncapped_lsh_is_tagged_infeasible_above_sf10():
    limit, reason = SCALE_LIMITS["q_minhash_lsh_pairs"]
    assert limit == 10
    assert "capped" in reason  # points the reader at the production row
    # the production rows must NOT be tagged
    assert "q_minhash_lsh_pairs_capped" not in SCALE_LIMITS
    assert "q_dedup_clusters" not in SCALE_LIMITS


def test_sweep_sf_parsing():
    import sys
    sys.path.insert(0, "tools")
    from scale_sweep import _sf_of

    assert _sf_of("/root/testdata/sf0.01") == 0.01
    assert _sf_of(".localdata/sf30/") == 30
    assert _sf_of("/data/foo") is None
