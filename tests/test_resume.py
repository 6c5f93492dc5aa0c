"""Resumability / retry-safety: partition subsetting covers the full task
list exactly once, and crash recovery (missing shards) heals on re-run."""

import os

import numpy as np
import pytest

from aind_exaspim_data_transformation_spark.config import ConvertJobSettings
from aind_exaspim_data_transformation_spark.sources.tensor import (
    write_npy_pyramid,
)
from aind_exaspim_data_transformation_spark.zarrio.format import (
    read_array_region,
)
from aind_exaspim_data_transformation_spark.zarrio.multitile import (
    convert_tiles_to_zarr,
)


@pytest.fixture(scope="module")
def tile(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("resume")
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 65535, size=(64, 64, 64), dtype=np.uint16)
    src = str(tmp / "tile")
    write_npy_pyramid(src, arr, n_levels=1)
    return src, arr


def _settings(store):
    return ConvertJobSettings(
        input_source="ignored",
        output_location="ignored",
        chunk_shape=(16, 16, 16),
        shard_shape=(32, 32, 32),
        translate_pyramid=True,
    )


def test_partition_subsets_cover_everything(spark, tile, tmp_path):
    src, arr = tile
    store = str(tmp_path / "parts.zarr")
    n_total = 0
    for p in range(3):  # three "array tasks", like a 3-wide SLURM array
        stats = convert_tiles_to_zarr(
            spark,
            [(src, store)],
            _settings(store),
            partition_to_process=p,
            num_partitions=3,
        )
        n_total += stats["n_shards"]
    assert n_total == 8  # (64/32)^3 — every shard written exactly once
    got = read_array_region(
        store, 0,
        (slice(0, 1), slice(0, 1), slice(0, 64), slice(0, 64), slice(0, 64)),
    )[0, 0]
    np.testing.assert_array_equal(got, arr)


def test_crash_recovery_rerun_heals_missing_shards(spark, tile, tmp_path):
    src, arr = tile
    store = str(tmp_path / "heal.zarr")
    convert_tiles_to_zarr(spark, [(src, store)], _settings(store))
    # simulate a partial failure: delete some shard files
    killed = 0
    for iz in (0, 1):
        path = os.path.join(store, "0", "c", "0", "0", str(iz), "0", "1")
        if os.path.exists(path):
            os.remove(path)
            killed += 1
    assert killed == 2
    # re-run (idempotent writes) — store is complete and correct again
    convert_tiles_to_zarr(spark, [(src, store)], _settings(store))
    got = read_array_region(
        store, 0,
        (slice(0, 1), slice(0, 1), slice(0, 64), slice(0, 64), slice(0, 64)),
    )[0, 0]
    np.testing.assert_array_equal(got, arr)
