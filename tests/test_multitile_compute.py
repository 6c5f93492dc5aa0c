"""Shard-mode multi-tile conversion with a COMPUTED pyramid (global
level-0 action + per-level downsample stages per tile)."""

import numpy as np
import pytest

from aind_exaspim_data_transformation_spark.config import ConvertJobSettings
from aind_exaspim_data_transformation_spark.operators.downsample import (
    downsample_block,
)
from aind_exaspim_data_transformation_spark.sources.tensor import (
    write_npy_pyramid,
)
from aind_exaspim_data_transformation_spark.zarrio.format import (
    read_array_region,
)
from aind_exaspim_data_transformation_spark.zarrio.multitile import (
    convert_tiles_to_zarr,
)


def test_shard_mode_computed_pyramid(spark, tmp_path):
    rng = np.random.default_rng(2)
    tiles, arrays = [], {}
    for i in range(2):
        arr = rng.integers(0, 65535, size=(50, 40, 30), dtype=np.uint16)
        src = str(tmp_path / f"tile{i}")
        write_npy_pyramid(src, arr, n_levels=1)
        tiles.append((src, str(tmp_path / f"store{i}.zarr")))
        arrays[src] = arr
    result = convert_tiles_to_zarr(
        spark,
        tiles,
        ConvertJobSettings(
            input_source="ignored",
            output_location="ignored",
            chunk_shape=(16, 16, 16),
            shard_shape=(16, 16, 16),
            translate_pyramid=False,
            downsample_levels=3,
            downsample_mode="mean",
        ),
    )
    assert len(result["downsample_stages"]) == 4  # 2 tiles x levels 1,2
    for src, store in tiles:
        want1 = downsample_block(arrays[src], (2, 2, 2), "mean")
        got1 = read_array_region(
            store, 1,
            (slice(0, 1), slice(0, 1), slice(0, 25), slice(0, 20),
             slice(0, 15)),
        )[0, 0]
        np.testing.assert_array_equal(got1, want1)
        want2 = downsample_block(want1, (2, 2, 2), "mean")
        got2 = read_array_region(
            store, 2,
            (slice(0, 1), slice(0, 1), slice(0, 13), slice(0, 10),
             slice(0, 8)),
        )[0, 0]
        np.testing.assert_array_equal(got2, want2)
