"""Streaming tile ingestion: manifests arrive, tiles are converted; the
checkpoint makes a second drain a no-op (no reprocessing)."""

import numpy as np

from aind_exaspim_data_transformation_spark.config import ConvertJobSettings
from aind_exaspim_data_transformation_spark.sources.tensor import (
    write_npy_pyramid,
)
from aind_exaspim_data_transformation_spark.streaming.ingest import run_ingest
from aind_exaspim_data_transformation_spark.zarrio.format import (
    read_array_region,
)


def test_ingest_converts_new_tiles_once(spark, tmp_path):
    rng = np.random.default_rng(3)
    manifest_dir = tmp_path / "manifests"
    manifest_dir.mkdir()
    out_root = str(tmp_path / "stores")
    arrays = {}
    for i in range(2):
        name = f"tile_{i:06d}"
        arr = rng.integers(0, 65535, size=(40, 40, 40), dtype=np.uint16)
        src = str(tmp_path / name)
        write_npy_pyramid(src, arr, n_levels=1)
        (manifest_dir / f"{name}.manifest").write_text(src + "\n")
        arrays[name] = (src, arr)

    settings = ConvertJobSettings(
        input_source="ignored",
        output_location="ignored",
        chunk_shape=(16, 16, 16),
        shard_shape=(32, 32, 32),
    )
    results = run_ingest(spark, str(manifest_dir), out_root, settings)
    assert sum(r["n_tiles"] for r in results) == 2
    for name, (src, arr) in arrays.items():
        got = read_array_region(
            f"{out_root}/{name}.zarr",
            0,
            (slice(0, 1), slice(0, 1), slice(0, 40), slice(0, 40),
             slice(0, 40)),
        )[0, 0]
        np.testing.assert_array_equal(got, arr)

    # second drain: checkpoint remembers processed manifests -> no work
    results2 = run_ingest(spark, str(manifest_dir), out_root, settings)
    assert results2 == []

    # a NEW manifest triggers exactly one more conversion
    name = "tile_000002"
    arr = rng.integers(0, 65535, size=(40, 40, 40), dtype=np.uint16)
    src = str(tmp_path / name)
    write_npy_pyramid(src, arr, n_levels=1)
    (manifest_dir / f"{name}.manifest").write_text(src + "\n")
    results3 = run_ingest(spark, str(manifest_dir), out_root, settings)
    assert sum(r["n_tiles"] for r in results3) == 1
