"""Chunked-layout HDF5 decode (round-2 verdict item 2): v1 chunk B-tree
(node type 1, multi-level) + deflate filter in sources/minihdf5.py, so a
production-shaped .ims (chunked, gzip'd datasets — the layout the
reference's native-chunk logic assumes, utils/io_utils.py:96-99,
171-175) is readable without h5py."""

import numpy as np
import pytest

from aind_exaspim_data_transformation_spark.config import ConvertJobSettings
from aind_exaspim_data_transformation_spark.sources import minihdf5
from aind_exaspim_data_transformation_spark.sources.tensor import (
    Hdf5ImarisSource,
    write_imaris_file,
)
from aind_exaspim_data_transformation_spark.zarrio.format import (
    read_array_region,
)
from aind_exaspim_data_transformation_spark.zarrio.pipeline import (
    convert_to_zarr,
)


def _roundtrip(tmp_path, arr, opts, name="f.h5"):
    path = str(tmp_path / name)
    minihdf5.write_file(path, {"d": (arr, opts)})
    return minihdf5.File(path, "r")


def test_chunked_full_read(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 65535, (16, 16, 16), np.uint16)
    f = _roundtrip(tmp_path, arr, {"chunks": (8, 8, 8)})
    ds = f["d"]
    assert isinstance(ds, minihdf5.ChunkedDataset)
    assert ds.shape == (16, 16, 16) and ds.dtype == np.uint16
    np.testing.assert_array_equal(ds[:, :, :], arr)
    f.close()


def test_chunked_gzip_edge_chunks(tmp_path):
    """Non-divisible shape: edge chunks are stored full-size (padded)
    and must be clipped on read; gzip filter decodes per chunk."""
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 65535, (13, 10, 7), np.uint16)
    f = _roundtrip(
        tmp_path, arr, {"chunks": (8, 8, 8), "compression": "gzip"}
    )
    ds = f["d"]
    np.testing.assert_array_equal(ds[:, :, :], arr)
    # partial slabs crossing chunk boundaries
    np.testing.assert_array_equal(ds[3:11, 2:10, 1:7], arr[3:11, 2:10, 1:7])
    np.testing.assert_array_equal(ds[12:13, 9:10, 6:7], arr[12:13, 9:10, 6:7])
    f.close()


def test_chunked_hyperslabs_match_numpy(tmp_path):
    """Random hyperslabs over a gzip'd chunked dataset == numpy slicing."""
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 255, (20, 17, 23), np.uint8)
    f = _roundtrip(
        tmp_path, arr, {"chunks": (6, 5, 9), "compression": "gzip"}
    )
    ds = f["d"]
    for _ in range(25):
        z0, y0, x0 = (int(rng.integers(0, s)) for s in arr.shape)
        z1 = int(rng.integers(z0 + 1, arr.shape[0] + 1))
        y1 = int(rng.integers(y0 + 1, arr.shape[1] + 1))
        x1 = int(rng.integers(x0 + 1, arr.shape[2] + 1))
        np.testing.assert_array_equal(
            ds[z0:z1, y0:y1, x0:x1], arr[z0:z1, y0:y1, x0:x1]
        )
    f.close()


def test_multilevel_chunk_btree(tmp_path):
    """>64 chunks forces a second B-tree level (the writer splits leaves
    at libhdf5's default fan-out); the walk must recurse."""
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 65535, (20, 20, 20), np.uint16)
    f = _roundtrip(tmp_path, arr, {"chunks": (4, 4, 4)})  # 125 chunks
    ds = f["d"]
    index = ds._chunk_index()
    assert len(index) == 125
    # root must be an internal node (level 1): two+ leaves of <=64
    level = f._raw[ds._btree_addr + 5]
    assert level == 1
    np.testing.assert_array_equal(ds[:, :, :], arr)
    np.testing.assert_array_equal(ds[7:15, 3:19, 0:4], arr[7:15, 3:19, 0:4])
    f.close()


def test_chunked_imaris_source_and_conversion(spark, tmp_path):
    """A production-shaped .ims (chunked + gzip Data datasets) flows
    through Hdf5ImarisSource and the full Zarr conversion."""
    rng = np.random.default_rng(5)
    l0 = np.zeros((16, 16, 16), np.uint16)
    l0[:10, :12, :14] = rng.integers(0, 65535, (10, 12, 14), np.uint16)
    l1 = np.zeros((8, 8, 8), np.uint16)
    l1[:5, :6, :7] = rng.integers(0, 65535, (5, 6, 7), np.uint16)
    path = str(tmp_path / "tile_000000_ch_488.ims")
    write_imaris_file(
        path, [l0, l1], meta_shape=(10, 12, 14),
        chunks=(8, 8, 8), compression="gzip",
    )
    src = Hdf5ImarisSource(path)
    assert src.meta.shapes == [(10, 12, 14), (5, 6, 7)]
    np.testing.assert_array_equal(
        src.read_block(0, 2, 9, 0, 12, 3, 14), l0[2:9, 0:12, 3:14]
    )
    src.close()

    store = str(tmp_path / "out.zarr")
    convert_to_zarr(
        spark,
        ConvertJobSettings(
            input_source=path,
            output_location=store,
            chunk_shape=(8, 8, 8),
            shard_shape=(8, 8, 8),
            translate_pyramid=True,
        ),
    )
    got = read_array_region(
        store, 0,
        (slice(0, 1), slice(0, 1), slice(0, 10), slice(0, 12), slice(0, 14)),
    )[0, 0]
    np.testing.assert_array_equal(got, l0[:10, :12, :14])


def test_h5py_cross_check_chunked(tmp_path):
    """h5py (when present) must read the chunked+gzip'd file back
    byte-identically — the writer emits spec-conformant chunk B-trees
    and filter pipelines."""
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(6)
    arr = rng.integers(0, 65535, (13, 10, 7), np.uint16)
    path = str(tmp_path / "x.h5")
    minihdf5.write_file(
        path, {"d": (arr, {"chunks": (8, 8, 8), "compression": "gzip"})}
    )
    with h5py.File(path, "r") as f:
        np.testing.assert_array_equal(f["d"][:], arr)
        assert f["d"].chunks == (8, 8, 8)
        assert f["d"].compression == "gzip"
