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


def test_chunked_negative_slices_match_numpy(tmp_path):
    """Negative slice bounds normalize per slice.indices — numpy/h5py
    semantics, same as the contiguous memmap path (ds[-5:] is the tail,
    never a fill-padded over-long result)."""
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 255, (20, 17, 23), np.uint8)
    f = _roundtrip(
        tmp_path, arr, {"chunks": (6, 5, 9), "compression": "gzip"}
    )
    ds = f["d"]
    for sl in [
        (slice(-5, None), slice(None), slice(None)),
        (slice(None, -3), slice(-10, -2), slice(None)),
        (slice(-100, None), slice(None, 100), slice(-23, 23)),
        (slice(-1, None), slice(-1, None), slice(-1, None)),
        (slice(5, -5), slice(-17, 17), slice(-4, -8)),  # empty last axis
    ]:
        np.testing.assert_array_equal(ds[sl], arr[sl])
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


def test_shuffle_bytes_roundtrip_and_layout():
    """shuffle = byte de-interleave: byte k of every element becomes
    contiguous; inverse restores; odd tail bytes pass through."""
    raw = bytes([0x11, 0xAA, 0x22, 0xBB, 0x33, 0xCC])
    shuf = minihdf5.shuffle_bytes(raw, 2)
    assert shuf == bytes([0x11, 0x22, 0x33, 0xAA, 0xBB, 0xCC])
    assert minihdf5.unshuffle_bytes(shuf, 2) == raw
    # non-multiple tail survives
    raw7 = raw + b"\x7f"
    assert minihdf5.unshuffle_bytes(minihdf5.shuffle_bytes(raw7, 2), 2) == raw7
    # itemsize 1 is the identity
    assert minihdf5.shuffle_bytes(raw, 1) == raw


@pytest.mark.parametrize("compression", ["gzip", None])
def test_chunked_shuffle_roundtrip(tmp_path, compression):
    """shuffle(+deflate) chunks decode in reverse pipeline order —
    the pairing real microscopy HDF5 uses (reference reads it via h5py
    transparently, utils/io_utils.py:122-151)."""
    rng = np.random.default_rng(21)
    arr = rng.integers(0, 65535, (13, 10, 7), np.uint16)
    f = _roundtrip(
        tmp_path,
        arr,
        {"chunks": (8, 8, 8), "compression": compression, "shuffle": True},
    )
    ds = f["d"]
    assert [fid for fid, _, _ in ds._filters] == (
        [minihdf5.FILTER_SHUFFLE, minihdf5.FILTER_DEFLATE]
        if compression
        else [minihdf5.FILTER_SHUFFLE]
    )
    np.testing.assert_array_equal(ds[:, :, :], arr)
    np.testing.assert_array_equal(ds[3:11, 2:10, 1:7], arr[3:11, 2:10, 1:7])
    f.close()


def test_shuffle_helps_compression(tmp_path):
    """Sanity: on smooth uint16 data, shuffle+gzip beats plain gzip
    (the reason the filter pairing is the field default)."""
    arr = (np.arange(16 * 16 * 16, dtype=np.uint16) // 7).reshape(16, 16, 16)
    plain = str(tmp_path / "p.h5")
    shuf = str(tmp_path / "s.h5")
    minihdf5.write_file(
        plain, {"d": (arr, {"chunks": (16, 16, 16), "compression": "gzip"})}
    )
    minihdf5.write_file(
        shuf,
        {
            "d": (
                arr,
                {
                    "chunks": (16, 16, 16),
                    "compression": "gzip",
                    "shuffle": True,
                },
            )
        },
    )
    import os

    assert os.path.getsize(shuf) < os.path.getsize(plain)


def test_unsupported_filter_error_names_id(tmp_path):
    """Anything beyond deflate/shuffle raises with the filter id and
    the supported set in the message."""
    rng = np.random.default_rng(22)
    arr = rng.integers(0, 65535, (8, 8, 8), np.uint16)
    f = _roundtrip(tmp_path, arr, {"chunks": (8, 8, 8)})
    ds = f["d"]
    ds._filters = [(3, 0, ())]  # fletcher32
    with pytest.raises(ValueError, match="unsupported filter id 3"):
        ds[:, :, :]
    f.close()


def test_h5py_cross_check_shuffle(tmp_path):
    """h5py (when present) must read shuffle+gzip files back exactly and
    report the shuffle property — the pipeline message is conformant."""
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(23)
    arr = rng.integers(0, 65535, (13, 10, 7), np.uint16)
    path = str(tmp_path / "shuf.h5")
    minihdf5.write_file(
        path,
        {
            "d": (
                arr,
                {"chunks": (8, 8, 8), "compression": "gzip", "shuffle": True},
            )
        },
    )
    with h5py.File(path, "r") as f:
        np.testing.assert_array_equal(f["d"][:], arr)
        assert f["d"].shuffle is True


def test_zero_size_chunked_dataset_roundtrip(tmp_path):
    """A chunked dataset with a zero-size dim has NO chunks: the writer
    must emit the undefined B-tree address (it used to spin forever in
    _chunk_btree) and the reader must yield an empty index."""
    import numpy as np

    from aind_exaspim_data_transformation_spark.sources.minihdf5 import (
        File,
        write_file,
    )

    p = str(tmp_path / "zero.h5")
    write_file(p, {"d": (np.zeros((0, 4), np.uint16), {"chunks": (2, 2)})})
    d = File(p)["d"]
    assert d.shape == (0, 4)
    assert d._chunk_index() == {}


def test_group_with_sixteen_links_conforms_to_leaf_k(tmp_path):
    """The superblock declares Group Leaf Node K=8 (2K=16 symbols per
    node), so a 16-link group — the writer's cap — is exactly one full
    conformant SNOD. Reader roundtrip + declared-K check."""
    import struct

    import numpy as np

    from aind_exaspim_data_transformation_spark.sources.minihdf5 import (
        File,
        write_file,
    )

    p = str(tmp_path / "wide.h5")
    tree = {f"d{i:02d}": np.full((2,), i, np.uint16) for i in range(16)}
    write_file(p, tree)
    with open(p, "rb") as f:
        sb = f.read(96)
    leaf_k, internal_k = struct.unpack_from("<HH", sb, 16)
    assert leaf_k == 8 and internal_k == 16
    f = File(p)
    for i in range(16):
        assert f[f"d{i:02d}"][...].tolist() == [i, i]
