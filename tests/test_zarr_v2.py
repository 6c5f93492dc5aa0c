"""Zarr v2 legacy writer (X5) round trips + padded-shape walk goldens."""

import json

import numpy as np

from aind_exaspim_data_transformation_spark.config import ConvertJobSettings
from aind_exaspim_data_transformation_spark.sources.tensor import (
    true_shapes_from_padded,
    write_npy_pyramid,
)
from aind_exaspim_data_transformation_spark.zarrio.v2 import (
    V2Spec,
    convert_to_zarr_v2,
    decode_v2_chunk,
    encode_v2_chunk,
    read_v2_region,
)


def test_true_shapes_from_padded_regression():
    # Imaris pads to 64-multiples: metadata shape (100, 200, 300) padded
    # to (128, 256, 320); level 1 padded (64, 128, 192) -> true shape
    # scales by the padded ratio (reference regression
    # tests/test_imaris_job.py:1309-1387 semantics).
    shapes = true_shapes_from_padded(
        (100, 200, 300),
        [(128, 256, 320), (64, 128, 192), (64, 64, 128)],
    )
    assert shapes[0] == (100, 200, 300)
    assert shapes[1] == (50, 100, 180)  # 100*64/128, 200*128/256, 300*192/320
    assert shapes[2] == (50, 50, 120)
    assert true_shapes_from_padded((7, 7, 7), []) == [(7, 7, 7)]
    # never collapses below 1
    assert true_shapes_from_padded((1, 1, 1), [(64, 64, 64), (64, 64, 64)])[
        1
    ] == (1, 1, 1)


def test_v2_chunk_roundtrip_and_padding():
    spec = V2Spec(shape=(1, 1, 40, 40, 40), chunks=(1, 1, 16, 16, 16))
    rng = np.random.default_rng(5)
    full = rng.integers(0, 65535, size=(1, 1, 16, 16, 16), dtype=np.uint16)
    assert (decode_v2_chunk(encode_v2_chunk(full, spec), spec) == full).all()
    edge = full[:, :, :8, :16, :12]
    out = decode_v2_chunk(encode_v2_chunk(edge, spec), spec)
    assert (out[:, :, :8, :16, :12] == edge).all()
    assert (out[:, :, 8:, :, :] == 0).all()


def test_convert_to_zarr_v2_store(spark, tmp_path):
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 65535, size=(40, 50, 60), dtype=np.uint16)
    src = str(tmp_path / "tile")
    write_npy_pyramid(src, arr, n_levels=2)
    store = str(tmp_path / "legacy.zarr")
    result = convert_to_zarr_v2(
        spark,
        ConvertJobSettings(
            input_source=src,
            output_location=store,
            chunk_shape=(16, 16, 16),
            # v2 has no zstd in this environment: the writer maps any
            # codec onto zlib at codec_level — pin the legacy pairing
            codec="gzip",
            codec_level=1,
        ),
    )
    assert result["n_levels"] == 2
    # .zarray metadata is spec-conformant
    zarray = json.load(open(f"{store}/0/.zarray"))
    assert zarray["zarr_format"] == 2
    assert zarray["dtype"] == "<u2"
    assert zarray["compressor"] == {"id": "zlib", "level": 1}
    assert json.load(open(f"{store}/.zgroup")) == {"zarr_format": 2}
    # voxel round trip on both levels
    spec0 = V2Spec(shape=(1, 1, 40, 50, 60), chunks=(1, 1, 16, 16, 16))
    got = read_v2_region(
        store, 0,
        (slice(0, 1), slice(0, 1), slice(0, 40), slice(0, 50), slice(0, 60)),
        spec0,
    )[0, 0]
    np.testing.assert_array_equal(got, arr)
