"""Downsample kernel goldens (SURVEY §5 layer-2 analog: exact-value math
tests on pure operators, FIXTURES.md A3)."""

import numpy as np
import pytest

from aind_exaspim_data_transformation_spark.operators.downsample import (
    DOWNSAMPLE_MODES,
    downsample_block,
    downsampled_shape,
)


def test_downsampled_shape_goldens():
    assert downsampled_shape((768, 2688, 3584), (2, 2, 2)) == (384, 1344, 1792)
    assert downsampled_shape((5, 5, 5), (2, 2, 2)) == (3, 3, 3)
    assert downsampled_shape((1, 1, 1), (2, 2, 2)) == (1, 1, 1)
    with pytest.raises(ValueError, match="arity"):
        downsampled_shape((4, 4), (2, 2, 2))


def test_modes_on_arange_4x4x4():
    arr = np.arange(64, dtype=np.uint16).reshape(4, 4, 4)
    # window at parent (0,0,0): values {0,1,4,5,16,17,20,21}
    out = {m: downsample_block(arr, (2, 2, 2), m) for m in DOWNSAMPLE_MODES}
    for m in DOWNSAMPLE_MODES:
        assert out[m].shape == (2, 2, 2)
        assert out[m].dtype == np.uint16
    assert out["min"][0, 0, 0] == 0
    assert out["max"][0, 0, 0] == 21
    assert out["stride"][0, 0, 0] == 0
    assert out["stride"][1, 1, 1] == 42  # origin voxel of window (1,1,1)
    # mean of {0,1,4,5,16,17,20,21} = 10.5 -> rint half-to-even = 10
    assert out["mean"][0, 0, 0] == 10
    # median = (5+16)/2 = 10.5 -> 10
    assert out["median"][0, 0, 0] == 10
    # all-distinct window: mode ties break to the smallest value
    assert out["mode"][0, 0, 0] == 0


def test_modes_match_numpy_reference():
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 100, size=(8, 6, 4), dtype=np.uint16)
    got_mean = downsample_block(arr, (2, 2, 2), "mean")
    want = np.rint(
        arr.reshape(4, 2, 3, 2, 2, 2).astype(np.float64).mean(axis=(1, 3, 5))
    ).astype(np.uint16)
    np.testing.assert_array_equal(got_mean, want)
    got_max = downsample_block(arr, (2, 2, 2), "max")
    np.testing.assert_array_equal(
        got_max, arr.reshape(4, 2, 3, 2, 2, 2).max(axis=(1, 3, 5))
    )


def test_truncated_edge_windows_5x5x5():
    arr = np.arange(125, dtype=np.uint16).reshape(5, 5, 5)
    out = downsample_block(arr, (2, 2, 2), "mean")
    assert out.shape == (3, 3, 3)
    # corner window is the single voxel (4,4,4) = 124
    assert out[2, 2, 2] == 124
    # edge window (2,2,0..1): voxels (4,4,0),(4,4,1) -> mean 120.5 -> 120
    assert out[2, 2, 0] == 120
    m = downsample_block(arr, (2, 2, 2), "max")
    assert m[2, 2, 2] == 124
    s = downsample_block(arr, (2, 2, 2), "stride")
    assert s.shape == (3, 3, 3)
    assert s[2, 2, 2] == 124


def test_mode_prefers_most_frequent_then_smallest():
    arr = np.zeros((2, 2, 2), dtype=np.uint16)
    arr[0, 0, 0] = 7
    arr[0, 0, 1] = 7
    arr[0, 1, 0] = 7
    # 7 appears 3x, 0 appears 5x -> mode 0
    assert downsample_block(arr, (2, 2, 2), "mode")[0, 0, 0] == 0
    arr2 = np.array([[[1, 2], [1, 2]], [[3, 3], [4, 4]]], dtype=np.uint16)
    # counts: 1:2, 2:2, 3:2, 4:2 -> tie -> smallest = 1
    assert downsample_block(arr2, (2, 2, 2), "mode")[0, 0, 0] == 1


def test_factor_arity_and_mode_validation():
    arr = np.zeros((4, 4, 4), dtype=np.uint16)
    with pytest.raises(ValueError, match="mode must be"):
        downsample_block(arr, (2, 2, 2), "nearest")
    with pytest.raises(ValueError, match="3-D"):
        downsample_block(np.zeros((4, 4), dtype=np.uint16), (2, 2, 2), "mean")
