"""Six-mode 3-D downsample kernel (SURVEY §2A A1).

Block-local numpy reduction used inside the writer UDF — the partial half
of Spark's partial+final aggregation pattern: each task reduces its own
input region, only reduced voxels ever move.

Semantics match the reference's TensorStore ``downsample`` driver modes
(reference compress/imaris_to_zarr.py:562-570; models.py:79-85):
``stride, median, mode, mean, min, max`` with ceil-division output shapes
and truncated edge windows (windows at the array edge reduce only the
voxels that exist). ``mode`` ties break to the smallest value; ``mean``
on integer inputs rounds half to even (numpy) before casting back.
"""

from __future__ import annotations

import math

import numpy as np

DOWNSAMPLE_MODES = ("stride", "median", "mode", "mean", "min", "max")


def downsampled_shape(
    shape: tuple[int, ...], factor: tuple[int, ...]
) -> tuple[int, ...]:
    """ceil(shape / factor) per axis (reference
    compress/imaris_to_zarr.py:56-87)."""
    if len(shape) != len(factor):
        raise ValueError("shape/factor arity mismatch")
    return tuple(math.ceil(s / f) for s, f in zip(shape, factor))


def _stacked_windows(arr: np.ndarray, factor: tuple[int, int, int]):
    """(oz, oy, ox, fz*fy*fx) float64 window stack, NaN-padded at edges."""
    fz, fy, fx = factor
    oz, oy, ox = downsampled_shape(arr.shape, factor)
    padded = np.full(
        (oz * fz, oy * fy, ox * fx), np.nan, dtype=np.float64
    )
    padded[: arr.shape[0], : arr.shape[1], : arr.shape[2]] = arr
    windows = padded.reshape(oz, fz, oy, fy, ox, fx)
    return windows.transpose(0, 2, 4, 1, 3, 5).reshape(oz, oy, ox, -1)


def _mode_reduce(stack: np.ndarray) -> np.ndarray:
    """Most-frequent value per window; ties -> smallest value. NaN padding
    sorts to the end and is excluded by run-length bookkeeping."""
    s = np.sort(stack, axis=-1)  # NaNs last
    n = s.shape[-1]
    best_val = s[..., 0].copy()
    best_cnt = np.ones(s.shape[:-1], dtype=np.int64)
    cur_cnt = np.ones_like(best_cnt)
    for i in range(1, n):
        cur = s[..., i]
        prev = s[..., i - 1]
        is_run = cur == prev  # False for NaN
        cur_cnt = np.where(is_run, cur_cnt + 1, 1)
        better = is_run & (cur_cnt > best_cnt)
        best_cnt = np.where(better, cur_cnt, best_cnt)
        best_val = np.where(better, cur, best_val)
    return best_val


def _padded_reshape2(
    arr: np.ndarray, factor: tuple[int, int, int], fill
) -> np.ndarray:
    """The array padded to factor multiples with ``fill`` (identity-copy
    when already aligned), ready for grouped reshape reduces."""
    fz, fy, fx = factor
    oz, oy, ox = downsampled_shape(arr.shape, factor)
    if (oz * fz, oy * fy, ox * fx) == arr.shape:
        return arr  # aligned: no pad copy needed
    padded = np.full((oz * fz, oy * fy, ox * fx), fill, dtype=arr.dtype)
    padded[: arr.shape[0], : arr.shape[1], : arr.shape[2]] = arr
    return padded


def _grouped_reduce(padded, factor, ufunc, acc_dtype=None):
    """Reduce factor-grouped windows one strided-slice pass per axis,
    outer axis first.

    Equivalent to ``padded.reshape(oz,fz,oy,fy,ox,fx).op(axis=(1,3,5))``
    but ~10x faster on large blocks: ``x[i::f]`` slices keep unit inner
    stride so each ufunc pass streams at memory bandwidth, and the array
    shrinks f-fold before the next axis. With an integer ``acc_dtype``
    the sum is exact — identical to the float64-accumulated result
    whenever the per-window sum fits 2^53 (always, for <=32-bit voxels).
    """
    x = padded
    promote = acc_dtype is not None and x.dtype != acc_dtype
    for ax in range(3):
        f = factor[ax]
        if f == 1:
            continue
        sl = [slice(None)] * 3
        sl[ax] = slice(0, None, f)
        first = x[tuple(sl)]
        acc = first.astype(acc_dtype) if promote else first.copy()
        promote = False
        for i in range(1, f):
            sl[ax] = slice(i, None, f)
            ufunc(acc, x[tuple(sl)], out=acc)
        x = acc
    if promote:  # degenerate all-ones factor still needs the widening
        x = x.astype(acc_dtype)
    return x


def _window_counts(
    shape: tuple[int, int, int], factor: tuple[int, int, int]
) -> np.ndarray:
    """Actual voxels per (possibly truncated) window: outer product of
    per-axis edge-clamped extents."""
    per_axis = [
        np.minimum(f, d - np.arange(math.ceil(d / f)) * f)
        for d, f in zip(shape, factor)
    ]
    return (
        per_axis[0][:, None, None]
        * per_axis[1][None, :, None]
        * per_axis[2][None, None, :]
    ).astype(np.float64)


def downsample_block(
    arr: np.ndarray,
    factor: tuple[int, int, int] = (2, 2, 2),
    mode: str = "mean",
) -> np.ndarray:
    """Reduce each ``factor``-shaped window of a 3-D block to one voxel.

    mean/min/max use vectorized reshape reduces (zero/extreme padding +
    count-aware division — ~10x the NaN-stack path); median/mode keep the
    NaN-stacked formulation (they need the full window sample).
    """
    if mode not in DOWNSAMPLE_MODES:
        raise ValueError(f"mode must be one of {DOWNSAMPLE_MODES}")
    if arr.ndim != 3:
        raise ValueError("downsample_block expects a 3-D (Z, Y, X) array")
    dtype = arr.dtype
    if mode == "stride":
        return arr[:: factor[0], :: factor[1], :: factor[2]].copy()

    if mode == "mean":
        if np.issubdtype(dtype, np.integer):
            info = np.iinfo(dtype)
            bound = max(abs(int(info.min)), int(info.max)) * int(
                np.prod(factor)
            )
            acc = np.int32 if bound <= np.iinfo(np.int32).max else np.int64
        else:
            acc = np.float64
        sums = _grouped_reduce(
            _padded_reshape2(arr, factor, 0), factor, np.add, acc_dtype=acc
        )
        out = sums / _window_counts(arr.shape, factor)
    elif mode == "min":
        fill = (
            np.iinfo(dtype).max
            if np.issubdtype(dtype, np.integer)
            else np.inf
        )
        out = _grouped_reduce(
            _padded_reshape2(arr, factor, fill), factor, np.minimum
        )
    elif mode == "max":
        fill = (
            np.iinfo(dtype).min
            if np.issubdtype(dtype, np.integer)
            else -np.inf
        )
        out = _grouped_reduce(
            _padded_reshape2(arr, factor, fill), factor, np.maximum
        )
    else:
        stack = _stacked_windows(arr, factor)
        if mode == "median":
            out = np.nanmedian(stack, axis=-1)
        else:  # mode
            out = _mode_reduce(stack)
    if np.issubdtype(dtype, np.integer):
        out = np.rint(out)
    return out.astype(dtype)
