"""Fused pyramid cascade vs the per-level store-read loop.

The cascade (zarrio/pipeline.py: `_run_cascade`) computes every pyramid
level inside ONE Spark job — the level-0 writer reduces each source
block recursively and ships compressed partials through a single
shuffle. It must be a pure optimization: for any shape / mode / depth
the resulting store must be BYTE-identical to the sequential
level-loop (which is itself golden-tested against the reference's
downsample semantics), because the deterministic-shard-bytes guarantee
(gzip mtime=0 / fixed zstd frames) is what makes re-runs idempotent.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import pytest

from aind_exaspim_data_transformation_spark.config import ConvertJobSettings
import aind_exaspim_data_transformation_spark.zarrio.pipeline as pipeline


def _tree_hash(root: str) -> dict[str, str]:
    out = {}
    for dirpath, _, files in os.walk(root):
        for fn in files:
            p = os.path.join(dirpath, fn)
            with open(p, "rb") as f:
                out[os.path.relpath(p, root)] = hashlib.md5(
                    f.read()
                ).hexdigest()
    return out


def _convert(spark, out, shape, mode, levels, force_loop):
    orig = pipeline._cascade_divisible
    if force_loop:
        pipeline._cascade_divisible = lambda *a: False
    try:
        return pipeline.convert_to_zarr(
            spark,
            ConvertJobSettings(
                input_source=f"synth://{shape},1",
                output_location=out,
                chunk_shape=(32, 32, 32),
                shard_shape=(64, 64, 64),
                translate_pyramid=False,
                downsample_levels=levels,
                downsample_mode=mode,
                codec="zstd",
                codec_level=3,
            ),
        )
    finally:
        pipeline._cascade_divisible = orig


@pytest.mark.parametrize(
    "shape,mode,levels",
    [
        ("300,260,200", "mean", 3),  # edge truncation on every axis
        ("300,260,200", "max", 3),
        ("256,256,256", "mean", 4),  # deeper than shard/f^2 alignment
        ("130,70,50", "median", 2),  # sub-shard dims
    ],
)
def test_cascade_matches_loop_bytes(spark, shape, mode, levels):
    with tempfile.TemporaryDirectory() as tmp:
        a = os.path.join(tmp, "cascade.zarr")
        b = os.path.join(tmp, "loop.zarr")
        ra = _convert(spark, a, shape, mode, levels, force_loop=False)
        rb = _convert(spark, b, shape, mode, levels, force_loop=True)
        assert _tree_hash(a) == _tree_hash(b)
        # The cascade reports one stats stage per level, like the loop.
        assert len(ra["stages"]) == len(rb["stages"]) == levels
        for sa, sb in zip(ra["stages"], rb["stages"]):
            assert sa["n_shards"] == sb["n_shards"]
            assert sa["bytes_written"] == sb["bytes_written"]


def test_cascade_used_for_pow2_grid(spark):
    """The divisibility gate: 64^3 shards, factor 2, 3 levels -> fused;
    a shard grid that can't hold factor^depth alignment -> loop."""
    specs3 = {
        0: type("S", (), {"shard_shape": (1, 1, 64, 64, 64)})(),
    }
    assert pipeline._cascade_divisible(specs3, (2, 2, 2), 3)
    specs_odd = {
        0: type("S", (), {"shard_shape": (1, 1, 48, 48, 48)})(),
    }
    assert not pipeline._cascade_divisible(specs_odd, (2, 2, 2), 6)
    assert not pipeline._cascade_divisible(specs_odd, (3, 3, 3), 3)


def test_cascade_idempotent_rerun(spark):
    """Re-running the cascade over an existing store rewrites identical
    bytes (the retry/speculation safety the loop path guarantees)."""
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "s.zarr")
        _convert(spark, out, "200,130,70", "mean", 3, force_loop=False)
        h1 = _tree_hash(out)
        _convert(spark, out, "200,130,70", "mean", 3, force_loop=False)
        assert _tree_hash(out) == h1


def test_multitile_cascade_matches_loop_bytes(spark, tmp_path, monkeypatch):
    """The multi-tile fused cascade must write byte-identical stores to
    the per-level loop for every tile, including edge-truncated grids."""
    import numpy as np

    import aind_exaspim_data_transformation_spark.zarrio.multitile as mt
    from aind_exaspim_data_transformation_spark.sources.tensor import (
        write_npy_pyramid,
    )

    rng = np.random.default_rng(5)
    sources = []
    for i, shape in enumerate([(20, 14, 10), (16, 16, 16), (9, 9, 9)]):
        arr = rng.integers(0, 65535, size=shape, dtype=np.uint16)
        src = str(tmp_path / f"cmp_tile{i}")
        write_npy_pyramid(src, arr, n_levels=1)
        sources.append(src)

    def run(tag, force_loop):
        tiles = [
            (src, str(tmp_path / f"{tag}_store{i}.zarr"))
            for i, src in enumerate(sources)
        ]
        if force_loop:
            monkeypatch.setattr(
                mt, "_mt_cascade_applicable", lambda *a: False
            )
        else:
            monkeypatch.undo()
        mt.convert_tiles_to_zarr(
            spark,
            tiles,
            ConvertJobSettings(
                input_source="ignored",
                output_location="ignored",
                chunk_shape=(8, 8, 8),
                shard_shape=(8, 8, 8),
                translate_pyramid=False,
                downsample_levels=3,
                downsample_mode="mean",
            ),
        )
        return {
            i: _tree_hash(store) for i, (_, store) in enumerate(tiles)
        }

    cascade = run("casc", force_loop=False)
    loop = run("loop", force_loop=True)
    assert cascade == loop
    assert all(len(h) > 3 for h in cascade.values())
