"""Crash-mid-stream + restart-from-checkpoint for streaming ingest.

The exactly-once story for ``streaming/ingest.py`` rests on two legs:
Structured Streaming's checkpoint (a batch whose sink raised is NOT
committed and replays on restart) and idempotent shard writes (same
key -> same bytes, atomic rename), so the replay's rewrites are
harmless. This test injects a crash after the first tile of a batch
has been converted, restarts from the same checkpoint, and proves:

- no missing effects: the replayed batch converts every tile;
- no duplicate effects: the tile converted before the crash is
  rewritten byte-identically (store hash unchanged), and each tile
  ends with exactly one store matching its source voxels;
- the batch is then committed: a further drain is a no-op.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pytest

import aind_exaspim_data_transformation_spark.streaming.ingest as ingest
from aind_exaspim_data_transformation_spark.config import ConvertJobSettings
from aind_exaspim_data_transformation_spark.sources.tensor import (
    write_npy_pyramid,
)
from aind_exaspim_data_transformation_spark.zarrio.format import (
    read_array_region,
)


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


def test_crash_mid_batch_then_restart_is_exactly_once(
    spark, tmp_path, monkeypatch
):
    rng = np.random.default_rng(11)
    manifest_dir = tmp_path / "manifests"
    manifest_dir.mkdir()
    out_root = str(tmp_path / "stores")
    checkpoint = str(tmp_path / "checkpoint")
    arrays = {}
    for i in range(2):
        name = f"tile_{i:06d}"
        arr = rng.integers(0, 65535, size=(40, 40, 40), dtype=np.uint16)
        src = str(tmp_path / name)
        write_npy_pyramid(src, arr, n_levels=1)
        (manifest_dir / f"{name}.manifest").write_text(src + "\n")
        arrays[name] = arr

    settings = ConvertJobSettings(
        input_source="ignored",
        output_location="ignored",
        chunk_shape=(16, 16, 16),
        shard_shape=(32, 32, 32),
    )

    # Crash injection: convert only the FIRST tile of the batch, then
    # die — partial side effects exist, but the batch never commits.
    real_convert = ingest.convert_tiles_to_zarr

    def crashing_convert(spark_, tiles, settings_):
        real_convert(spark_, sorted(tiles)[:1], settings_)
        raise RuntimeError("injected crash after partial batch effects")

    monkeypatch.setattr(ingest, "convert_tiles_to_zarr", crashing_convert)
    with pytest.raises(Exception, match="injected crash"):
        ingest.run_ingest(
            spark, str(manifest_dir), out_root, settings, checkpoint
        )
    monkeypatch.setattr(ingest, "convert_tiles_to_zarr", real_convert)

    # Partial state: tile 0's store exists, tile 1's does not.
    store0 = f"{out_root}/tile_000000.zarr"
    store1 = f"{out_root}/tile_000001.zarr"
    assert os.path.isdir(store0)
    assert not os.path.isdir(store1)
    h0_before = _tree_hash(store0)

    # Restart from the same checkpoint: the uncommitted batch replays
    # in full (no missing effects) ...
    results = ingest.run_ingest(
        spark, str(manifest_dir), out_root, settings, checkpoint
    )
    assert sum(r["n_tiles"] for r in results) == 2

    # ... and the pre-crash tile's rewrite was byte-identical (no
    # duplicate effects, the idempotence leg).
    assert _tree_hash(store0) == h0_before

    for name, arr in arrays.items():
        got = read_array_region(
            f"{out_root}/{name}.zarr",
            0,
            (
                slice(0, 1),
                slice(0, 1),
                slice(0, 40),
                slice(0, 40),
                slice(0, 40),
            ),
        )[0, 0]
        np.testing.assert_array_equal(got, arr)

    # The replayed batch is now committed: nothing left to do.
    assert (
        ingest.run_ingest(
            spark, str(manifest_dir), out_root, settings, checkpoint
        )
        == []
    )
