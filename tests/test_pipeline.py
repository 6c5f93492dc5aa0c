"""End-to-end conversion pipeline tests (SURVEY §7 M1/M2): tensor source ->
shard-task DataFrame -> writer UDF -> Zarr v3 store, verified by exact
voxel round trips against the source."""

import json
import os

import numpy as np
import pytest

from aind_exaspim_data_transformation_spark.config import ConvertJobSettings
from aind_exaspim_data_transformation_spark.operators.downsample import (
    downsample_block,
)
from aind_exaspim_data_transformation_spark.sources.tensor import (
    SyntheticSource,
    open_source,
    write_npy_pyramid,
)
from aind_exaspim_data_transformation_spark.zarrio.format import (
    read_array_region,
)
from aind_exaspim_data_transformation_spark.zarrio.pipeline import (
    convert_to_zarr,
)


@pytest.fixture(scope="module")
def pyramid_src(tmp_path_factory):
    rng = np.random.default_rng(42)
    level0 = rng.integers(0, 65535, size=(64, 80, 96), dtype=np.uint16)
    path = str(tmp_path_factory.mktemp("src") / "tile_000000_ch_488")
    write_npy_pyramid(path, level0, n_levels=3, voxel_size=(1.0, 0.748, 0.748))
    return path, level0


def test_translate_pyramid_roundtrip(spark, pyramid_src, tmp_path):
    src_path, level0 = pyramid_src
    store = str(tmp_path / "out.zarr")
    settings = ConvertJobSettings(
        input_source=src_path,
        output_location=store,
        chunk_shape=(16, 16, 16),
        shard_shape=(32, 32, 32),
        translate_pyramid=True,
    )
    result = convert_to_zarr(spark, settings)
    assert result["n_levels"] == 3
    # level counts: L0 (64,80,96)/32 -> 18; L1 (32,40,48)/32 -> 4;
    # L2 (16,20,24): shard clamps to 16^3 (chunk multiple) -> 1*2*2 = 4.
    assert result["stages"][0]["n_shards"] == 18 + 4 + 4

    src = open_source(src_path)
    for lvl in range(3):
        shape = src.meta.shapes[lvl]
        got = read_array_region(
            store,
            lvl,
            (slice(0, 1), slice(0, 1), slice(0, shape[0]),
             slice(0, shape[1]), slice(0, shape[2])),
        )[0, 0]
        want = src.read_block(lvl, 0, shape[0], 0, shape[1], 0, shape[2])
        np.testing.assert_array_equal(got, want)

    # store structure: per-level array metadata + root group OME-NGFF
    for lvl in range(3):
        meta = json.load(open(os.path.join(store, str(lvl), "zarr.json")))
        assert meta["node_type"] == "array"
        assert meta["codecs"][0]["name"] == "sharding_indexed"
    root = json.load(open(os.path.join(store, "zarr.json")))
    ms = root["attributes"]["ome"]["multiscales"][0]
    assert len(ms["datasets"]) == 3
    # voxel sizes propagate: level-1 scale = 2x voxel
    assert ms["datasets"][1]["coordinateTransformations"][0]["scale"] == [
        1.0, 1.0, 2.0, 0.748 * 2, 0.748 * 2,
    ]


def test_compute_pyramid_matches_kernel(spark, tmp_path):
    rng = np.random.default_rng(7)
    level0 = rng.integers(0, 65535, size=(50, 40, 30), dtype=np.uint16)
    src_path = str(tmp_path / "src_tile")
    write_npy_pyramid(src_path, level0, n_levels=1)
    store = str(tmp_path / "computed.zarr")
    settings = ConvertJobSettings(
        input_source=src_path,
        output_location=store,
        chunk_shape=(16, 16, 16),
        shard_shape=(16, 16, 16),
        translate_pyramid=False,
        downsample_levels=3,
        downsample_mode="mean",
    )
    result = convert_to_zarr(spark, settings)
    assert result["shapes"] == [(50, 40, 30), (25, 20, 15), (13, 10, 8)]

    want1 = downsample_block(level0, (2, 2, 2), "mean")
    got1 = read_array_region(
        store, 1,
        (slice(0, 1), slice(0, 1), slice(0, 25), slice(0, 20), slice(0, 15)),
    )[0, 0]
    np.testing.assert_array_equal(got1, want1)
    # level 2 downsamples the STORED level 1 (sequential dependency)
    want2 = downsample_block(want1, (2, 2, 2), "mean")
    got2 = read_array_region(
        store, 2,
        (slice(0, 1), slice(0, 1), slice(0, 13), slice(0, 10), slice(0, 8)),
    )[0, 0]
    np.testing.assert_array_equal(got2, want2)


def test_rerun_is_idempotent(spark, pyramid_src, tmp_path):
    src_path, _ = pyramid_src
    store = str(tmp_path / "idem.zarr")
    settings = ConvertJobSettings(
        input_source=src_path,
        output_location=store,
        chunk_shape=(16, 16, 16),
        shard_shape=(32, 32, 32),
        translate_pyramid=True,
    )
    r1 = convert_to_zarr(spark, settings)
    digest1 = _store_digest(store)
    r2 = convert_to_zarr(spark, settings)
    assert r1["stages"][0]["bytes_written"] == r2["stages"][0]["bytes_written"]
    assert _store_digest(store) == digest1


def _store_digest(store: str) -> dict:
    out = {}
    for root, _, files in os.walk(store):
        for f in files:
            p = os.path.join(root, f)
            out[os.path.relpath(p, store)] = open(p, "rb").read()
    return {k: hash(v) for k, v in out.items()}


def test_synthetic_source_no_io(spark, tmp_path):
    store = str(tmp_path / "synth.zarr")
    settings = ConvertJobSettings(
        input_source="synth://40,40,40,2",
        output_location=store,
        chunk_shape=(16, 16, 16),
        shard_shape=(32, 32, 32),
        translate_pyramid=True,
    )
    result = convert_to_zarr(spark, settings)
    assert result["n_levels"] == 2
    src = SyntheticSource("synth://40,40,40,2")
    got = read_array_region(
        store, 0,
        (slice(0, 1), slice(0, 1), slice(3, 17), slice(0, 40), slice(25, 40)),
    )[0, 0]
    want = src.read_block(0, 3, 17, 0, 40, 25, 40)
    np.testing.assert_array_equal(got, want)


class TestSyntheticNoiseSource:
    """Calibrated shot-noise source (round-10 verdict, Next #6): the
    realistic-entropy twin of synth:// for conversion benchmarks."""

    def test_tiling_invariance(self):
        """Every voxel is a pure function of absolute coordinates, so
        any tiling reads identical data — the property the idempotent
        re-run guarantee depends on."""
        import numpy as np

        from aind_exaspim_data_transformation_spark.sources.tensor import (
            open_source,
        )

        src = open_source("synthnoise://64,96,80")
        whole = src.read_block(0, 0, 64, 0, 96, 0, 80)
        assert whole.dtype == np.uint16 and whole.shape == (64, 96, 80)
        part = src.read_block(0, 17, 49, 33, 96, 0, 41)
        np.testing.assert_array_equal(part, whole[17:49, 33:96, 0:41])
        # deterministic across instances
        again = open_source("synthnoise://64,96,80").read_block(
            0, 0, 64, 0, 96, 0, 80
        )
        np.testing.assert_array_equal(again, whole)

    def test_levels_differ_and_shapes_halve(self):
        from aind_exaspim_data_transformation_spark.sources.tensor import (
            open_source,
        )

        src = open_source("synthnoise://64,64,64,2")
        assert src.meta.shapes == [(64, 64, 64), (32, 32, 32)]
        b0 = src.read_block(0, 0, 32, 0, 32, 0, 32)
        b1 = src.read_block(1, 0, 32, 0, 32, 0, 32)
        assert (b0 != b1).any()  # level salt reaches the hash

    def test_entropy_is_microscopy_like(self):
        """The whole point: ~2-3:1, not the ramp's ~65:1."""
        import zlib

        from aind_exaspim_data_transformation_spark.sources.tensor import (
            open_source,
        )

        # a 128^3 shard of the BENCH-geometry ramp: z*2^20 mod 2^16
        # == 0, so all z-slices repeat -> the ~55:1 LZ feast that
        # flatters the codec path; the noise twin denies it
        noise = open_source("synthnoise://2048,1024,1024").read_block(
            0, 0, 128, 0, 128, 0, 128
        )
        ramp = open_source("synth://2048,1024,1024").read_block(
            0, 0, 128, 0, 128, 0, 128
        )
        r_noise = len(noise.tobytes()) / len(zlib.compress(noise.tobytes(), 1))
        r_ramp = len(ramp.tobytes()) / len(zlib.compress(ramp.tobytes(), 1))
        assert 1.5 <= r_noise <= 4.0, r_noise
        assert r_ramp > 10 * r_noise  # the contrast the fixture exists for

    def test_statistics_match_the_model(self):
        """Dark background ~ base(100) +- 3.46*sqrt(100)/2; bright
        fraction ~12%; mean uniform-hash is centered."""
        from aind_exaspim_data_transformation_spark.sources.tensor import (
            open_source,
        )

        b = open_source("synthnoise://128,256,256").read_block(
            0, 0, 128, 0, 256, 0, 256
        )
        bright = (b > 200).mean()
        assert 0.05 < bright < 0.25, bright
        dark = b[b <= 200]
        assert abs(float(dark.mean()) - 100.0) < 3.0
