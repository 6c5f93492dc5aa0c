"""OME-NGFF metadata goldens (reference tests/test_translation_fix.py:88-94
and FIXTURES.md A5)."""

from aind_exaspim_data_transformation_spark.zarrio.metadata import (
    downscale_origins,
    multiscales_metadata,
)


def test_translation_golden_values():
    # voxel (1,1,1), factor 2, origin 0, 5 levels ->
    # per-axis translations [0, 0.5, 1.5, 3.5, 7.5].
    origins, voxels = downscale_origins(
        (0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (2.0, 2.0, 2.0), 5
    )
    assert [o[0] for o in origins] == [0.0, 0.5, 1.5, 3.5, 7.5]
    assert [v[0] for v in voxels] == [1.0, 2.0, 4.0, 8.0, 16.0]


def test_anisotropic_factors_and_origin():
    origins, voxels = downscale_origins(
        (30.5, 20.5, 10.5), (1.0, 0.748, 0.748), (1.0, 2.0, 2.0), 3
    )
    # z untouched (factor 1)
    assert [o[0] for o in origins] == [30.5, 30.5, 30.5]
    assert voxels[2] == [1.0, 0.748 * 4, 0.748 * 4]
    assert origins[1][1] == 20.5 + 0.748 / 2


def test_multiscales_structure():
    meta = multiscales_metadata(
        "tile_000000_ch_488", 5, (1.0, 1.0, 1.0)
    )
    ome = meta["ome"]
    assert ome["version"] == "0.5"
    ms = ome["multiscales"][0]
    assert [a["name"] for a in ms["axes"]] == ["t", "c", "z", "y", "x"]
    assert ms["axes"][2]["unit"] == "micrometer"
    assert ms["axes"][0]["unit"] == "millisecond"
    assert len(ms["datasets"]) == 5
    d1 = ms["datasets"][1]
    assert d1["path"] == "1"
    kinds = [t["type"] for t in d1["coordinateTransformations"]]
    assert kinds == ["scale", "translation"]
    assert d1["coordinateTransformations"][0]["scale"] == [1, 1, 2, 2, 2]
    assert d1["coordinateTransformations"][1]["translation"] == [
        0,
        0,
        0.5,
        0.5,
        0.5,
    ]
    assert ome["omero"]["channels"][0]["window"]["max"] == 65535
