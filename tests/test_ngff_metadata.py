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


def test_omero_channel_windows_and_validation():
    """Omero entries follow the reference's _build_ome/_validate pair
    (compress/omezarr_metadata.py:36-96, :251-282)."""
    import pytest

    from aind_exaspim_data_transformation_spark.zarrio.metadata import (
        build_omero,
        validate_omero,
    )

    omero = build_omero("img", n_channels=2)
    validate_omero(omero)  # structurally valid by construction
    ch0, ch1 = omero["channels"]
    assert ch0["label"] == "Channel:img:0"
    assert ch0["color"] == "000000" and ch1["color"] == "000001"
    assert ch0["window"] == {
        "end": 1.0, "max": 1.0, "min": 0.0, "start": 0.0,
    }
    assert all(isinstance(v, float) for v in ch0["window"].values())

    custom = build_omero(
        "img",
        n_channels=1,
        channel_names=["ch488"],
        channel_colors=[0x00FF00],
        channel_minmax=[(0.0, 65535.0)],
        channel_startend=[(90.0, 1500.0)],
    )
    validate_omero(custom)
    w = custom["channels"][0]["window"]
    assert custom["channels"][0]["color"] == "00ff00"
    assert (w["start"], w["end"], w["min"], w["max"]) == (
        90.0, 1500.0, 0.0, 65535.0,
    )

    with pytest.raises(TypeError):
        validate_omero({"channels": [{"color": "xyz"}]})
    with pytest.raises(TypeError):
        validate_omero({"channels": [{"color": 123456}]})
    with pytest.raises(KeyError):
        validate_omero(
            {"channels": [{"window": {"min": 0, "max": 1, "start": 0}}]}
        )
    with pytest.raises(TypeError):
        validate_omero({"channels": [{"window": "0..1"}]})
    validate_omero(None)  # empty metadata is allowed


def test_multiscales_omero_defaults_validated():
    meta = multiscales_metadata("tile", 2, (1.0, 1.0, 1.0))
    ch = meta["ome"]["omero"]["channels"][0]
    assert ch["window"] == {
        "end": 65535.0, "max": 65535.0, "min": 0.0, "start": 0.0,
    }
    assert ch["label"] == "channel_0"
