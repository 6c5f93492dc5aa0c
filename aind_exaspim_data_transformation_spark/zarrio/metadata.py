"""OME-NGFF 0.5 multiscales metadata generator.

Pure driver-side computation (no Spark). Semantics follow the reference's
generator (reference compress/omezarr_metadata.py:36-496): per-level scale
transforms are cumulative products of the scale factor, per-level
translations shift by half the parent voxel extent each level
(``origin += voxel * (factor - 1) / 2``, reference :383-385), axes are
(t, c, z, y, x) with millisecond/micrometer units (reference :212-218).

Golden values (reference tests/test_translation_fix.py:88-94): for
voxel=1, factor=2, 5 levels, the per-axis translations are
[0, 0.5, 1.5, 3.5, 7.5].
"""

from __future__ import annotations


def downscale_origins(
    origin_zyx: tuple[float, float, float],
    voxel_zyx: tuple[float, float, float],
    factors_zyx: tuple[float, float, float],
    n_levels: int,
) -> tuple[list[list[float]], list[list[float]]]:
    """Per-level (origin, voxel) chains.

    Level k+1 voxel centers sit at the mean of the window they reduce, so
    each level shifts by ``voxel_k * (factor - 1) / 2`` per axis.
    """
    origins = [list(origin_zyx)]
    voxels = [list(voxel_zyx)]
    for _ in range(1, n_levels):
        prev_o, prev_v = origins[-1], voxels[-1]
        origins.append(
            [
                o + v * (f - 1) / 2.0
                for o, v, f in zip(prev_o, prev_v, factors_zyx)
            ]
        )
        voxels.append([v * f for v, f in zip(prev_v, factors_zyx)])
    return origins, voxels


def axes_5d(
    time_unit: str = "millisecond", space_unit: str = "micrometer"
) -> list[dict]:
    return [
        {"name": "t", "type": "time", "unit": time_unit},
        {"name": "c", "type": "channel"},
        {"name": "z", "type": "space", "unit": space_unit},
        {"name": "y", "type": "space", "unit": space_unit},
        {"name": "x", "type": "space", "unit": space_unit},
    ]


def multiscales_metadata(
    name: str,
    n_levels: int,
    voxel_zyx: tuple[float, float, float],
    origin_zyx: tuple[float, float, float] = (0.0, 0.0, 0.0),
    factors_zyx: tuple[float, float, float] = (2.0, 2.0, 2.0),
    channel_names: list[str] | None = None,
    method: str = "mean",
) -> dict:
    """Root group attributes: OME-NGFF 0.5 multiscales + minimal omero."""
    origins, voxels = downscale_origins(
        origin_zyx, voxel_zyx, factors_zyx, n_levels
    )
    datasets = []
    for lvl in range(n_levels):
        scale = [1.0, 1.0] + list(voxels[lvl])
        translation = [0.0, 0.0] + list(origins[lvl])
        datasets.append(
            {
                "path": str(lvl),
                "coordinateTransformations": [
                    {"type": "scale", "scale": scale},
                    {"type": "translation", "translation": translation},
                ],
            }
        )
    channels = channel_names or ["channel_0"]
    omero = {
        "id": 1,
        "name": name,
        "channels": [
            {
                "active": True,
                "coefficient": 1,
                "color": "000000",
                "family": "linear",
                "inverted": False,
                "label": ch,
                "window": {
                    "start": 0,
                    "end": 65535,
                    "min": 0,
                    "max": 65535,
                },
            }
            for ch in channels
        ],
        "rdefs": {"defaultT": 0, "defaultZ": 0, "model": "color"},
    }
    return {
        "ome": {
            "version": "0.5",
            "multiscales": [
                {
                    "axes": axes_5d(),
                    "datasets": datasets,
                    "name": name,
                    "metadata": {"method": method},
                }
            ],
            "omero": omero,
        }
    }
