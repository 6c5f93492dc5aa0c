"""Property-based tests (hypothesis): format round trips and grid-math
invariants hold for arbitrary shapes, not just the goldens."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from aind_exaspim_data_transformation_spark.operators.downsample import (
    downsample_block,
    downsampled_shape,
)
from aind_exaspim_data_transformation_spark.zarrio.codecs import crc32c
from aind_exaspim_data_transformation_spark.zarrio.format import (
    ShardSpec,
    clamp_shard_and_chunk,
    decode_shard,
    encode_shard,
)

dims = st.integers(min_value=1, max_value=48)
factors = st.integers(min_value=1, max_value=4)


@settings(max_examples=30, deadline=None)
@given(
    z=dims, y=dims, x=dims,
    data=st.data(),
)
def test_shard_roundtrip_any_shape(z, y, x, data):
    # chunk divides shard by construction
    cz = data.draw(st.sampled_from([c for c in (1, 2, 4, 8) if c <= z]))
    spec = ShardSpec(
        shape=(1, 1, z, y, x),
        shard_shape=(1, 1, z, y, x),
        chunk_shape=(1, 1, cz, y, x),
        dtype="uint16",
        codec="gzip",
        codec_level=1,
    ) if z % cz == 0 else None
    if spec is None:
        return
    rng = np.random.default_rng(z * 10007 + y * 101 + x)
    arr = rng.integers(0, 65536, size=spec.shard_shape, dtype=np.uint16)
    out = decode_shard(encode_shard(arr, spec), spec)
    np.testing.assert_array_equal(out, arr)


@settings(max_examples=50, deadline=None)
@given(z=dims, y=dims, x=dims, fz=factors, fy=factors, fx=factors)
def test_downsampled_shape_matches_kernel_output(z, y, x, fz, fy, fx):
    arr = np.zeros((z, y, x), dtype=np.uint16)
    for mode in ("mean", "min", "max", "stride"):
        out = downsample_block(arr, (fz, fy, fx), mode)
        assert out.shape == downsampled_shape((z, y, x), (fz, fy, fx))


@settings(max_examples=40, deadline=None)
@given(z=dims, y=dims, x=dims, fz=factors, fy=factors, fx=factors)
def test_fast_kernel_paths_match_nan_stack_reference(z, y, x, fz, fy, fx):
    """The vectorized mean/min/max reduce must agree with the NaN-stacked
    formulation (the original definition of truncated-edge semantics)."""
    from aind_exaspim_data_transformation_spark.operators.downsample import (
        _stacked_windows,
    )

    rng = np.random.default_rng(z * 31 + y * 7 + x + fz * 131)
    arr = rng.integers(0, 65535, size=(z, y, x), dtype=np.uint16)
    stack = _stacked_windows(arr, (fz, fy, fx))
    want = {
        "mean": np.rint(np.nanmean(stack, axis=-1)).astype(np.uint16),
        "min": np.rint(np.nanmin(stack, axis=-1)).astype(np.uint16),
        "max": np.rint(np.nanmax(stack, axis=-1)).astype(np.uint16),
    }
    for mode, expected in want.items():
        got = downsample_block(arr, (fz, fy, fx), mode)
        np.testing.assert_array_equal(got, expected, err_msg=mode)


@settings(max_examples=50, deadline=None)
@given(x=st.integers(min_value=1, max_value=10**9))
def test_iterated_halving_equals_direct_ceil(x):
    # ceil(ceil(x/2)/2) == ceil(x/4) — the identity the pyramid planner
    # relies on when deriving level shapes directly.
    it = x
    for k in range(1, 6):
        it = math.ceil(it / 2)
        assert it == math.ceil(x / 2**k)


@settings(max_examples=30, deadline=None)
@given(
    z=st.integers(min_value=1, max_value=2000),
    shard=st.integers(min_value=1, max_value=512),
)
def test_grid_slices_tile_the_axis(z, shard):
    n = math.ceil(z / shard)
    edges = [(i * shard, min((i + 1) * shard, z)) for i in range(n)]
    assert edges[0][0] == 0 and edges[-1][1] == z
    assert all(a < b for a, b in edges)
    assert all(edges[i][1] == edges[i + 1][0] for i in range(n - 1))
    assert sum(b - a for a, b in edges) == z


@settings(max_examples=30, deadline=None)
@given(
    shape=st.tuples(
        st.integers(1, 4096), st.integers(1, 4096), st.integers(1, 4096)
    )
)
def test_clamping_invariants(shape):
    shard, chunk = clamp_shard_and_chunk(
        shape, (512, 512, 512), (128, 256, 256)
    )
    for d, s, c in zip(shape, shard, chunk):
        assert 1 <= c <= min(d, 512)
        assert c <= s <= d or s == c  # shard >= one chunk, within array
        assert s % c == 0


@settings(max_examples=20, deadline=None)
@given(data=st.binary(min_size=0, max_size=2048))
def test_crc32c_incremental_property(data):
    mid = len(data) // 2
    assert crc32c(data) == crc32c(data[mid:], crc32c(data[:mid]))


# --------------------------------------------------------------------------
# Round-5 codecs: Avro container and PNG/BMP roundtrips for arbitrary
# values/shapes (the unit suites cover goldens; these sweep the space).
# --------------------------------------------------------------------------
_avro_longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_avro_text = st.text(max_size=80)
_avro_bytes = st.binary(max_size=120)
_avro_doubles = st.floats(allow_nan=False)  # NaN != NaN breaks tuple ==


@settings(max_examples=25, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            _avro_longs,
            _avro_doubles,
            _avro_text,
            _avro_bytes,
            st.booleans(),
            st.one_of(
                st.none(),
                st.integers(min_value=-(2**31), max_value=2**31 - 1),
            ),
        ),
        max_size=40,
    ),
    codec=st.sampled_from(["null", "deflate"]),
    block_rows=st.integers(min_value=1, max_value=7),
)
def test_avro_container_roundtrip_property(rows, codec, block_rows):
    import tempfile

    from aind_exaspim_data_transformation_spark.sources.avroio import (
        read_container,
        write_container,
    )

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "x", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "b", "type": "bytes"},
            {"name": "f", "type": "boolean"},
            {"name": "m", "type": ["null", "int"]},
        ],
    }
    with tempfile.TemporaryDirectory() as tmp:
        p = f"{tmp}/prop.avro"
        n = write_container(
            p, schema, rows, codec=codec, block_rows=block_rows
        )
        assert n == len(rows)
        assert list(read_container(p)) == rows


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    filter_cycle=st.integers(min_value=1, max_value=5),
)
def test_png_bmp_roundtrip_property(h, w, seed, filter_cycle):
    from aind_exaspim_data_transformation_spark.operators.media_codecs import (
        decode_bmp,
        decode_png,
        encode_bmp,
        encode_png,
    )

    img = (
        np.random.default_rng(seed)
        .integers(0, 256, (h, w, 3))
        .astype(np.uint8)
    )
    assert np.array_equal(
        decode_png(encode_png(img, filter_cycle=filter_cycle)), img
    )
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
